package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the pure (driver-side) operator logic —
  * per-case Spark jobs would be too slow, and these laws are exactly the
  * parts distributed execution relies on (merge associativity, banding
  * pigeonhole, parser totality).
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("UniqValueCount: any partition/merge order yields the cap smallest distinct values") {
    val agg = ValueAggregators.UniqValueCount(5)
    val values = Gen.listOf(Gen.oneOf((1 to 30).map(i => f"v$i%02d")))
    check(Prop.forAll(values, Gen.chooseNum(1, 5)) { (vs, nSplits) =>
      val chunks = vs.grouped(math.max(1, vs.size / nSplits)).toList
      val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      val out = agg.finish(merged)
      val expected = vs.distinct.sorted.take(5)
      out.uniq_count == expected.size.toLong && out.items == expected.mkString("|")
    })
  }

  test("ValueHistogram: report matches a brute-force computation") {
    val values = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    check(Prop.forAll(values) { vs =>
      val agg = ValueAggregators.ValueHistogram(3)
      val out = agg.finish(vs.foldLeft(agg.zero)(agg.reduce))
      val freqs = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fs = freqs.values.toSeq.sorted
      val n = fs.size
      val median = if (n % 2 == 1) fs(n / 2).toDouble
                   else (fs(n / 2 - 1) + fs(n / 2)) / 2.0
      out.n_distinct == n.toLong && out.min_freq == fs.min &&
        out.max_freq == fs.max && out.median_freq == median &&
        math.abs(out.avg_freq - fs.sum.toDouble / n) < 1e-6
    })
  }

  test("ValueHistogram: reduce-then-merge equals direct reduce (combiner law)") {
    val values = Gen.listOf(Gen.oneOf("x", "y", "z", "w"))
    check(Prop.forAll(values, values) { (l, r) =>
      val agg = ValueAggregators.ValueHistogram(3)
      val direct = agg.finish((l ++ r).foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      direct == merged
    })
  }

  test("SimHash banding pigeonhole: hamming <= 3 implies a shared 12-bit band") {
    val fp = Gen.chooseNum(0L, (1L << 48) - 1)
    val flips = Gen.choose(0, SimHash.MaxHamming)
      .flatMap(k => Gen.listOfN(k, Gen.choose(0, 47)))
    check(Prop.forAll(fp, flips) { (a, bits) =>
      val b = bits.foldLeft(a)((acc, i) => acc ^ (1L << i))
      val bands = (0 until SimHash.Bands).map { s =>
        ((a >>> (s * SimHash.BandBits)) % (1 << SimHash.BandBits),
          (b >>> (s * SimHash.BandBits)) % (1 << SimHash.BandBits))
      }
      java.lang.Long.bitCount(a ^ b) > SimHash.MaxHamming ||
        bands.exists { case (x, y) => x == y }
    })
  }

  test("KeyFieldSort.parse is total on well-formed specs and faithful") {
    val part = for {
      f <- Gen.chooseNum(1, 20)
      c <- Gen.option(Gen.chooseNum(1, 9))
      n <- Gen.oneOf(true, false)
      r <- Gen.oneOf(true, false)
    } yield (f, c, n, r)
    val spec = Gen.nonEmptyListOf(part).map(_.take(5))
    check(Prop.forAll(spec) { parts =>
      val s = parts.map { case (f, c, n, r) =>
        f.toString + c.map("." + _).getOrElse("") +
          (if (n) "n" else "") + (if (r) "r" else "")
      }.mkString(",")
      KeyFieldSort.parse(s) == parts.map { case (f, c, n, r) =>
        KeyFieldSort.KeyPart(f, c.getOrElse(1), n, r)
      }
    })
  }

  test("KeyFieldSort.parseK round-trips every well-formed -k spec") {
    val pos = for {
      f <- Gen.chooseNum(1, 20)
      c <- Gen.option(Gen.chooseNum(1, 9))
    } yield (f, c)
    val spec = for {
      p1 <- pos
      p2 <- Gen.option(pos)
      n <- Gen.oneOf(true, false)
      r <- Gen.oneOf(true, false)
    } yield (p1, p2, n, r)
    val specs = Gen.nonEmptyListOf(spec).map(_.take(4))
    check(Prop.forAll(specs) { ss =>
      val txt = ss.map { case ((f1, c1), p2, n, r) =>
        "-k" + f1 + c1.map("." + _).getOrElse("") +
          p2.map { case (f2, c2) => "," + f2 + c2.map("." + _).getOrElse("") }.getOrElse("") +
          (if (n) "n" else "") + (if (r) "r" else "")
      }.mkString(" ")
      KeyFieldSort.parseK(txt) == ss.map { case ((f1, c1), p2, n, r) =>
        p2 match {
          case Some((f2, c2)) =>
            KeyFieldSort.KeySpec(f1, c1.getOrElse(1), f2, c2.getOrElse(0), n, r)
          case None =>
            KeyFieldSort.KeySpec(f1, c1.getOrElse(1), 0, 0, n, r)
        }
      }
    })
  }
}
