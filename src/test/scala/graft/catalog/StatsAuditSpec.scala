package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-8 statistics additions — [[Analytics.hitsScores]],
  * [[Analytics.kmSurvival]], [[EvalMetrics.ccfDaily]],
  * [[EvalMetrics.hhiConcentration]], [[Extras.benfordDigits]],
  * [[TextAnalysis.vocabCoverage]] — against driver-side brute force at
  * sf0.001 (double-arithmetic references for the fixed-point iterations,
  * exact integer replicas for the counting ops).
  */
class StatsAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hits_scores: tracks double-arithmetic HITS; Q20 vectors L1-normalized") {
    val edges = Analytics.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    var hub = edges.map(_._1).distinct.map(_ -> 1.0).toMap
    var auth = edges.map(_._2).distinct.map(_ -> 1.0).toMap
    (1 to 8).foreach { _ =>
      val aw = edges.groupBy(_._2).map { case (b, es) =>
        b -> es.map(e => e._3 * hub(e._1)).sum }
      val as = aw.values.sum
      auth = aw.map { case (b, v) => b -> v / as }
      val hw = edges.groupBy(_._1).map { case (a, es) =>
        a -> es.map(e => e._3 * auth(e._2)).sum }
      val hs = hw.values.sum
      hub = hw.map { case (a, v) => a -> v / hs }
    }
    val got = Analytics.hitsScores(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2).sum > (1L << 20) - 20 && got.map(_._2).sum <= (1L << 20))
    assert(got.map(_._3).sum > (1L << 20) - 20 && got.map(_._3).sum <= (1L << 20))
    got.foreach { case (t, h, a) =>
      assert(math.abs(h / 1048576.0 - hub.getOrElse(t, 0.0)) < 1e-3, s"hub $t")
      assert(math.abs(a / 1048576.0 - auth.getOrElse(t, 0.0)) < 1e-3, s"auth $t")
    }
  }

  test("km_survival: matches double-arithmetic Kaplan-Meier") {
    val per = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("user_id").agg(min("day").as("f"), max("day").as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val m = per.map(_._2).max
    val us = per.map { case (f, l) => (l - f, l <= m - 8) }
    val durations = us.map(_._1).distinct.sorted
    var atRisk = us.length.toLong
    var s = 1.0
    val expect = durations.map { t =>
      val d = us.count(u => u._1 == t && u._2).toLong
      val ct = us.count(_._1 == t).toLong
      val n = atRisk
      s *= (n - d).toDouble / n
      atRisk -= ct
      t -> (n, d, s)
    }.toMap
    val got = Analytics.kmSurvival(spark, dir).collect()
    assert(got.length === durations.length)
    got.foreach { r =>
      val (n, d, sv) = expect(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === d)
      assert(math.abs(r.getLong(3) / 1e6 - sv) < 1e-4)
    }
    // survival curve must be non-increasing in t
    val sorted = got.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => b <= a })
  }

  test("ccf_daily: matches double-arithmetic Pearson per lag") {
    val daily = graft.core.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("day").agg(count(lit(1)).as("x"), sum("cents").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val xs = daily.map(_._2.toDouble)
    val ys = daily.map(_._3.toDouble)
    val got = EvalMetrics.ccfDaily(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === (-3 to 3).map(_.toLong).toSet)
    (-3 to 3).foreach { k =>
      val pairs = xs.indices.flatMap { i =>
        val j = i + k
        if (j >= 0 && j < ys.length) Some((xs(i), ys(j))) else None
      }
      val n = pairs.length
      val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
      val num = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val dx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val dy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
      val rho = if (dx == 0 || dy == 0) 0.0 else num / math.sqrt(dx * dy)
      val (np, milli) = got(k.toLong)
      assert(np === n.toLong, s"lag $k pair count")
      assert(math.abs(milli / 1000.0 - rho) < 2e-3, s"lag $k rho")
    }
  }

  test("hhi_concentration: matches exact integer replica") {
    val xs = graft.core.Tables.documents(spark, dir)
      .groupBy("source").count().collect().map(_.getLong(1))
    val s = xs.sum
    val ssq = xs.map(x => BigInt(x) * x).sum
    val row = EvalMetrics.hhiConcentration(spark, dir).head()
    assert(row.getLong(0) === xs.length.toLong)
    assert(row.getLong(1) === ((BigInt(100000000) * ssq) / (BigInt(s) * s)).toLong)
    assert(row.getLong(2) === 10000L * xs.max / s)
  }

  test("benford_digits: matches exact digit histogram; probs sum to ~1e6") {
    val cents = graft.core.Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val tot = cents.length.toLong
    val hist = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.length.toLong)
    val rows = Extras.benfordDigits(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === tot)
    rows.foreach { r =>
      val d = r.getLong(0).toInt
      assert(r.getLong(1) === hist(d))
      assert(r.getLong(2) === 1000000L * hist(d) / tot)
      assert(r.getLong(3) === math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3))
    }
    val expSum = rows.map(_.getLong(3)).sum
    assert(expSum > 999990L && expSum <= 1000000L)
  }

  test("vocab_coverage: matches exact OOV replica; totals partition the corpus") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("lang"),
        graft.functions.TextFns.tokens(lower(col("text"))).as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val vocab = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => (w, g.length) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(24).map(_._1).toSet
    val expect = docs.groupBy(_._1).map { case (lang, ds) =>
      val all = ds.flatMap(_._2)
      val oov = all.count(!vocab.contains(_)).toLong
      lang -> (all.length.toLong, oov)
    }
    val got = TextAnalysis.vocabCoverage(spark, dir).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (tot, oov) = expect(r.getString(0))
      assert(r.getLong(1) === tot)
      assert(r.getLong(2) === oov)
      assert(r.getLong(3) === (if (tot == 0) 0L else 10000L * oov / tot))
    }
  }
}
