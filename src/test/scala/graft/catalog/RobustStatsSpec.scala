package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Analytics.topPaths]], [[Analytics.winsorizedStats]] and
  * [[LlmPipeline.knnClassify]] against driver-side brute force at
  * sf0.001.
  */
class RobustStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("top_paths: matches brute-force 3-gram path counting") {
    val events = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }
    val expect = paths.groupBy(identity)
      .map { case (p, v) => (p, v.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20).toSet
    val got = Analytics.topPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("winsorized_stats: clamped mean shifts toward center, counts exact") {
    val rows = Analytics.winsorizedStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      assert(lo <= hi)
      val clamped = r.getLong(6)
      val n = r.getLong(1)
      // winsorizing at P5/P95 clamps at most ~10% of rows (+rank rounding)
      assert(clamped <= n / 8, s"type ${r.getString(0)}: $clamped of $n clamped")
      // the winsorized mean must land inside the clamp bounds
      val mw = r.getDouble(5)
      assert(mw >= lo && mw <= hi)
    }
  }

  test("winsorized_stats: matches brute-force winsorization per type") {
    val vals = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expect = vals.groupBy(_._1).map { case (t, vs) =>
      val sorted = vs.sortBy(v => (v._2, v._3)).map(_._2)
      val n = sorted.length
      val lo = sorted((n * 5 + 99) / 100 - 1)
      val hi = sorted((n * 95 + 99) / 100 - 1)
      val w = sorted.map(v => math.min(math.max(v, lo), hi))
      t -> (n.toLong, lo, hi,
        BigDecimal(w.sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        sorted.count(v => v < lo || v > hi).toLong)
    }
    val got = Analytics.winsorizedStats(spark, dir).collect()
    got.foreach { r =>
      val (n, lo, hi, mw, nc) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === lo)
      assert(r.getDouble(3) === hi)
      assert(math.abs(r.getDouble(5) - mw) < 1e-6)
      assert(r.getLong(6) === nc)
    }
  }

  test("label_separation: matches brute-force centroid distances") {
    val vecs = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim)(d => vs.map(_._3(d)).sum / vs.size)
    }
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val expect = vecs.groupBy(_._2).map { case (l, vs) =>
      val intra = vs.map(v => dist(v._3, cents(l))).sum / vs.size
      val inter = vs.map(v =>
        cents.collect { case (o, c) if o != l => dist(v._3, c) }.min).sum / vs.size
      l -> (vs.size.toLong, intra, inter)
    }
    val got = LlmPipeline.labelSeparation(spark, dir).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, intra, inter) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - intra) < 1e-5)
      assert(math.abs(r.getDouble(3) - inter) < 1e-5)
    }
    // no separability claim here: at sf0.001 (≈25 vecs across 20 labels
    // in 64-d) every label's separation sits just under 1 — the metric
    // correctly reports non-separable, which is itself the point of the
    // audit. The exact agreement above is the contract being pinned.
    val seps = got.map(_.getDouble(4))
    assert(seps.forall(s => s > 0.5 && s < 5.0))
  }

  test("knn_classify: vote matches brute force over exact neighbor lists") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val nn = graft.operators.VectorOps.bruteForceTopK(emb,
      emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = nn.groupBy(_._1).map { case (q, cands) =>
      val vote = cands.map(c => labels(c._2)).groupBy(identity)
        .map { case (l, v) => (l, v.size) }.toSeq
        .sortBy { case (l, v) => (-v, l) }.head
      (q, labels(q), vote._1, vote._2.toLong)
    }.toSet
    val got = LlmPipeline.knnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === expect)
  }

  test("theil_sen: matches brute-force median of pairwise slopes") {
    val daily = graft.core.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield {
      val num = 1000000L * (daily(j)._2 - daily(i)._2)
      val den = daily(j)._1 - daily(i)._1
      num / den // JVM / truncates toward zero — the div/`//` contract
    }
    assert(slopes.exists(_ < 0),
      "corpus must exercise the negative-slope truncation path")
    val sorted = slopes.sorted
    val r = Analytics.theilSen(spark, dir).collect().head
    assert(r.getLong(0) === slopes.length.toLong)
    assert(r.getLong(1) === sorted((slopes.length + 1) / 2 - 1))
  }
}
