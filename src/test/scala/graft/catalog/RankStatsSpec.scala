package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[RankStats]] against driver-side brute force at sf0.001 — naive
  * pair enumeration / full sorts, no histograms, so an error in the
  * compact-domain algebra cannot agree by construction.
  */
class RankStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (1995 cents, 1996 cents) slices collected once. */
  private lazy val slices: (Array[Long], Array[Long]) = {
    val rows = graft.core.Tables.orders(spark, dir)
      .select(year(col("o_orderdate").cast("timestamp")).as("yr"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .where(col("yr") === 1995 || col("yr") === 1996)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    (rows.filter(_._1 == 1995).map(_._2), rows.filter(_._1 == 1996).map(_._2))
  }

  test("ks_test: matches brute-force sup |F_A - F_B|") {
    val (a, b) = slices
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val support = (a ++ b).distinct.sorted
    val dNum = support.map { v =>
      math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)
    }.max
    val row = RankStats.ksTest(spark, dir).head()
    assert(row.getLong(0) === na)
    assert(row.getLong(1) === nb)
    assert(row.getLong(2) === dNum)
    assert(row.getLong(3) === 10000L * dNum / (na * nb))
  }

  test("mann_whitney: matches brute-force pair count with tie half") {
    val (a, b) = slices
    // 2·U_A = 2·#{a>b} + #{a=b}
    var u2 = 0L
    for (x <- a; y <- b) {
      if (x > y) u2 += 2 else if (x == y) u2 += 1
    }
    val row = RankStats.mannWhitney(spark, dir).head()
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(row.getLong(2) === u2)
    val nanb = a.length.toLong * b.length
    val expectRb = 1000L * (u2 - nanb) / nanb // truncation toward zero:
    assert(row.getLong(3) === (if (u2 >= nanb) expectRb
      else -(1000L * (nanb - u2) / nanb)))
  }

  test("spearman_corr: matches brute-force Pearson on mid-ranks") {
    val per = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def midRanks(vs: Array[Long]): Array[Double] = {
      val sorted = vs.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2).min + 1) }
      val ties = vs.groupBy(identity).map { case (v, g) => v -> g.length }
      vs.map(v => first(v) + (ties(v) - 1) / 2.0)
    }
    val rx = midRanks(per.map(_._1))
    val ry = midRanks(per.map(_._2))
    val n = per.length
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val num = rx.indices.map(i => (rx(i) - mx) * (ry(i) - my)).sum
    val dx = rx.map(v => (v - mx) * (v - mx)).sum
    val dy = ry.map(v => (v - my) * (v - my)).sum
    val rho = num / math.sqrt(dx * dy)
    val row = RankStats.spearmanCorr(spark, dir).head()
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getLong(2) / 1000.0 - rho) < 2e-3)
    assert(math.abs(row.getLong(1) / 1e6 - rho * rho) < 2e-3)
    assert(rho > 0.0, "frequency and spend must correlate positively")
  }

  test("avg_precision_k: matches brute-force AP over the sorted top-100") {
    val sc = graft.core.Tables.documents(spark, dir).select(
      TextAnalysis.classifierScore.as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
      col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val np = sc.map(_._2).sum
    val top = sc.sortBy { case (s, _, id) => (-s, id) }.take(100)
    var tp = 0L
    var apSum = 0L
    top.zipWithIndex.foreach { case ((_, pos, _), i) =>
      if (pos == 1) { tp += 1; apSum += 1000000L * tp / (i + 1) }
    }
    val row = RankStats.avgPrecisionK(spark, dir).head()
    assert(row.getLong(0) === 100L)
    assert(row.getLong(1) === np)
    assert(row.getLong(2) === tp)
    assert(row.getLong(3) === apSum / math.min(np, 100L))
  }
}
