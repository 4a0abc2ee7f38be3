package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[LlmPipeline.gramMatrix]], [[Analytics.linregTrend]] and
  * [[Analytics.abTest]] against independent driver-side computations on the
  * sf0.001 corpus (small enough to enumerate in full).
  */
class GramTrendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gram_matrix: equals the brute-force driver-side G^T G") {
    val vecs = graft.core.Tables.embeddings(spark, dir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000).toLong))
    val d = vecs.head.length
    val got = LlmPipeline.gramMatrix(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size === d * (d + 1) / 2)
    // spot the full upper triangle, not a sample — 2080 cells is cheap
    for (i <- 0 until d; j <- i until d) {
      val expect = vecs.map(v => v(i) * v(j)).sum
      assert(got((i.toLong, j.toLong)) === expect, s"cell ($i,$j)")
    }
  }

  test("linreg_trend: matches a hand OLS for every reported user") {
    val rows = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 86400000000"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1).filter(_._2.length >= 20)
    val got = Analytics.linregTrend(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, es) =>
      val n = es.length.toLong
      val sx = es.map(_._2).sum; val sy = es.map(_._3).sum
      val sxx = es.map(e => e._2 * e._2).sum
      val sxy = es.map(e => e._2 * e._3).sum
      assert(got(u) === ((n, n * sxy - sx * sy, n * sxx - sx * sx)), s"user $u")
    }
  }

  test("ab_test: arms partition the purchase users, metrics reconcile") {
    val arms = Analytics.abTest(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(arms.keySet === Set(0L, 1L))
    val p = graft.core.Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
    val totUsers = p.select(countDistinct(col("user_id"))).head().getLong(0)
    val totPurch = p.count()
    assert(arms.values.map(_._1).sum === totUsers)
    assert(arms.values.map(_._2).sum === totPurch)
    // both arms non-degenerate on this corpus
    arms.values.foreach { case (nu, np, rev) =>
      assert(nu > 0 && np >= nu && rev > 0)
    }
  }
}
