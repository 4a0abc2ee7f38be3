package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[TextAnalysis.pmiBigrams]] against driver-side brute force and
  * [[LlmPipeline.clusterSizeHist]] against its own component frame.
  */
class CollocationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pmi_bigrams: matches brute-force lift ranking") {
    val toks = graft.core.Tables.documents(spark, dir)
      .select(col("text")).collect()
      .map(_.getString(0).split("\\s+").filter(_.nonEmpty).toSeq).toSeq
    val uni = toks.flatten.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val nu = uni.values.sum
    val bg = toks.flatMap(_.sliding(2).collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val nb = bg.values.sum
    val expect = bg.toSeq.collect { case ((a, c), n) if n >= 5 =>
      val lift = ((n * 1.0) * nu * nu) / ((nb * 1.0) * uni(a) * uni(c))
      (a, c, n, math.round(1000000.0 * lift))
    }.sortBy { case (a, c, _, s) => (-s, a, c) }.take(20)
    val got = TextAnalysis.pmiBigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
  }

  test("llr_bigrams: matches brute-force Dunning G² ranking") {
    val toks = graft.core.Tables.documents(spark, dir)
      .select(col("text")).collect()
      .map(_.getString(0).split("\\s+").filter(_.nonEmpty).toSeq).toSeq
    val bg = toks.flatMap(_.sliding(2).collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val row = bg.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val colM = bg.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val nn = bg.values.sum
    def t(k: Long, r: Long, c: Long): Double =
      if (k > 0) k * math.log((k * 1.0 * nn) / ((r * 1.0) * c)) else 0.0
    val expect = bg.toSeq.collect { case ((a, b), k11) if k11 >= 5 =>
      val (ra, cb) = (row(a), colM(b))
      val g2 = 2.0 * (t(k11, ra, cb) + t(ra - k11, ra, nn - cb) +
        t(cb - k11, nn - ra, cb) + t(nn - ra - cb + k11, nn - ra, nn - cb))
      (a, b, k11, math.round(1000000.0 * g2))
    }.sortBy { case (a, b, _, s) => (-s, a, b) }.take(20)
    val got = TextAnalysis.llrBigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
  }

  test("cluster_size_hist: totals reconcile with the component frame") {
    val hist = LlmPipeline.clusterSizeHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(hist.map(_._3).sum === nDocs, "every doc lands in one cluster")
    hist.foreach { case (size, n, docs) => assert(docs === size * n) }
    assert(hist.exists { case (size, _, _) => size > 1 },
      "corpus contains duplicate clusters")
    val fromClusters = LlmPipeline.dedupCluster(spark, dir)
      .groupBy(col("cluster_size")).agg(countDistinct(col("component")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.map(h => h._1 -> h._2).toMap === fromClusters)
  }
}
