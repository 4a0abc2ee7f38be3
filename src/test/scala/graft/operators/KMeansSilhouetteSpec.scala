package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[KMeans.silhouette]] — per-cluster mean of (b−a)/b against the
  * second-nearest centroid, on the SAME deterministic Lloyd run as
  * [[KMeans.cluster]].
  */
class KMeansSilhouetteSpec extends SparkSpec {

  import spark.implicits._

  // ids chosen so the first-2-by-id seeds start one per blob; two tight,
  // well-separated blobs around (1,0) and (0,1)
  private def blobs = Seq(
    (0L, Array(1.00f, 0.00f)), (1L, Array(0.00f, 1.00f)),
    (2L, Array(0.99f, 0.01f)), (3L, Array(0.01f, 0.99f)),
    (4L, Array(0.98f, 0.02f)), (5L, Array(0.02f, 0.98f)),
  ).toDF("vec_id", "embedding")

  test("separated blobs: every point counted, means near 1000") {
    val got = KMeans.silhouette(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === Set(0, 1))
    assert(got.values.map(_._1).sum === 6L)        // all points audited
    assert(got.values.forall(_._2 > 900L))         // tight & far → s ≈ 1
  }

  test("s_milli bounds: assignment is nearest-centroid, so 0 ≤ s < 1000") {
    // a deliberately bad clustering: k=2 over points on one line, so
    // boundary points sit between centroids — s small but never negative
    val line = (0L to 9L).map(i => (i, Array(i.toFloat / 10, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = KMeans.silhouette(line, "vec_id", "embedding", k = 2, iters = 3)
      .collect()
    assert(rows.map(_.getLong(1)).sum === 10L)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < 1000L)
    }
  }

  test("cluster column agrees with KMeans.cluster's assignment") {
    val asg = KMeans.cluster(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sil = KMeans.silhouette(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sil === asg)
  }
}
