package graft.operators

import graft.SparkSpec

/** Lloyd invariants on a corpus with planted cluster structure: separated
  * blobs are recovered exactly, every point lands on its nearest final
  * centroid (sq_dist consistency), and the run is deterministic.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs far apart in 4-d; ids 0 and 1 (the init seeds) land in
  // different blobs so k=2 must separate them perfectly
  private val blobs = Seq(
    (0L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Seq(1.1f, 0.9f, 0.0f, 0.1f)),
    (4L, Seq(0.9f, 1.1f, 0.1f, 0.0f)),
    (1L, Seq(-1.0f, -1.0f, 0.0f, 0.0f)),
    (3L, Seq(-1.1f, -0.9f, -0.1f, 0.0f)),
    (5L, Seq(-0.9f, -1.1f, 0.0f, -0.1f)),
  ).toDF("vec_id", "embedding")

  test("separated blobs are recovered; assignment matches blob parity") {
    val got = KMeans.cluster(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(0L, 2L, 4L).forall(got(_) == 0), s"positive blob: $got")
    assert(Seq(1L, 3L, 5L).forall(got(_) == 1), s"negative blob: $got")
  }

  test("deterministic: two runs agree row for row") {
    val a = KMeans.cluster(blobs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = KMeans.cluster(blobs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("non-contiguous id space still seeds k clusters (ids ≥ k)") {
    // all ids ≥ 1000: filter(id < k) would have produced ZERO seeds
    val shifted = blobs.selectExpr("vec_id + 1000 AS vec_id", "embedding")
    val got = KMeans.cluster(shifted, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(1000L, 1002L, 1004L).forall(got(_) == 0), s"positive blob: $got")
    assert(Seq(1001L, 1003L, 1005L).forall(got(_) == 1), s"negative blob: $got")
  }

  test("sq_dist is the exact quantized distance to the assigned centroid") {
    // one blob, k=1: centroid = floor(mean); distances must be exact ints
    val got = KMeans.cluster(blobs.filter("vec_id % 2 = 0"),
        "vec_id", "embedding", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val qv = Map( // floor(x * 1e6)
      0L -> Seq(1000000L, 1000000L, 0L, 0L),
      2L -> Seq(1100000L, 899999L, 0L, 100000L), // 0.9f quantizes down
      4L -> Seq(899999L, 1100000L, 100000L, 0L),
    )
    val cent = (0 until 4).map(i =>
      math.floor(qv.values.map(_(i)).sum.toDouble / 3).toLong)
    qv.foreach { case (id, v) =>
      val d = v.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum
      assert(got(id) == d, s"vec $id: got ${got(id)}, want $d")
    }
  }
}
