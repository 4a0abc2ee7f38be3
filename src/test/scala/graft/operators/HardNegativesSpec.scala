package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VectorOps.hardNegativesTopK]] — the label gate must run BEFORE the
  * rank cut, and the survivors must be exactly the brute-force nearest
  * different-label candidates.
  */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // two tight clusters on orthogonal axes plus one cross-label plant:
  // vec 12 sits INSIDE cluster A's region but carries label B — for A
  // queries it must outrank every axis-y B vector
  private def corpus = Seq(
    (0L, "A", Array(1.00f, 0.00f)),
    (2L, "A", Array(0.98f, 0.02f)),
    (4L, "A", Array(0.96f, 0.04f)),
    (1L, "B", Array(0.00f, 1.00f)),
    (3L, "B", Array(0.02f, 0.98f)),
    (12L, "B", Array(0.90f, 0.10f)),
  ).toDF("vec_id", "label", "embedding")

  test("no same-label candidate survives; gate precedes the cut") {
    val q = corpus.where(col("vec_id") === 0L)
    val got = VectorOps.hardNegativesTopK(corpus, q,
      "vec_id", "embedding", "label", k = 2)
      .orderBy(col("rank")).collect()
    assert(got.forall(r => r.getAs[String]("cand_label") === "B"))
    // the planted near-A vector 12 is the HARDEST negative (rank 1) even
    // though a plain top-2-then-filter would admit same-label 2 and 4
    // ahead of it and could drop it entirely
    assert(got.map(_.getAs[Long]("cand_id")).toSeq === Seq(12L, 3L))
  }

  test("matches brute-force rescore over the different-label subset") {
    val q = corpus.where(col("vec_id") % 2 === 0) // queries: 0, 2, 4, 12
    val got = VectorOps.hardNegativesTopK(corpus, q,
      "vec_id", "embedding", "label", k = 3)
      .select("query_id", "cand_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // independent recompute: full pairwise cosine on the quantized grid,
    // filter label mismatch, sort (score desc, cand asc)
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Float](2).toArray))
    def qz(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000).toLong)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val r = d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.filter(_._1 % 2 == 0).flatMap { case (qid, ql, qv) =>
      rows.filter { case (cid, cl, _) => cid != qid && cl != ql }
        .map { case (cid, _, cv) => (cid, cos(qz(qv), qz(cv))) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    assert(got === want)
  }

  test("query with no cross-label candidate yields no rows, not a crash") {
    val mono = Seq((0L, "A", Array(1.0f, 0.0f)), (1L, "A", Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    assert(VectorOps.hardNegativesTopK(mono, mono,
      "vec_id", "embedding", "label", k = 2).count() === 0L)
  }
}
