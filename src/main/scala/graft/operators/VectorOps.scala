package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector operators: exact cosine similarity, brute-force top-k
  * (the correctness baseline), and sign-bucket LSH ANN (the scale path).
  *
  * Float determinism policy: float summation is order-sensitive, and no
  * cross-engine comparison survives a reordered reduction. So all vector
  * math here quantizes each component to a 48-bit integer
  * (floor(x · 10^6)) and computes dot products / norms as EXACT integer
  * sums (order-independent, ≤ 64 · 10^12 < 2^53 so even engines that pass
  * through doubles stay exact); cosine then does the same float ops
  * (sqrt, divide) in the same order everywhere. Quantization error is
  * ~1e-6 per component — far below any similarity threshold's noise floor.
  *
  * Scale design: top-k broadcasts the (small) query set against the (huge)
  * corpus — O(n·q) map-side work, one tiny shuffle for the per-query top-k
  * (TakeOrdered-shaped window over query_id). The LSH variant replaces the
  * broadcast nested loop with an equi-join on bucket id: candidates are
  * generated only within buckets, trading recall for a shuffle-join plan
  * that survives a billion-vector corpus.
  */
object VectorOps {
  val Scale = 1000000L

  /** array<float> → array<long>, component = floor(x · 10^6). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Scale).cast("long"))

  /** Exact cosine between two quantized vectors (integer dot and norms,
    * identical float tail everywhere).
    */
  def cosineQ(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x * x), lit(0L), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x * x), lit(0L), (acc, v) => acc + v)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  /** DuckDB twin of [[quantize]] + [[cosineQ]] over list expressions. */
  def quantizeSql(vec: String): String =
    s"list_transform($vec, x -> floor(x::DOUBLE * $Scale)::BIGINT)"

  def cosineQSql(qa: String, qb: String, dim: Int): String = {
    val dot = s"list_sum(list_transform(range(1, ${dim + 1}), i -> $qa[i] * $qb[i]))::DOUBLE"
    val na = s"list_sum(list_transform($qa, x -> x * x))::DOUBLE"
    val nb = s"list_sum(list_transform($qb, x -> x * x))::DOUBLE"
    s"$dot / (sqrt($na) * sqrt($nb))"
  }

  /** Brute-force exact top-k: broadcast the query set, score every
    * (query, candidate) pair, keep k best per query. Ranking key is the
    * ROUNDED score (desc) with candidate id tie-break, so the cut is
    * deterministic and portable.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("qv"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineQ(col("qq"), col("qv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Sign-bucket id over the first `bits` components: bit i set iff
    * component i ≥ 0. This is bit-sampling LSH for cosine — vectors at small
    * angles agree on most coordinate signs.
    */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  def signBucketSql(vec: String, bits: Int): String =
    "(" + (0 until bits).map(i =>
      s"CASE WHEN $vec[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ") + ")"

  /** LSH ANN: candidates share the query's sign bucket (equi-join, no
    * broadcast, no all-pairs), then exact re-score and top-k per query.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, bits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("qv"), signBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qq"), signBucket(col(vecCol), bits).as("bucket"))
    val scored = cand.join(q, "bucket")
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineQ(col("qq"), col("qv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact cosine-threshold near-dup pairs; brute force (the baseline —
    * documents the quadratic cost; the scale path is [[lshTopK]]-style
    * bucketing). Filter is on the unrounded score.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("a"), quantize(col(vecCol)).as("va"))
    val b = vectors.select(col(idCol).as("b"), quantize(col(vecCol)).as("vb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("cos_raw", cosineQ(col("va"), col("vb")))
      .where(col("cos_raw") >= threshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos_raw"), 6).as("cosine"))
  }
}
