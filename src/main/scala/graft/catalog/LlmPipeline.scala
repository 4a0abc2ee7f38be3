package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{MinHashLsh, Multimodal, SimHash, VectorOps}

/** Training-data-pipeline operators over `documents` and `embeddings`:
  * deduplication (exact, MinHash-LSH, SimHash, exact n-gram Jaccard,
  * embedding-cosine) and similarity search (brute-force + LSH ANN).
  *
  * These are additive capability (no reference analog — the reference corpus
  * work is wordcount-shaped); scale rationale lives on each operator
  * ([[MinHashLsh]], [[SimHash]], [[VectorOps]]).
  */
object LlmPipeline extends QueryModule {

  // ---- exact dedup: hash-groupBy on normalized content --------------------
  /** Per-doc canonical mapping: docs sharing a normalized-content key
    * collapse to the min doc_id. One shuffle on the content hash; at scale
    * this is the standard exact-dedup pass (hash, shuffle, keep-first).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    val w = Window.partitionBy(col("content_key"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), key.as("content_key"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
  }

  private val dedupExactSql =
    """SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_key,
      |  min(doc_id) OVER w AS canonical_id,
      |  count(*) OVER w AS n_copies
      |FROM documents
      |WINDOW w AS (PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))""".stripMargin

  // ---- MinHash-LSH near-dup ----------------------------------------------
  // shared with the incremental-dedup composite so the delta-serving path
  // can never drift from the batch pipeline's definition of "near-dup"
  private[catalog] val ShingleN = 3
  private[catalog] val JaccardThreshold = 0.5

  /** Verified LSH near-dup pairs, derived once per corpus: the frame feeds
    * [[dedupMinhashLsh]] and [[lshRecallAudit]] (and, at 100 TB, every
    * downstream keep-best/cluster consumer) — a production pipeline
    * materializes the near-dup pair set once, so the catalog does too
    * ([[graft.core.Shared]]; bench discloses the build via
    * `shared_builds`). Cold-cache correctness is unchanged.
    */
  private def lshPairsShared(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "lsh_dedup_pairs", dir) {
      MinHashLsh.nearDupPairs(Tables.documents(spark, dir), "doc_id", "text",
        ShingleN, JaccardThreshold)
    }

  /** Exact Jaccard-threshold pairs (PPJoin prefix filter), derived once per
    * corpus — shared by [[ngramJaccard]] and [[lshRecallAudit]].
    */
  private def exactPairsShared(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "exact_jaccard_pairs", dir) {
      graft.operators.SetSimJoin.jaccardPairs(
        MinHashLsh.explodeShingles(
          Tables.documents(spark, dir), "doc_id", "text", ShingleN),
        ExactJaccardThreshold)
    }

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairsShared(spark, dir)

  private val dedupMinhashSql =
    MinHashLsh.nearDupSql("documents", "doc_id", "text", ShingleN, JaccardThreshold)

  // ---- SimHash near-dup ---------------------------------------------------
  /** The fingerprint pass (tokenize → bigram shingles → 48 parallel
    * bit-sum aggregates) dominates cold cost — it is the widest codegen'd
    * aggregate in the catalog, so its first execution pays a long C2
    * compile on top of the corpus scan. Memoized ([[graft.core.Shared]]):
    * in production the fingerprint column is computed once per corpus and
    * every near-dup / re-cluster pass reads it back, and in the bench the
    * build lands in `shared_builds` attribution instead of reading as an
    * unexplained max band on this query.
    */
  /** Memoized corpus-wide SimHash fingerprint frame `(id, fingerprint)` —
    * shared by [[dedupSimhash]] and [[Composites.curationFunnel]] (which
    * restricts it to its admission survivors before banding).
    */
  private[catalog] def simhashFingerprints(spark: SparkSession,
                                           dir: String): DataFrame =
    graft.core.Shared.memo(spark, "simhash_fingerprints", dir) {
      SimHash.fingerprints(Tables.documents(spark, dir), "doc_id", "text")
    }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    SimHash.nearPairs(simhashFingerprints(spark, dir))

  private val dedupSimhashSql = SimHash.nearPairsSql("documents", "doc_id", "text")

  // ---- exact n-gram Jaccard with prefix filtering (no LSH, no all-pairs) -
  private val ExactJaccardThreshold = 0.5

  /** Exact Jaccard-threshold pairs via [[graft.operators.SetSimJoin]]:
    * prefix filtering joins only on each doc's rarest shingles (lossless
    * for J ≥ t), so hot common shingles never become join keys — the
    * scalable exact counterpart to the probabilistic dedup_minhash_lsh.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    exactPairsShared(spark, dir)

  private val ngramJaccardSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ShingleN)
    s"""WITH sh AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ShingleN
       |), e AS (
       |  SELECT id, unnest(shingles) AS shingle, len(shingles) AS n FROM sh
       |), shared AS (
       |  SELECT a.id AS a, b.id AS b, count(*) AS shared,
       |         any_value(a.n) AS na, any_value(b.n) AS nb
       |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |)
       |SELECT a AS doc_a, b AS doc_b,
       |       round(shared::DOUBLE / (na + nb - shared), 6) AS jaccard
       |FROM shared
       |WHERE shared::DOUBLE / (na + nb - shared) >= $ExactJaccardThreshold""".stripMargin
  }

  /** Recall audit of the banded dedup path: exact Jaccard-threshold pairs
    * (PPJoin prefix filter — lossless) vs the MinHash-LSH pipeline's
    * verified pairs at the SAME shingle width and threshold. LSH-verified
    * pairs are a subset of the exact set (verification is exact Jaccard),
    * so `n_missed` counts true pairs the banding dropped and
    * `recall_permille` lands in the DRIVER GATE — the production question
    * "what does the probabilistic path lose" answered as an attested
    * number, not a spec-only assertion. Composes two already-scalable
    * pipelines plus one anti-join on the (small) pair sets; 1-row output.
    */
  def lshRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = exactPairsShared(spark, dir).select(col("doc_a"), col("doc_b"))
    val lsh = lshPairsShared(spark, dir).select(col("doc_a"), col("doc_b"))
    val missed = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
      .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
      .select(col("n_exact"), col("n_lsh"), col("n_missed"),
        expr("CASE WHEN n_exact = 0 THEN 1000 " +
          "ELSE (1000 * (n_exact - n_missed)) div n_exact END")
          .cast("long").as("recall_permille"))
  }

  private val lshRecallAuditSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ShingleN)
    val lshFull = MinHashLsh.nearDupSql("documents", "doc_id", "text",
      ShingleN, ExactJaccardThreshold)
    s"""WITH shx AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ShingleN
       |), ex AS (
       |  SELECT id, unnest(shingles) AS shingle, len(shingles) AS n FROM shx
       |), exact_p AS (
       |  SELECT a.id AS doc_a, b.id AS doc_b
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |  HAVING count(*)::DOUBLE
       |    / (any_value(a.n) + any_value(b.n) - count(*))
       |    >= $ExactJaccardThreshold
       |), lsh_p AS (
       |  SELECT doc_a, doc_b FROM ($lshFull)
       |), m AS (
       |  SELECT count(*) AS n_missed FROM exact_p e
       |  LEFT JOIN lsh_p l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b
       |  WHERE l.doc_a IS NULL
       |)
       |SELECT
       |  CAST((SELECT count(*) FROM exact_p) AS BIGINT) AS n_exact,
       |  CAST((SELECT count(*) FROM lsh_p) AS BIGINT) AS n_lsh,
       |  CAST(n_missed AS BIGINT) AS n_missed,
       |  CAST(CASE WHEN (SELECT count(*) FROM exact_p) = 0 THEN 1000
       |       ELSE (1000 * ((SELECT count(*) FROM exact_p) - n_missed))
       |            // (SELECT count(*) FROM exact_p) END AS BIGINT)
       |    AS recall_permille
       |FROM m""".stripMargin
  }

  /** MinHash ESTIMATE-quality audit — the third member of the audit family:
    * [[lshRecallAudit]] asks "which true pairs does banding retrieve";
    * this asks "how good is the signature's Jaccard ESTIMATE itself"
    * (m matching components out of [[MinHashLsh.NumHashes]]) against the
    * exact s/u — the number that decides whether a pipeline can SKIP the
    * exact-verify pass and trust signatures alone. Per-pair error in exact
    * integer permille, |m·u − K·s| ·1000 div (K·u), so both engines sum
    * identical integers; 1-row output (n_pairs, mean, max).
    *
    * Scale shape: the pair set is the memoized exact frame (candidate-
    * bounded); signatures are K codegen multiply-adds per (id, shingle)
    * row grouped per id; the audit joins are keyed by pair ids.
    */
  def minhashEstAudit(spark: SparkSession, dir: String): DataFrame = {
    val K = MinHashLsh.NumHashes
    val pairs = exactPairsShared(spark, dir).select(col("doc_a"), col("doc_b"))
    // materialized: FOUR consumers (sizes, both overlap-join sides, the
    // signature build) — each reference re-ran the corpus tokenize +
    // shingle explode; one derive + narrow re-reads instead
    val ex = graft.core.Materialize(MinHashLsh.explodeShingles(
      Tables.documents(spark, dir), "doc_id", "text", ShingleN))
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n"))
    val withOverlap = pairs
      .join(ex.select(col("id").as("doc_a"), col("shingle")), "doc_a")
      .join(ex.select(col("id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("s"))
      .join(sizes.select(col("id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("n").as("nb")), "doc_b")
    val sigs = MinHashLsh.signatures(ex)
    val sigA = sigs.select(col("id").as("doc_a") +:
      (0 until K).map(i => col(s"h$i").as(s"a$i")): _*)
    val sigB = sigs.select(col("id").as("doc_b") +:
      (0 until K).map(i => col(s"h$i").as(s"b$i")): _*)
    val m = (0 until K)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val per = withOverlap.join(sigA, "doc_a").join(sigB, "doc_b")
      .withColumn("u", col("na") + col("nb") - col("s"))
      .withColumn("m", m)
      .withColumn("err_permille",
        expr(s"(1000 * abs(m * u - $K * s)) div ($K * u)"))
    per.agg(count(lit(1)).as("n_pairs"),
        coalesce(sum("err_permille"), lit(0L)).as("sum_err"),
        coalesce(max("err_permille"), lit(0L)).as("max_err_permille"))
      .withColumn("mean_err_permille",
        expr("CASE WHEN n_pairs = 0 THEN 0L ELSE sum_err div n_pairs END"))
      .select("n_pairs", "mean_err_permille", "max_err_permille")
  }

  private val minhashEstAuditSql = {
    val K = MinHashLsh.NumHashes
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ShingleN)
    val perms = (0 until K)
      .map(i => s"(${i}, ${MinHashLsh.PermA(i)}, ${MinHashLsh.PermB(i)})")
      .mkString(", ")
    s"""WITH shx AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ShingleN
       |), e AS (
       |  SELECT id, unnest(shingles) AS shingle, len(shingles) AS n FROM shx
       |), pairs AS (
       |  SELECT a.id AS da, b.id AS db, count(*)::BIGINT AS s,
       |         any_value(a.n)::BIGINT AS na, any_value(b.n)::BIGINT AS nb
       |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |  HAVING count(*)::DOUBLE
       |    / (any_value(a.n) + any_value(b.n) - count(*))
       |    >= $ExactJaccardThreshold
       |), sig AS (
       |  SELECT id, p.i, min((p.a * eh.h32 + p.b) % ${MinHashLsh.P}) AS h
       |  FROM (SELECT id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32
       |        FROM e) eh
       |  CROSS JOIN (VALUES $perms) p(i, a, b)
       |  GROUP BY id, p.i
       |), mm AS (
       |  SELECT p.da, p.db,
       |    CAST(sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT) AS m
       |  FROM pairs p
       |  JOIN sig sa ON sa.id = p.da
       |  JOIN sig sb ON sb.id = p.db AND sb.i = sa.i
       |  GROUP BY p.da, p.db
       |), err AS (
       |  SELECT (1000 * abs(mm.m * (p.na + p.nb - p.s) - $K * p.s))
       |         // ($K * (p.na + p.nb - p.s)) AS err_permille
       |  FROM pairs p JOIN mm ON mm.da = p.da AND mm.db = p.db
       |)
       |SELECT count(*)::BIGINT AS n_pairs,
       |  CAST(CASE WHEN count(*) = 0 THEN 0
       |       ELSE CAST(sum(err_permille) AS BIGINT) // count(*) END AS BIGINT)
       |    AS mean_err_permille,
       |  CAST(coalesce(max(err_permille), 0) AS BIGINT) AS max_err_permille
       |FROM err""".stripMargin
  }

  /** SimHash-vs-exact audit — [[lshRecallAudit]]'s sibling for the OTHER
    * probabilistic dedup path: how much of the exact Jaccard-threshold
    * pair set does Hamming-≤3 SimHash banding retrieve, and how many
    * extra (sub-threshold) pairs does it admit. Unlike MinHash-LSH
    * (which verifies candidates with exact Jaccard, so its pairs are a
    * subset of exact), SimHash decides by fingerprint distance alone —
    * so BOTH `n_missed` and `n_extra` are live numbers, and together
    * they are the recall/precision trade a pipeline weighs when choosing
    * between the two near-dup engines. Both pair frames come from
    * [[graft.core.Shared]] memos; the audit itself is two anti-joins over
    * small pair sets, 1-row output.
    */
  def simhashRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = exactPairsShared(spark, dir).select(col("doc_a"), col("doc_b"))
    val sim = dedupSimhash(spark, dir).select(col("doc_a"), col("doc_b"))
    val missed = exact.join(sim, Seq("doc_a", "doc_b"), "left_anti")
    val extra = sim.join(exact, Seq("doc_a", "doc_b"), "left_anti")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(sim.agg(count(lit(1)).as("n_simhash")))
      .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
      .crossJoin(extra.agg(count(lit(1)).as("n_extra")))
      .select(col("n_exact"), col("n_simhash"), col("n_missed"), col("n_extra"),
        expr("CASE WHEN n_exact = 0 THEN 1000 " +
          "ELSE (1000 * (n_exact - n_missed)) div n_exact END")
          .cast("long").as("recall_permille"))
  }

  private val simhashRecallAuditSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ShingleN)
    val simFull = SimHash.nearPairsSql("documents", "doc_id", "text")
    s"""WITH shx AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ShingleN
       |), ex AS (
       |  SELECT id, unnest(shingles) AS shingle, len(shingles) AS n FROM shx
       |), exact_p AS (
       |  SELECT a.id AS doc_a, b.id AS doc_b
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |  HAVING count(*)::DOUBLE
       |    / (any_value(a.n) + any_value(b.n) - count(*))
       |    >= $ExactJaccardThreshold
       |), sim_p AS (
       |  SELECT doc_a, doc_b FROM ($simFull)
       |), mi AS (
       |  SELECT count(*) AS n_missed FROM exact_p e
       |  LEFT JOIN sim_p s ON s.doc_a = e.doc_a AND s.doc_b = e.doc_b
       |  WHERE s.doc_a IS NULL
       |), xt AS (
       |  SELECT count(*) AS n_extra FROM sim_p s
       |  LEFT JOIN exact_p e ON e.doc_a = s.doc_a AND e.doc_b = s.doc_b
       |  WHERE e.doc_a IS NULL
       |)
       |SELECT
       |  CAST((SELECT count(*) FROM exact_p) AS BIGINT) AS n_exact,
       |  CAST((SELECT count(*) FROM sim_p) AS BIGINT) AS n_simhash,
       |  CAST(n_missed AS BIGINT) AS n_missed,
       |  CAST(n_extra AS BIGINT) AS n_extra,
       |  CAST(CASE WHEN (SELECT count(*) FROM exact_p) = 0 THEN 1000
       |       ELSE (1000 * ((SELECT count(*) FROM exact_p) - n_missed))
       |            // (SELECT count(*) FROM exact_p) END AS BIGINT)
       |    AS recall_permille
       |FROM mi, xt""".stripMargin
  }

  // ---- embedding-cosine near-dup (banded SRP engine path) -----------------
  private val CosineThreshold = 0.4
  private[catalog] val Dim = 64
  private val SrpRows = 6   // bits per band → 2^6 buckets; grows with log2(n)
  private val SrpBands = 16 // S-curve midpoint (1/16)^(1/6) ≈ cosine 0.4

  /** Bucketed threshold-pairs via [[VectorOps.srpPairs]] — equi-join
    * candidate generation plus exact rescore; the brute-force crossJoin
    * ([[VectorOps.cosinePairs]]) survives only as the test baseline.
    */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    VectorOps.srpPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
      SrpRows, SrpBands, Dim, CosineThreshold)

  private val embedNearDupSql =
    VectorOps.srpPairsSql("embeddings", "vec_id", "embedding",
      SrpRows, SrpBands, Dim, CosineThreshold)

  // ---- ANN: brute-force exact top-k (baseline) ----------------------------
  private val TopK = 5
  private val QueryMod = 50 // queries = vectors with vec_id % QueryMod == 0

  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    VectorOps.bruteForceTopK(emb, emb.where(col("vec_id") % QueryMod === 0),
      "vec_id", "embedding", TopK)
  }

  private def denseTopKSql(k: Int): String = {
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", Dim)
    s"""WITH v AS (
       |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, qv AS qq FROM v WHERE vec_id % $QueryMod = 0
       |), scored AS (
       |  SELECT q.query_id, v.vec_id AS cand_id, round($cos, 6) AS score
       |  FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id
       |)
       |SELECT query_id, cand_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= $k""".stripMargin
  }

  private val annTopKSql = denseTopKSql(TopK)

  // ---- k-NN label classification over the embedding space -----------------
  private val KnnK = 5

  /** k-NN classification: each query vector takes the majority label of
    * its `KnnK` exact nearest neighbors (self excluded) — the
    * weak-supervision / label-propagation pass run over embedding stores
    * to label new data from a labeled pool. Reuses the quantized
    * brute-force top-k ([[VectorOps.bruteForceTopK]]— broadcast query
    * batch, integer dot products, the same geometry the ANN paths
    * approximate); the vote is a per-query integer count with
    * (votes DESC, label ASC) tiebreak, so the prediction is exact on both
    * engines. At scale the neighbor source swaps to the LSH/IVF path —
    * the vote stage is identical.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val nn = VectorOps.bruteForceTopK(emb,
      emb.where(col("vec_id") % QueryMod === 0), "vec_id", "embedding", KnnK)
    val lbl = emb.select(col("vec_id"), col("label"))
    val votes = nn.join(lbl.withColumnRenamed("vec_id", "cand_id"), "cand_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .join(lbl.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "true_label"), "query_id")
      .select(col("query_id"), col("true_label"),
        col("label").as("pred_label"), col("votes"))
  }

  private val knnClassifySql = {
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", Dim)
    s"""WITH v AS (
       |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, qv AS qq FROM v WHERE vec_id % $QueryMod = 0
       |), nn AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.query_id, v.vec_id AS cand_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round($cos, 6) DESC, v.vec_id) AS rank
       |    FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id)
       |  WHERE rank <= $KnnK
       |), votes AS (
       |  SELECT nn.query_id, e.label, count(*) AS votes
       |  FROM nn JOIN embeddings e ON e.vec_id = nn.cand_id
       |  GROUP BY 1, 2
       |)
       |SELECT w.query_id, te.label AS true_label, w.label AS pred_label, w.votes
       |FROM (SELECT query_id, label, votes, row_number() OVER (
       |        PARTITION BY query_id ORDER BY votes DESC, label) AS rk
       |      FROM votes) w
       |JOIN embeddings te ON te.vec_id = w.query_id
       |WHERE w.rk = 1""".stripMargin
  }

  // ---- label-cluster separation audit -------------------------------------
  /** Embedding-space quality audit: per label, the mean distance of its
    * vectors to their OWN centroid vs the nearest FOREIGN centroid — the
    * cheap silhouette stand-in ("are the label clusters actually
    * separated?") run before anyone trusts [[knnClassify]]-style label
    * transfer on a new embedding drop. separation > 1 = separable.
    * Shape: one posexplode to (dim, value) rows, one (label × dim)
    * centroid aggregate (label-count × dim rows — broadcastable), one
    * equi-join on dim for the distance pass, two rollups. Nothing is
    * pairwise in the corpus — vectors meet only centroids, so the pass
    * is linear in corpus size at any scale.
    */
  def labelSeparation(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
    val cent = ex.groupBy(col("label"), col("dim")).agg(avg(col("v")).as("c"))
    val d2 = ex.withColumnRenamed("label", "vlabel")
      .join(broadcast(cent), "dim")
      .groupBy(col("vec_id"), col("vlabel"), col("label"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
    val per = d2.groupBy(col("vec_id"), col("vlabel"))
      .agg(sum(when(col("label") === col("vlabel"), col("d2"))).as("intra"),
        min(when(col("label") =!= col("vlabel"), col("d2"))).as("inter"))
    per.groupBy(col("vlabel").as("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(sqrt(col("intra"))), 6).as("mean_intra"),
        round(avg(sqrt(col("inter"))), 6).as("mean_inter"),
        round(avg(sqrt(col("inter"))) / avg(sqrt(col("intra"))), 6)
          .as("separation"))
  }

  private val labelSeparationSql =
    """WITH ex AS (
      |  SELECT vec_id, label, unnest(embedding) AS v,
      |    unnest(range(len(embedding))) AS dim
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, dim, avg(v) AS c FROM ex GROUP BY 1, 2
      |), d2 AS (
      |  SELECT ex.vec_id, ex.label AS vlabel, cent.label,
      |    sum((ex.v - cent.c) * (ex.v - cent.c)) AS d2
      |  FROM ex JOIN cent ON ex.dim = cent.dim
      |  GROUP BY 1, 2, 3
      |), per AS (
      |  SELECT vec_id, vlabel,
      |    sum(CASE WHEN label = vlabel THEN d2 END) AS intra,
      |    min(CASE WHEN label <> vlabel THEN d2 END) AS inter
      |  FROM d2 GROUP BY 1, 2
      |)
      |SELECT vlabel AS label, count(*) AS n,
      |  round(avg(sqrt(intra)), 6) AS mean_intra,
      |  round(avg(sqrt(inter)), 6) AS mean_inter,
      |  round(avg(sqrt(inter)) / avg(sqrt(intra)), 6) AS separation
      |FROM per GROUP BY 1""".stripMargin

  // ---- ANN: multi-table SRP LSH (scale path) ------------------------------
  private[catalog] val LshK = 3
  private val AnnRows = 4   // this corpus's true neighbors sit at cosine
  private val AnnBands = 24 // 0.27–0.45 → shallow bands, many tables for recall

  /** `AnnBands` independent SRP hash tables OR-combined
    * ([[VectorOps.srpTopK]]): recall ≥ 0.9 against the exact top-k at this
    * geometry (asserted in VectorOpsSpec), no broadcast, no all-pairs.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    VectorOps.srpTopK(emb, emb.where(col("vec_id") % QueryMod === 0),
      "vec_id", "embedding", AnnRows, AnnBands, Dim, LshK)
  }

  private val annLshSql =
    VectorOps.srpTopKSql("embeddings", "vec_id", "embedding",
      AnnRows, AnnBands, Dim, LshK, QueryMod)

  private val AnnAuditBudget = 10L

  /** ANN recall audit — the vector-side member of the audit family
    * ([[lshRecallAudit]], [[simhashRecallAudit]]): recall@k of the SRP-LSH
    * top-k against the exact brute-force top-k over the SAME query batch,
    * measured IN-ENGINE and attested by the driver gate (the
    * VectorOpsSpec recall ≥ 0.9 pin becomes a driver-checked number, not
    * a spec-only assertion). Both rankings are deterministic (rounded
    * cosine, id tie-break), so the hit set is exact; the audit itself is
    * one equi-join on (query_id, cand_id) over k·|queries| rows plus
    * three 1-row broadcasts.
    *
    * The query batch is a FIXED [[VectorOps.auditSample]] budget, not the
    * serving paths' `% QueryMod` workload: an audit's brute-force leg is
    * queries×corpus, and a `% constant` batch grows with the corpus —
    * measured exponent 1.29 on the real 10× step (round 11) before the
    * budget cap, the same trap hard_negatives/label_noise_audit hit in
    * round 10. (At the gate SF the budget's derived modulus equals the
    * old QueryMod, so the audited number is unchanged there.)
    */
  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = VectorOps.auditSample(emb, "vec_id", AnnAuditBudget)
    // materialized (≤ budget·k rows): the exact leg has two consumers
    // (hit join + census) and each reference would re-run the whole
    // queries×corpus brute-force pass
    val exact = graft.core.Materialize(VectorOps
      .bruteForceTopK(emb, queries, "vec_id", "embedding", LshK)
      .select(col("query_id"), col("cand_id")))
    val lsh = VectorOps
      .srpTopK(emb, queries, "vec_id", "embedding", AnnRows, AnnBands, Dim,
        LshK)
      .select(col("query_id"), col("cand_id"))
    val hits = lsh.join(exact, Seq("query_id", "cand_id"))
    exact.agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_queries"), col("n_exact"), col("n_hits"),
        expr("(1000 * n_hits) div n_exact").cast("long").as("recall_permille"))
  }

  private val annRecallAuditSql = {
    val mod = VectorOps.auditSampleModSql("embeddings", AnnAuditBudget)
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", Dim)
    val exactSql =
      s"""WITH v AS (
         |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv FROM embeddings
         |), q AS (
         |  SELECT vec_id AS query_id, qv AS qq FROM v WHERE vec_id % ($mod) = 0
         |), scored AS (
         |  SELECT q.query_id, v.vec_id AS cand_id, round($cos, 6) AS score
         |  FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id
         |)
         |SELECT query_id, cand_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
         |FROM scored
         |QUALIFY rank <= $LshK""".stripMargin
    s"""WITH ex AS (
       |  SELECT query_id, cand_id FROM ($exactSql)
       |), ls AS (
       |  SELECT query_id, cand_id FROM (${VectorOps.srpTopKSql("embeddings",
            "vec_id", "embedding", AnnRows, AnnBands, Dim, LshK, mod)})
       |), h AS (
       |  SELECT count(*) AS n_hits FROM ls JOIN ex
       |    ON ls.query_id = ex.query_id AND ls.cand_id = ex.cand_id
       |)
       |SELECT
       |  CAST((SELECT count(DISTINCT query_id) FROM ex) AS BIGINT) AS n_queries,
       |  CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST((1000 * n_hits) // (SELECT count(*) FROM ex) AS BIGINT)
       |    AS recall_permille
       |FROM h""".stripMargin
  }

  // ---- dimensionality-truncation audit -------------------------------------
  private val TruncDim = 16
  private val TruncK = 10
  private val TruncBudget = 100L

  /** Matryoshka-style dimensionality-truncation audit: top-[[TruncK]]
    * retrieval overlap between the FULL 64-dim embedding ranking and the
    * ranking from only the first [[TruncDim]] dims — the number that
    * decides whether a 4× narrower serving index (or an MRL prefix) is
    * safe, exactly the way [[annRecallAudit]] decides it for the LSH
    * index and quant_error_audit for int8. Both rankings run the
    * brute-force exact-integer-cosine contract over the same FIXED
    * ~[[TruncBudget]]-query batch ([[VectorOps.auditSample]] — a
    * %-constant batch grew with the corpus and measured exponent 1.34 on
    * a real 10× step before the fixed budget brought the audit back to
    * linear); at scale both legs swap to the ANN candidate paths
    * unchanged. Readout: 1-row overlap permille.
    */
  def dimTruncationAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val trunc = emb.select(col("vec_id"),
      slice(col("embedding"), 1, TruncDim).as("embedding"))
    // each leg is a |queries|×|corpus| brute-force pass with a ≤
    // budget·k-row result; materialized because `full` has two consumers
    // (hit join + census) and every reference would re-run the whole leg
    val full = graft.core.Materialize(VectorOps.bruteForceTopK(emb,
        VectorOps.auditSample(emb, "vec_id", TruncBudget), "vec_id",
        "embedding", TruncK)
      .select(col("query_id"), col("cand_id")))
    val narrow = graft.core.Materialize(VectorOps.bruteForceTopK(trunc,
        VectorOps.auditSample(trunc, "vec_id", TruncBudget), "vec_id",
        "embedding", TruncK)
      .select(col("query_id"), col("cand_id")))
    val hits = narrow.join(full, Seq("query_id", "cand_id"))
    full.agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_full"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_queries"), col("n_full"), col("n_hits"),
        expr("(1000 * n_hits) div n_full").cast("long").as("overlap_permille"))
  }

  private val dimTruncationAuditSql = {
    def leg(vecExpr: String, dim: Int) = {
      val cos = VectorOps.cosineQSql("q.qq", "v.qv", dim)
      s"""SELECT query_id, cand_id FROM (
         |  SELECT q.query_id, v.vec_id AS cand_id,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY round($cos, 6) DESC, v.vec_id) AS rank
         |  FROM (SELECT vec_id, ${VectorOps.quantizeSql(vecExpr)} AS qv
         |        FROM embeddings) v
         |  CROSS JOIN (SELECT vec_id AS query_id,
         |                ${VectorOps.quantizeSql(vecExpr)} AS qq
         |              FROM embeddings WHERE vec_id %
         |                ${VectorOps.auditSampleModSql("embeddings", TruncBudget)} = 0) q
         |  WHERE v.vec_id <> q.query_id) t
         |WHERE rank <= $TruncK""".stripMargin
    }
    s"""WITH fl AS MATERIALIZED (
       |${leg("embedding", Dim).linesIterator.map("  " + _).mkString("\n")}
       |), nr AS MATERIALIZED (
       |${leg(s"embedding[1:$TruncDim]", TruncDim).linesIterator.map("  " + _).mkString("\n")}
       |), h AS (
       |  SELECT count(*) AS n_hits FROM nr JOIN fl
       |    ON nr.query_id = fl.query_id AND nr.cand_id = fl.cand_id
       |)
       |SELECT
       |  CAST((SELECT count(DISTINCT query_id) FROM fl) AS BIGINT) AS n_queries,
       |  CAST((SELECT count(*) FROM fl) AS BIGINT) AS n_full,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST((1000 * n_hits) // (SELECT count(*) FROM fl) AS BIGINT)
       |    AS overlap_permille
       |FROM h""".stripMargin
  }

  // ---- near-dup threshold sweep ----------------------------------------------

  /** Dedup-rate sweep across Jaccard thresholds 0.5 … 0.9, in ONE pass
    * over the memoized exact pair frame ([[exactPairsShared]]) — the
    * datasheet a team reads to PICK the dedup threshold: how many pairs
    * and how many distinct documents each setting would implicate, and
    * what fraction of the corpus that is (basis points). The pair frame
    * is derived once (its own exponent measured 1.06); everything here is
    * a 5-way broadcast fan-out of it plus bounded rollups, so the sweep
    * costs five threshold rows, not five dedup runs.
    */
  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = exactPairsShared(spark, dir)
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val ts = Seq(500L, 600L, 700L, 800L, 900L)
    val perT = pairs
      .crossJoin(broadcast(spark.range(1).select(
        explode(array(ts.map(lit): _*)).as("t_milli"))))
      .where(col("jaccard") >= col("t_milli").cast("double") / 1000.0)
    val pairCounts = perT.groupBy(col("t_milli"))
      .agg(count(lit(1)).as("n_pairs"))
    val docCounts = perT
      .select(col("t_milli"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy(col("t_milli"))
      .agg(countDistinct(col("doc")).as("n_docs_hit"))
    pairCounts.join(docCounts, "t_milli")
      .crossJoin(broadcast(nDocs))
      .select(col("t_milli"), col("n_pairs"), col("n_docs_hit"),
        expr("(10000 * n_docs_hit) div n_docs").as("affected_bp"))
  }

  private val dedupThresholdSweepSql =
    s"""WITH pairs AS MATERIALIZED (
       |${ngramJaccardSql.linesIterator.map("  " + _).mkString("\n")}
       |), t AS (SELECT unnest([500, 600, 700, 800, 900]) AS t_milli),
       |p AS MATERIALIZED (
       |  SELECT t_milli, doc_a, doc_b FROM pairs CROSS JOIN t
       |  WHERE jaccard >= t_milli::DOUBLE / 1000.0
       |), pc AS (SELECT t_milli, count(*) AS n_pairs FROM p GROUP BY t_milli),
       |dc AS (
       |  SELECT t_milli, count(DISTINCT doc) AS n_docs_hit
       |  FROM (SELECT t_milli, unnest([doc_a, doc_b]) AS doc FROM p)
       |  GROUP BY t_milli
       |)
       |SELECT t_milli, n_pairs, n_docs_hit,
       |  (10000 * n_docs_hit) // (SELECT count(*) FROM documents)
       |    AS affected_bp
       |FROM pc JOIN dc USING (t_milli)""".stripMargin

  // ---- ANN: IVF inverted lists (cluster-routed scale path) ----------------
  private[catalog] val IvfCentroidMod = 25 // nlist = n/25 → 20 lists at sf0.01
  private[catalog] val IvfNProbe = 5

  /** [[VectorOps.ivfTopK]]: deterministic seed codebook, inverted lists by
    * nearest centroid, nprobe-list probing + exact rescore. VectorOpsSpec
    * asserts full probing equals the exact brute force. Measured recall at
    * sf0.01 (nprobe 5 of 20 lists, k=3): 0.53 — above the nprobe/nlist =
    * 0.25 uniform-data floor but far from a clustered corpus's ~0.9+,
    * because this synthetic corpus has almost no cluster structure (the
    * multi-table SRP `ann_lsh` reaches recall 1.0 here); same
    * data-pathology note as ngram_jaccard.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    VectorOps.ivfTopK(emb, emb.where(col("vec_id") % QueryMod === 0),
      "vec_id", "embedding", IvfCentroidMod, IvfNProbe, LshK)
  }

  private val annIvfSql =
    VectorOps.ivfTopKSql("embeddings", "vec_id", "embedding",
      IvfCentroidMod, IvfNProbe, LshK, Dim, QueryMod)

  // ---- ANN: product quantization (compressed-index scale path) ------------
  private val PqM = 16        // subspaces → 16 codes/vector (vs 64 floats)
  private val PqCbSize = 16   // entries per subspace codebook
  private val PqShortlist = 64 // ADC prune width before the exact refine

  /** [[VectorOps.pqTopK]]: the corpus index is 16 nibble-sized codes per
    * vector (32× smaller than the raw embeddings); ADC over the codes
    * prunes each query to a 64-candidate shortlist, then an exact
    * integer-L2 refine over just those raw vectors picks the top-k — the
    * production IVFPQ+refine serving shape. Completes the ANN family's
    * three scale axes: `ann_lsh` hashes, `ann_ivf` routes, `ann_pq`
    * compresses. Measured end-to-end recall 0.85 at sf0.001 (spec-pinned
    * ≥ 0.8 vs the exact integer-L2 top-k); the seed codebook on this
    * synthetic near-uniform corpus is the limiting factor (same
    * data-pathology note as `ann_ivf`).
    */
  /** The stored PQ code frame (one row per corpus vector) — accessor
    * shared by [[annPq]] and the `store_census` audit row.
    */
  private[catalog] def pqCodesStored(spark: SparkSession,
                                     dir: String): DataFrame =
    graft.sources.FrameStore
      .frame(spark, dir, "pq_codes", 1, "embeddings.parquet") {
        VectorOps.pqEncode(Tables.embeddings(spark, dir),
          "vec_id", "embedding", PqM, PqCbSize, Dim)
      }

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // the corpus code frame is the PQ INDEX — build-once-serve-many in
    // production, stored as a DISK artifact ([[graft.sources.FrameStore]],
    // the generalized bm25-store prepare/serve split, round 12): the
    // encode is paid once per corpus, every process and bench attempt
    // after that reads the 32×-compressed codes from parquet; the
    // codebook itself is a bounded 16-row collect re-derived per serve
    val codes = pqCodesStored(spark, dir)
    VectorOps.pqTopK(emb, emb.where(col("vec_id") % QueryMod === 0),
      "vec_id", "embedding", PqM, PqCbSize, Dim, PqShortlist, LshK,
      prebuilt = Some(codes))
  }

  private val annPqSql =
    VectorOps.pqTopKSql("embeddings", "vec_id", "embedding",
      PqM, PqCbSize, Dim, PqShortlist, LshK, QueryMod)

  /** [[VectorOps.ivfPqTopK]]: IVF routing OVER the PQ codes — the full
    * production serving shape, composing the family's two scale devices
    * (`ann_ivf` routes, `ann_pq` compresses; this does both + the exact
    * refine). The whole per-corpus state — codes AND inverted-list
    * assignment — is ONE stored artifact
    * ([[graft.sources.FrameStore]] `ivfpq_index`), so serving pays
    * probes (queries × nlist), in-list ADC (~nprobe/nlist of the
    * corpus per query) and the shortlist refine, never the corpus×nlist
    * assignment or the encode. Flat `ann_pq` stays in the catalog as
    * the exact-ADC baseline; a spec pins probe-everything ≡ flat-PQ.
    */
  /** The stored IVFPQ index frame (one row per corpus vector: PQ code +
    * inverted-list assignment) — accessor shared by [[annIvfPq]] and the
    * `store_census` audit row.
    */
  private[catalog] def ivfPqIndexStored(spark: SparkSession,
                                        dir: String): DataFrame =
    graft.sources.FrameStore
      .frame(spark, dir, "ivfpq_index", 1, "embeddings.parquet") {
        VectorOps.ivfPqIndex(Tables.embeddings(spark, dir),
          "vec_id", "embedding", IvfCentroidMod, PqM, PqCbSize, Dim)
      }

  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val idx = ivfPqIndexStored(spark, dir)
    VectorOps.ivfPqTopK(emb, emb.where(col("vec_id") % QueryMod === 0),
      "vec_id", "embedding", IvfCentroidMod, IvfNProbe, PqM, PqCbSize, Dim,
      PqShortlist, LshK, prebuiltIndex = Some(idx))
  }

  private val annIvfPqSql =
    VectorOps.ivfPqTopKSql("embeddings", "vec_id", "embedding",
      IvfCentroidMod, IvfNProbe, PqM, PqCbSize, Dim, PqShortlist, LshK,
      QueryMod)

  // ---- contrastive hard-negative mining -----------------------------------
  private val HnK = 5
  private val HnBudget = 10L

  /** [[VectorOps.hardNegativesTopK]]: per query vector, the [[HnK]]
    * nearest candidates with a DIFFERENT label — the mining pass that
    * feeds a contrastive training objective its informative negatives
    * (similar embedding, different class). The label-mismatch gate runs
    * BEFORE the rank cut; the exact serve here swaps to any of the three
    * ANN candidate paths at scale. Queries are a FIXED
    * [[VectorOps.auditSample]] budget, not a corpus fraction — a
    * `% constant` batch grew with the corpus and measured exponent 1.72
    * on a real 10× step (round 10) before the budget cap made the mine
    * queries×corpus-linear.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    VectorOps.hardNegativesTopK(emb,
      VectorOps.auditSample(emb, "vec_id", HnBudget),
      "vec_id", "embedding", "label", HnK)
  }

  private val hardNegativesSql =
    VectorOps.hardNegativesSql("embeddings", "vec_id", "embedding", "label",
      HnK, Dim, VectorOps.auditSampleModSql("embeddings", HnBudget))

  // ---- diverse subset selection (greedy k-center) -------------------------
  private val KCenterK = 6
  private val EmbDim = 64

  /** Greedy k-center diverse subset over the embedding corpus
    * ([[VectorOps.kCenterSelect]]): pick the [[KCenterK]] mutually most
    * dissimilar vectors — the "cover the space" sampling complement of
    * `semantic_dedup` (which removes the most similar). k map-only score
    * rounds + 1-row argmin collects; no pairwise matrix.
    */
  def diverseSample(spark: SparkSession, dir: String): DataFrame =
    VectorOps.kCenterSelect(
      Tables.embeddings(spark, dir), "vec_id", "embedding", KCenterK)

  private val diverseSampleSql = {
    val q = VectorOps.quantizeSql("embedding")
    def cos(a: String, b: String) =
      s"round(${VectorOps.cosineQSql(a, b, EmbDim)}, 6)"
    val rounds = (2 to KCenterK).map { r =>
      val upd =
        if (r == 2)
          s"""m1 AS (
             |  SELECT e.id, e.qv, ${cos("e.qv", "s.qv")} AS ms
             |  FROM e CROSS JOIN s1 s WHERE e.id <> s.id
             |)""".stripMargin
        else
          s"""m${r - 1} AS (
             |  SELECT m.id, m.qv,
             |    greatest(m.ms, ${cos("m.qv", "p.qv")}) AS ms
             |  FROM m${r - 2} m CROSS JOIN p${r - 1} p WHERE m.id <> p.id
             |)""".stripMargin
      s"""$upd,
         |p$r AS (SELECT id, qv, ms FROM m${r - 1} ORDER BY ms, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (2 to KCenterK)
      .map(r => s"SELECT $r AS pick_order, id AS vec_id, ms AS sim_at_pick FROM p$r")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id AS id, $q AS qv FROM embeddings
       |),
       |s1 AS (SELECT id, qv FROM e ORDER BY id LIMIT 1),
       |$rounds
       |SELECT 1 AS pick_order, id AS vec_id, NULL::DOUBLE AS sim_at_pick FROM s1
       |UNION ALL
       |$out""".stripMargin
  }

  private val MmrK = 8
  private val MmrLambdaPct = 70

  /** MMR diversity re-ranking over the embedding corpus
    * ([[VectorOps.mmrSelect]]): greedy top-[[MmrK]] by
    * `0.7·relevance − 0.3·max-sim-to-selected` against the id-min query
    * vector — the de-redundancy pass a retrieval pipeline runs on an ANN
    * shortlist before serving. Same k-round scan-and-argmax shape as
    * [[diverseSample]]; oracle replays every round as chained CTEs.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame =
    VectorOps.mmrSelect(
      Tables.embeddings(spark, dir), "vec_id", "embedding", MmrK, MmrLambdaPct)

  private val mmrRerankSql = {
    val q = VectorOps.quantizeSql("embedding")
    def cos(a: String, b: String) =
      s"round(${VectorOps.cosineQSql(a, b, EmbDim)}, 6)"
    val lam = MmrLambdaPct / 100.0
    val mu = (100 - MmrLambdaPct) / 100.0
    val rounds = (2 to MmrK).map { r =>
      val upd =
        if (r == 2)
          s"""m1 AS (
             |  SELECT rl.id, rl.qv, rl.rel, ${cos("rl.qv", "p.qv")} AS ms
             |  FROM rl CROSS JOIN p1 p WHERE rl.id <> p.id
             |)""".stripMargin
        else
          s"""m${r - 1} AS (
             |  SELECT m.id, m.qv, m.rel,
             |    greatest(m.ms, ${cos("m.qv", "p.qv")}) AS ms
             |  FROM m${r - 2} m CROSS JOIN p${r - 1} p WHERE m.id <> p.id
             |)""".stripMargin
      s"""$upd,
         |p$r AS (SELECT id, qv, rel, ms FROM m${r - 1}
         |        ORDER BY round($lam * rel - $mu * ms, 6) DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (2 to MmrK)
      .map(r => s"SELECT $r AS pick_order, id AS vec_id, " +
        s"round($lam * rel - $mu * ms, 6) AS mmr_score FROM p$r")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id AS id, $q AS qv FROM embeddings
       |),
       |qv0 AS (SELECT id, qv FROM e ORDER BY id LIMIT 1),
       |rl AS (
       |  SELECT e.id, e.qv, ${cos("e.qv", "q.qv")} AS rel
       |  FROM e CROSS JOIN qv0 q WHERE e.id <> q.id
       |),
       |p1 AS (SELECT id, qv, rel FROM rl ORDER BY rel DESC, id LIMIT 1),
       |$rounds
       |SELECT 1 AS pick_order, id AS vec_id, round($lam * rel, 6) AS mmr_score
       |FROM p1
       |UNION ALL
       |$out""".stripMargin
  }

  // ---- exact substring-span dedup ----------------------------------------
  private val SpanN = 8

  /** Exact duplicated-span detection: a doc's word 8-gram is a "duplicated
    * span" if the same 8-gram occurs in an earlier doc (min-doc_id
    * ownership — deterministic and portable). This is the exact-substring
    * dedup pass used for training-data memorization hygiene, at the
    * sub-document granularity the near-dup passes don't see. Shape: one
    * exploded shingle frame, one groupBy for owners (partial agg), one
    * equi-join back — an inverted index, never all-pairs; at 100 TB hot
    * shingles skew the owner groupBy and AQE skew handling applies.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupFrame(Tables.documents(spark, dir), SpanN)

  /** Core pass over any (doc_id, text) frame — unit-tested in DedupSpec. */
  def spanDedupFrame(docs: DataFrame, n: Int): DataFrame = {
    val ex = MinHashLsh.explodeShingles(docs, "doc_id", "text", n)
    val owners = ex.groupBy("shingle").agg(min(col("id")).as("owner"))
    ex.join(owners, "shingle")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("owner") < col("id"), 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_fraction",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
  }

  private val spanDedupSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", SpanN)
    s"""WITH sh AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $SpanN
       |), e AS (
       |  SELECT id, unnest(shingles) AS shingle FROM sh
       |), o AS (
       |  SELECT shingle, min(id) AS owner FROM e GROUP BY shingle
       |)
       |SELECT e.id AS doc_id, count(*) AS n_spans,
       |  sum(CASE WHEN o.owner < e.id THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
       |  round(sum(CASE WHEN o.owner < e.id THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS dup_fraction
       |FROM e JOIN o ON o.shingle = e.shingle
       |GROUP BY e.id""".stripMargin
  }

  // ---- asymmetric containment pairs (template/quote detection) -----------
  /** Ordered near-containment pairs: containment(A→B) = |S(A)∩S(B)|/|S(A)|
    * over distinct word 3-gram shingles — the ASYMMETRIC companion to the
    * Jaccard passes, and the signal that catches templates, quotations
    * and subset-duplicates that symmetric similarity misses (a short doc
    * fully embedded in a long one has high containment but low Jaccard).
    * Shape: [[graft.operators.SetSimJoin.containmentPairs]] — the LOSSLESS
    * asymmetric prefix filter: the inverted index holds only each A-side
    * doc's ⌊(1−τ)·|S(A)|⌋+1 RAREST shingles (pigeonhole: a pair meeting
    * the τ gate must share one of them), so candidate volume is
    * Σ_s df_prefix(s)·df(s) with hot shingles excluded from every prefix —
    * never the unpruned Σ_s df(s)² of a raw shingle self-join. Candidates
    * verify with the exact intersection count, so the result is IDENTICAL
    * to the naive join the oracle runs. The τ=0.5 gate is inter ≥
    * ⌈τ·|S(A)|⌉ ⟺ `2·inter ≥ |S(A)|` — boundary-exact on both engines;
    * the DOUBLE ratio column is reporting only.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SetSimJoin.containmentPairs(
      MinHashLsh.explodeShingles(
        Tables.documents(spark, dir), "doc_id", "text", ShingleN), 0.5)

  private val containmentPairsSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ShingleN)
    s"""WITH sh AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ShingleN
       |), e AS (
       |  SELECT id, unnest(shingles) AS shingle FROM sh
       |), sz AS (
       |  SELECT id, count(*) AS size_a FROM e GROUP BY id
       |), i AS (
       |  SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
       |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.id <> b.id
       |  GROUP BY 1, 2
       |)
       |SELECT i.a_id, i.b_id, i.inter, sz.size_a,
       |  round(i.inter::DOUBLE / sz.size_a, 6) AS containment
       |FROM i JOIN sz ON sz.id = i.a_id
       |WHERE 2 * i.inter >= sz.size_a""".stripMargin
  }

  // ---- TF-IDF weighted all-pairs cosine (sparse similarity join) ----------
  /** Weighted sparse all-pairs similarity — the TF-IDF member of the
    * near-dup family: [[embedNearDup]] is dense-vector cosine,
    * [[ngramJaccard]] set-overlap, [[containmentPairs]] asymmetric subset;
    * this is the classic term-weighted document cosine (the Bayardo
    * all-pairs problem). Weights are integer tf · idf_bits with idf_bits =
    * ⌊log₂N⌋−⌊log₂df⌋ (the [[TextAnalysis.tokenSurprisal]] device), so
    * dots and norms are exact integers and the τ = 0.5 gate is the pure
    * integer identity 4·dot² ≥ |a|²·|b|² (boundary-exact on both engines;
    * the DOUBLE cosine column is reporting only).
    *
    * Scale shape: one inverted-index self-join on the term key — candidate
    * volume is Σ_t df(t)², bounded two ways: stopwords self-prune (df in
    * N's bit-class ⇒ idf_bits = 0 ⇒ weight 0) and a df-fraction cap
    * (4·df > N drops the term from the index — the standard df-pruning of
    * all-pairs search, and the similarity is DEFINED in the pruned space).
    * Never an n² doc-pair loop; hot surviving terms skew the join key and
    * AQE skew handling applies.
    */
  def tfidfPairs(spark: SparkSession, dir: String): DataFrame = {
    // materialized: the corpus tokenize+explode is the dominant pass and
    // tf has three consumers (df table, N, weights) — each reference
    // would otherwise re-tokenize every document (12 corpus scans in the
    // former plan; one tokenize pass now)
    val tf = graft.core.Materialize(
      Tables.documents(spark, dir)
        .select(col("doc_id").as("id"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("id")).as("n_docs"))
    // materialized: consumed by the norm rollup and BOTH sides of the
    // inverted-index self-join
    val wts = graft.core.Materialize(tf.join(dfT, "term")
      .crossJoin(broadcast(n))
      .where(col("df") * 4 <= col("n_docs"))
      .select(col("id"), col("term"),
        (col("tf") * (length(bin(col("n_docs"))) - length(bin(col("df"))))
          .cast("long")).as("w"))
      .where(col("w") > 0))
    val norms = wts.groupBy(col("id")).agg(sum(col("w") * col("w")).as("nrm"))
    val dots = wts.toDF("a_id", "term", "wa")
      .join(wts.toDF("b_id", "term", "wb"), Seq("term"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.toDF("a_id", "na"), "a_id")
      .join(norms.toDF("b_id", "nb"), "b_id")
      .where(col("dot") > 0 &&
        lit(4L) * col("dot") * col("dot") >= col("na") * col("nb"))
      .select(col("a_id"), col("b_id"), col("dot"),
        round(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6).as("cosine"))
  }

  private val tfidfPairsSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    s"""WITH tok AS (
       |  SELECT doc_id AS id, unnest($w) AS term FROM documents
       |), tf AS (
       |  SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), dft AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), n AS (
       |  SELECT count(DISTINCT id) AS n_docs FROM tf
       |), wts AS (
       |  SELECT tf.id, tf.term,
       |    (tf.tf * (len(bin(n.n_docs)) - len(bin(dft.df))))::BIGINT AS w
       |  FROM tf JOIN dft ON dft.term = tf.term CROSS JOIN n
       |  WHERE dft.df * 4 <= n.n_docs
       |    AND (tf.tf * (len(bin(n.n_docs)) - len(bin(dft.df)))) > 0
       |), nrm AS (
       |  SELECT id, CAST(sum(w * w) AS BIGINT) AS nrm FROM wts GROUP BY id
       |), dots AS (
       |  SELECT a.id AS a_id, b.id AS b_id, CAST(sum(a.w * b.w) AS BIGINT) AS dot
       |  FROM wts a JOIN wts b ON a.term = b.term AND a.id < b.id
       |  GROUP BY 1, 2
       |)
       |SELECT d.a_id, d.b_id, d.dot,
       |  round(d.dot::DOUBLE / (sqrt(na.nrm::DOUBLE) * sqrt(nb.nrm::DOUBLE)), 6)
       |    AS cosine
       |FROM dots d
       |JOIN nrm na ON na.id = d.a_id
       |JOIN nrm nb ON nb.id = d.b_id
       |WHERE d.dot > 0 AND 4 * d.dot * d.dot >= na.nrm * nb.nrm""".stripMargin
  }

  // ---- binned percentile-rank normalization -------------------------------
  /** Rank (quantile) normalization of a feature — the scaling step before
    * mixing heterogeneous quality signals: each doc's `n_chars` maps to
    * its corpus permille rank, computed from a BINNED cumulative histogram
    * rather than a global rank window. Resolution is one bin (16 chars);
    * the permille is `(docs in strictly lower bins)·1000 div n_docs` —
    * pure integer math, bit-identical across engines.
    *
    * Scale shape (the [[graft.operators.Quantiles]] device applied to
    * normalization): the only data-sized operations are one
    * `groupBy(bin).count()` histogram (map-side combine; shuffle = one row
    * per occupied bin) and one broadcast join of the ≤ few-hundred-row
    * cumulative table back onto the corpus — where `percent_rank()` would
    * shuffle AND sort every row in one unpartitioned window. The
    * cumulative window here runs on the bin table only (bounded frame, so
    * its single-partition window is O(bins), not O(corpus)).
    */
  def rankNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bin", expr("n_chars div 16"))
    val hist = docs.groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.join(broadcast(cum.select(col("bin"), col("below"))), "bin")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_chars"),
        expr("(below * 1000) div n_docs").as("permille"))
  }

  private val rankNormalizeSql =
    """WITH d AS (
      |  SELECT doc_id, n_chars, n_chars // 16 AS bin FROM documents
      |), h AS (
      |  SELECT bin, count(*) AS c FROM d GROUP BY bin
      |), cum AS (
      |  SELECT bin, coalesce(sum(c) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM h
      |), n AS (SELECT count(*) AS n_docs FROM d)
      |SELECT d.doc_id, d.n_chars,
      |  CAST((cum.below * 1000) // n.n_docs AS BIGINT) AS permille
      |FROM d JOIN cum ON cum.bin = d.bin CROSS JOIN n""".stripMargin

  // ---- rendezvous (highest-random-weight) shard routing -------------------
  private val RvShards = 8
  private val RvSeed = 31

  /** Rendezvous (HRW) routing: each doc lands on the shard with the
    * highest seeded hash h(seed, shard, doc) — the consistent-placement
    * primitive for shard-local dedup indexes and embedding stores. Unlike
    * `hash(doc) mod n`, removing one shard relocates ONLY that shard's
    * docs (proven in-row: `shard_drop0` recomputes placement without
    * shard 0 and `moved` flags exactly its former tenants). Map-only:
    * the ×`RvShards` candidate explode happens in-stage and the argmax
    * window is partitioned by doc — at 100 TB this is scan-speed routing
    * with zero coordination state.
    */
  def rendezvousRoute(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(RvShards - 1))).as("shard"))
      .withColumn("h", graft.functions.PortableHash.h48(
        concat_ws(":", lit(RvSeed.toString), col("shard"), col("doc_id"))))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h").desc, col("shard"))
    val full = h.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("shard"))
    val drop0 = h.where(col("shard") =!= 0)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("shard").as("shard_drop0"))
    full.join(drop0, "doc_id")
      .withColumn("moved", (col("shard") =!= col("shard_drop0")).cast("int"))
  }

  private val rendezvousRouteSql = {
    val h = graft.functions.PortableHash.h48Sql(
      s"'$RvSeed' || ':' || shard::VARCHAR || ':' || doc_id::VARCHAR")
    s"""WITH c AS (
       |  SELECT doc_id, unnest(range($RvShards)) AS shard FROM documents
       |), h AS (
       |  SELECT doc_id, shard, $h AS h FROM c
       |), full_r AS (
       |  SELECT doc_id, shard FROM (SELECT doc_id, shard,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) AS rk
       |  FROM h) WHERE rk = 1
       |), drop0 AS (
       |  SELECT doc_id, shard AS shard_drop0 FROM (SELECT doc_id, shard,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) AS rk
       |  FROM h WHERE shard <> 0) WHERE rk = 1
       |)
       |SELECT f.doc_id, f.shard, d.shard_drop0,
       |  CAST(f.shard <> d.shard_drop0 AS INT) AS moved
       |FROM full_r f JOIN drop0 d ON f.doc_id = d.doc_id""".stripMargin
  }

  // ---- domain mixture sampling -------------------------------------------
  private val MixSeed = 7
  private val SplitSeed = 77
  private val H48Range = 281474976710656.0 // 2^48

  /** Training-data mixing: downsample each source to a target rate with a
    * DETERMINISTIC keep rule — keep doc iff seeded h48(doc_id) < rate·2^48.
    * Hash-gated sampling (vs `sample()`) is reproducible across runs and
    * engines, independent of partitioning, and stable under corpus edits
    * (other docs' arrival never flips this doc's fate) — the properties a
    * rebuildable training mixture needs. Map-only pass + one aggregation;
    * at 100 TB the filter runs at scan speed and the output mixture is
    * exactly re-derivable from the recipe (seed + rate table).
    * Demo rate table: source index mod 4 → 0.25 / 0.50 / 0.75 / 1.00.
    */
  /** Deterministic train/val/test assignment — the split every training
    * run needs to be REPRODUCIBLE and leakage-free: bucket = seeded
    * portable hash of the doc id mod 100 (98/1/1), so membership is a
    * pure function of identity — stable across runs, engines, cluster
    * sizes, and re-shards, and a document can never migrate between
    * splits when the corpus grows. Map-only scan + one rollup; the same
    * device at 100 TB assigns a trillion docs with zero coordination.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    val hmod = graft.functions.PortableHash
      .h48(col("doc_id").cast("string"), SplitSeed) % 100
    Tables.documents(spark, dir)
      .withColumn("split",
        when(hmod < 98, "train").when(hmod === 98, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
  }

  private val splitAssignSql = {
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR", SplitSeed)
    s"""SELECT source,
       |  CASE WHEN hmod < 98 THEN 'train'
       |       WHEN hmod = 98 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
       |FROM (SELECT source, n_chars, $h % 100 AS hmod FROM documents)
       |GROUP BY 1, 2""".stripMargin
  }

  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val srcIdx = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val rate = (lit(1.0) + (srcIdx % 4).cast("double")) / 4.0
    val keep = graft.functions.PortableHash.h48(col("doc_id").cast("string"), MixSeed)
      .cast("double") < rate * H48Range
    Tables.documents(spark, dir)
      .select(col("source"), rate.as("rate"),
        when(keep, 1L).otherwise(0L).as("keep"))
      .groupBy("source")
      .agg(max(col("rate")).as("target_rate"), count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"))
  }

  private val domainMixSql = {
    val rate = s"(1.0 + (regexp_extract(source, '(\\d+)', 1)::INT % 4)) / 4.0"
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR", MixSeed)
    s"""WITH d AS (
       |  SELECT source, $rate AS rate,
       |    CASE WHEN $h::DOUBLE < ($rate) * $H48Range THEN 1 ELSE 0 END AS keep
       |  FROM documents
       |)
       |SELECT source, max(rate) AS target_rate, count(*) AS n_docs,
       |  sum(keep)::BIGINT AS n_kept
       |FROM d GROUP BY source""".stripMargin
  }

  // ---- train-test decontamination -----------------------------------------
  private[catalog] val DecontamN = 8

  /** Benchmark decontamination: flag training docs that share any word
    * 8-gram with an evaluation set — the canonical pre-training hygiene
    * pass (eval answers leaking into training data inflate benchmarks).
    * Here the "benchmark" is the deterministic doc_id % 97 == 0 slice of
    * the corpus, standing in for an external eval table.
    *
    * Scale shape (the cross-corpus complement of [[spanDedup]]'s
    * within-corpus pass): the join key is the 48-bit portable hash of each
    * shingle, not the ~50-byte shingle string — 6× less exploded data in
    * flight, and the ~n²/2^49 hash-collision false-positive odds only ever
    * over-exclude (the safe direction for decontamination; the oracle
    * mirrors the hash, so the compare is exact). The benchmark's hash set
    * deduplicates small (a real eval set is tiny) and BROADCASTS, so the
    * corpus side never shuffles — the whole pass is scan + map-side probe;
    * doc verdicts come back via one distinct + left join keyed by doc_id,
    * and the final rollup reads only (doc_id, source), never re-shingling.
    * An earlier draft benched 37 s at sf0.1 vs ~2 s for this: it staged the
    * shingle array through its own Project before exploding, and Spark's
    * InferFiltersFromGenerate pushed an inferred `size(sh) > 0` filter
    * below that Project — textually re-inlining the WHOLE tokenize+shingle
    * expression (8 `split()` re-evaluations per window) into the filter.
    * Keeping the shingle expression inside the generator itself
    * ([[MinHashLsh.explodeShingles]], the shape every shingle operator here
    * uses) never grows the inferred filter.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontamFrame(Tables.documents(spark, dir))

  /** The distinct contaminated-train-doc ids of [[decontamFrame]] —
    * factored so [[Composites.splitHygienePipeline]] removes the SAME
    * docs the standalone census counts.
    */
  private[catalog] def decontamHits(documents: DataFrame): DataFrame = {
    val shingled = MinHashLsh
      .explodeShingles(documents, "doc_id", "text", DecontamN)
      .select(col("id").as("doc_id"),
        graft.functions.PortableHash.h48(col("shingle")).as("hs"))
    val bench = shingled.filter(col("doc_id") % 97 === 0)
      .select(col("hs")).distinct()
    shingled.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("hs"))
      .select(col("doc_id")).distinct()
  }

  /** Frame-level core of [[decontaminate]] for spec-sized corpora. */
  def decontamFrame(documents: DataFrame): DataFrame =
    documents.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"))
      .join(decontamHits(documents).withColumn("hit", lit(1L)),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))

  /** The `t/s/e/b/hits` CTE block of [[decontaminateSql]] (no leading
    * WITH) — shared with the split-hygiene composite's oracle.
    */
  private[catalog] val decontamHitsCtes = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", DecontamN)
    val h = graft.functions.PortableHash.h48Sql("sg")
    s"""t AS (
       |  SELECT doc_id, $w AS w FROM documents
       |), s AS (
       |  SELECT doc_id, $sh AS sh FROM t
       |), e AS (
       |  SELECT doc_id, $h AS hs
       |  FROM (SELECT doc_id, unnest(sh) AS sg FROM s)
       |), b AS (
       |  SELECT DISTINCT hs FROM e WHERE doc_id % 97 = 0
       |), hits AS (
       |  SELECT DISTINCT e.doc_id FROM e JOIN b ON e.hs = b.hs
       |  WHERE e.doc_id % 97 <> 0
       |)""".stripMargin
  }

  private val decontaminateSql =
    s"""WITH $decontamHitsCtes
       |SELECT source, count(*) AS n_docs,
       |  sum(CASE WHEN doc_id IN (SELECT doc_id FROM hits) THEN 1 ELSE 0 END)::BIGINT
       |    AS n_contaminated
       |FROM documents WHERE doc_id % 97 <> 0 GROUP BY source""".stripMargin

  // ---- shared-span extent (exact-substring dedup signal) ------------------
  /** Within-doc multiplicity cap for positional grams: a gram occurring
    * more than this many times inside ONE doc is dropped from the span
    * match (both engines) — the occ_A×occ_B positional-match product is a
    * quadratic risk, and hyper-repeated grams ("spam spam spam …") are
    * exactly where it detonates. Runs through a dropped gram split, so the
    * reported span is a LOWER bound there — the conservative direction for
    * a dedup/contamination-extent audit.
    */
  private val SpanMaxOcc = 8

  /** Document-frequency cap: a gram carried (post-occ-cap) by more than
    * this many DOCS is boilerplate (headers, licenses, templates) and is
    * dropped before pairing — the second quadratic risk (df² pairs per
    * gram). Both caps together give the pair join a FIXED per-gram budget:
    * ≤ df²·occ² = (50·8)² positional matches per gram, independent of
    * corpus size.
    */
  private val SpanDfCap = 50

  /** Shared-span EXTENT: for every doc pair sharing a word 8-gram, the
    * length in tokens of the longest contiguous token run the two docs
    * share. [[spanDedup]] answers "what fraction of a doc's 8-grams are
    * owned elsewhere"; this answers "HOW LONG is the longest verbatim
    * overlap" — the quantity the exact-substring dedup line of work
    * (suffix-array dedup over training corpora; Lee et al. 2021, public)
    * acts on, re-expressed relationally: a run of L consecutive matching
    * 8-gram start positions at one constant positional offset IS a shared
    * span of L+7 tokens, so longest-span = a gaps-and-islands pass over
    * matched positions. Downstream policy cuts on span_tokens (e.g. "strip
    * any shared span ≥ 50 tokens"); filtering pairs that cross a
    * train/eval split boundary makes it the contamination-extent audit.
    *
    * Scale shape: each self-join side pays exactly ONE corpus-sized
    * exchange — the positional grams repartition on the 48-bit gram hash,
    * and both cap windows ride that same clustering (hash-partitioning on
    * `hg` satisfies the (hg, doc_id) window's clustered distribution), so
    * the join consumes two already-hg-clustered inputs with no further
    * corpus-sized exchange (the classic two-pass self-join trade, as in
    * [[decontaminate]]'s two shingle passes: recompute beats a checkpoint
    * write of the whole exploded frame; AQE broadcasts the build side
    * while the capped frame fits, sort-merges past that). The pair join's
    * output is budgeted per gram by the two caps (scaladoc on
    * [[SpanMaxOcc]]/[[SpanDfCap]]); every post-join exchange — island
    * window on (a, b, diag), pair rollup — is match-sized, never
    * corpus-sized.
    */
  def dupSpanExtent(spark: SparkSession, dir: String): DataFrame =
    dupSpanExtentFrame(Tables.documents(spark, dir))

  /** Frame-level core of [[dupSpanExtent]] — unit-tested in DedupSpec. */
  def dupSpanExtentFrame(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // positional 8-grams WITH multiplicity (runs need every occurrence),
    // hashed to 48 bits so matching carries 8-byte keys, not ~50-byte
    // grams. toks materializes before the generator and the gram
    // expression stays INSIDE it — the explodeShingles/decontaminate shape
    // (see the InferFiltersFromGenerate note there).
    val ph = documents
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextFns.ngrams(col("toks"), DecontamN))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        graft.functions.PortableHash.h48(col("gram")).as("hg"))
      .repartition(col("hg"))
    // cap 1: within-doc occurrence — the (hg, doc_id) window rides the hg
    // clustering (no new exchange). cap 2: document frequency of the
    // SURVIVORS — dense_rank over doc_id inside each hg partition counts
    // distinct docs without a second aggregate pass.
    val occ = count(lit(1))
      .over(Window.partitionBy(col("hg"), col("doc_id")))
    val capped = ph.withColumn("occ", occ)
      .filter(col("occ") <= SpanMaxOcc)
    val dr = dense_rank()
      .over(Window.partitionBy(col("hg")).orderBy(col("doc_id")))
    val df = max(col("dr")).over(Window.partitionBy(col("hg")))
    val keep = capped.withColumn("dr", dr).withColumn("df", df)
      .filter(col("df") <= SpanDfCap)
      .select(col("doc_id"), col("pos"), col("hg"))
    // pair matches (a < b): both sides carry the hg clustering, so this is
    // a sort-merge with zero additional exchanges
    val a = keep.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("hg"))
    val b = keep.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("hg"))
    val m = a.join(b, Seq("hg")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"),
        (col("pa") - col("pb")).as("diag"))
    // gaps-and-islands: consecutive matched positions at one offset are
    // one island; island size + (N-1) = shared span in tokens
    val runW = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    val runs = m.withColumn("island", col("pa") - row_number().over(runW))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg((max(col("run")) + lit(DecontamN - 1L)).as("span_tokens"),
        sum(col("run")).as("n_matched_grams"))
  }

  private val dupSpanExtentSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val gs = graft.functions.TextFns.ngramsSql("w", DecontamN)
    val h = graft.functions.PortableHash.h48Sql("gram")
    s"""WITH t AS (
       |  SELECT doc_id, $w AS w FROM documents
       |), g AS (
       |  SELECT doc_id, $gs AS gs FROM t
       |), ph AS (
       |  SELECT doc_id, pos, $h AS hg FROM (
       |    SELECT doc_id, unnest(gs) AS gram, generate_subscripts(gs, 1) AS pos
       |    FROM g)
       |), capped AS (
       |  SELECT doc_id, pos, hg FROM (
       |    SELECT doc_id, pos, hg,
       |      count(*) OVER (PARTITION BY hg, doc_id) AS occ FROM ph)
       |  WHERE occ <= $SpanMaxOcc
       |), keep AS (
       |  SELECT doc_id, pos, hg FROM (
       |    SELECT doc_id, pos, hg,
       |      max(dr) OVER (PARTITION BY hg) AS df FROM (
       |      SELECT doc_id, pos, hg,
       |        dense_rank() OVER (PARTITION BY hg ORDER BY doc_id) AS dr
       |      FROM capped))
       |  WHERE df <= $SpanDfCap
       |), m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
       |    a.pos - b.pos AS diag
       |  FROM keep a JOIN keep b ON a.hg = b.hg AND a.doc_id < b.doc_id
       |), runs AS (
       |  SELECT doc_a, doc_b, count(*) AS run
       |  FROM (
       |    SELECT doc_a, doc_b, diag,
       |      pa - row_number() OVER (
       |        PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island
       |    FROM m)
       |  GROUP BY doc_a, doc_b, diag, island
       |)
       |SELECT doc_a, doc_b,
       |  (max(run) + ${DecontamN - 1})::BIGINT AS span_tokens,
       |  sum(run)::BIGINT AS n_matched_grams
       |FROM runs GROUP BY doc_a, doc_b""".stripMargin
  }

  // ---- incremental ingestion dedup ----------------------------------------
  private val IngestN = 8

  /** Incremental-ingestion dedup: vet a NEW batch (here the deterministic
    * doc_id % 10 == 3 slice, standing in for a daily crawl drop) against
    * the EXISTING corpus before admission — the streaming-shaped complement
    * of the whole-corpus batch passes. Two tiers, cheapest first: exact
    * content-key match, then any shared word 8-gram (the [[spanDedup]]
    * signal); verdict = exact | near | unique.
    *
    * Scale shape (mirrors [[decontaminate]], direction reversed): the batch
    * is small by construction, so BOTH probes broadcast the batch side —
    * the existing corpus is scanned once per tier and never shuffles; hit
    * doc_ids come back through a distinct on batch-sized data. At real
    * scale the corpus side of the exact tier is a pre-built key index
    * (the [[dedupExact]] output you already store), making admission a
    * pure scan+probe job.
    */
  def ingestDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isBatch = col("doc_id") % 10 === 3
    val keyed = docs.select(col("doc_id"), col("source"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("ck"))
    val exactHits = keyed.filter(!isBatch)
      .join(broadcast(keyed.filter(isBatch)
        .select(col("doc_id").as("b_id"), col("ck"))), "ck")
      .select(col("b_id")).distinct().withColumn("exact_hit", lit(1L))
    val sh = MinHashLsh.explodeShingles(docs, "doc_id", "text", IngestN)
      .select(col("id"), graft.functions.PortableHash.h48(col("shingle")).as("hs"))
    val spanHits = sh.filter(col("id") % 10 =!= 3)
      .join(broadcast(sh.filter(col("id") % 10 === 3)
        .select(col("id").as("b_id"), col("hs")).distinct()), "hs")
      .select(col("b_id")).distinct().withColumn("span_hit", lit(1L))
    keyed.filter(isBatch).select(col("doc_id"), col("source"))
      .join(exactHits.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
      .join(spanHits.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("exact_hit"), lit(0L)).as("exact_dup"),
        coalesce(col("span_hit"), lit(0L)).as("span_dup"),
        when(coalesce(col("exact_hit"), lit(0L)) === 1L, "exact")
          .when(coalesce(col("span_hit"), lit(0L)) === 1L, "near")
          .otherwise("unique").as("verdict"))
  }

  private val ingestDedupSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", IngestN)
    val h = graft.functions.PortableHash.h48Sql("sg")
    s"""WITH k AS (
       |  SELECT doc_id, source,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS ck
       |  FROM documents
       |), ex AS (
       |  SELECT DISTINCT b.doc_id FROM k b JOIN k c ON b.ck = c.ck
       |  WHERE b.doc_id % 10 = 3 AND c.doc_id % 10 <> 3
       |), e AS (
       |  SELECT doc_id, $h AS hs
       |  FROM (SELECT doc_id, unnest(sh) AS sg FROM
       |    (SELECT doc_id, $sh AS sh FROM
       |      (SELECT doc_id, $w AS w FROM documents) WHERE len(w) >= $IngestN))
       |), sp AS (
       |  SELECT DISTINCT b.doc_id FROM e b JOIN e c ON b.hs = c.hs
       |  WHERE b.doc_id % 10 = 3 AND c.doc_id % 10 <> 3
       |)
       |SELECT k.doc_id, k.source,
       |  (CASE WHEN k.doc_id IN (SELECT doc_id FROM ex) THEN 1 ELSE 0 END)::BIGINT AS exact_dup,
       |  (CASE WHEN k.doc_id IN (SELECT doc_id FROM sp) THEN 1 ELSE 0 END)::BIGINT AS span_dup,
       |  CASE WHEN k.doc_id IN (SELECT doc_id FROM ex) THEN 'exact'
       |       WHEN k.doc_id IN (SELECT doc_id FROM sp) THEN 'near'
       |       ELSE 'unique' END AS verdict
       |FROM k WHERE k.doc_id % 10 = 3""".stripMargin
  }

  // ---- stratified quota sampling ------------------------------------------
  private val StrataSeed = 13
  private val StrataQuota = 50L

  /** Exact per-source quota sampling: keep the `StrataQuota` docs with the
    * smallest seeded h48 in each source — the quota-based complement of
    * [[domainMix]]'s rate-based sampling, with the same determinism
    * properties (a pure function of doc ids; reproducible anywhere).
    *
    * Scale shape: ranking a 100 TB stratum directly would sort the whole
    * stratum for k winners. Instead, a one-row-per-source count broadcasts
    * back and gates the scan to h < 4·quota/n (an ~4·quota-row survivor
    * set per stratum, map-only); only survivors enter the rank window.
    * The oracle mirrors the gate exactly, so the check stays bit-exact
    * even in the astronomically-unlikely under-gate case.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    quotaSample(Tables.documents(spark, dir).select(col("source"),
      col("doc_id")), StrataQuota, StrataSeed)

  /** Per-stratum quota pick shared by [[stratifiedSample]] and
    * [[Composites.evalProtocolPipeline]] (factored so the gate constant
    * and tie-break cannot drift between consumers): keep the `quota` docs
    * with the smallest seeded h48 per source, behind the broadcast
    * 4·quota/n gate — a 100 TB stratum is never globally sorted for k
    * winners; only the ~4·quota expected survivors enter the rank window.
    */
  private[catalog] def quotaSample(docs: DataFrame, quota: Long,
                                   seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.PortableHash.h48(col("doc_id").cast("string"), seed)
    val t = docs.select(col("source"), col("doc_id"), h.as("h"))
    val counts = t.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val tau = least(lit(1.0), lit(4.0 * quota) / col("n")) * H48Range
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    t.join(broadcast(counts), Seq("source"))
      .filter(col("h").cast("double") < tau)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** DuckDB twin of [[quotaSample]]. `from` must expose (source, doc_id)
    * — a table or CTE name.
    */
  private[catalog] def quotaSampleSql(from: String, quota: Long,
                                      seed: Int): String = {
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR", seed)
    s"""SELECT doc_id, source, rk::BIGINT AS rk FROM (
       |  SELECT t.doc_id, t.source,
       |    row_number() OVER (PARTITION BY t.source
       |      ORDER BY t.h, t.doc_id) AS rk
       |  FROM (SELECT source, doc_id, $h AS h FROM $from) t
       |  JOIN (SELECT source, count(*) AS n FROM $from GROUP BY source) c
       |    ON t.source = c.source
       |  WHERE t.h::DOUBLE < least(1.0, ${4.0 * quota} / c.n) * $H48Range
       |) WHERE rk <= $quota""".stripMargin
  }

  private val stratifiedSampleSql =
    quotaSampleSql("documents", StrataQuota, StrataSeed)

  // ---- token-budget shard packing -----------------------------------------
  // shared with the streaming twin ([[graft.streaming.StreamingOps
  // .ingestPackStream]]) so batch and stream pack to the same geometry
  private[graft] val PackBuckets = 32
  private[graft] val PackBudget = 2048L

  /** Training-shard assignment: pack documents into ~`PackBudget`-token
    * shards, deterministically. Globally-greedy packing is a sequential
    * scan — unusable at 100 TB — so docs first spread over `PackBuckets`
    * independent buckets by content-stable h48(doc_id); each bucket packs
    * its own docs by running token sum (a bucket-partitioned window), and
    * the waste is bounded at one partial shard per bucket. Bucket count is
    * the parallelism knob: set it to O(cluster cores) and every window
    * partition stays executor-sized. Same hash-determinism argument as
    * [[domainMix]]: the assignment is a pure function of doc content keys,
    * reproducible across runs, engines, and partitionings.
    */
  def shardPack(spark: SparkSession, dir: String): DataFrame =
    packShards(Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_tokens")))

  /** The packing core of [[shardPack]] over any `(doc_id, n_tokens)`
    * frame — factored so [[Composites.curationFunnel]] packs its SURVIVOR
    * set through the identical bucket/window/budget logic.
    */
  private[catalog] def packShards(withTokens: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.PortableHash.h48(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTokens
      .select(col("doc_id"), col("n_tokens"), h.as("h"))
      .withColumn("bucket", (col("h") % PackBuckets).cast("int"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // shard = which budget window the doc's START falls in — integer
      // `div`, not `/` (long / long is double division in Spark SQL)
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"(cum - n_tokens) div $PackBudget").as("shard"))
  }

  /** DuckDB twin of [[packShards]] over a CTE/table named `table` with
    * `(doc_id, n_tokens)` columns: emits `(doc_id, n_tokens, bucket,
    * shard)` as a complete SELECT.
    */
  private[catalog] def packShardsSql(table: String): String = {
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR")
    s"""SELECT doc_id, n_tokens, bucket,
       |    ((cum - n_tokens) // $PackBudget)::BIGINT AS shard
       |  FROM (
       |    SELECT doc_id, n_tokens, bucket,
       |      sum(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM (SELECT doc_id, n_tokens, (($h) % $PackBuckets)::INT AS bucket,
       |            $h AS h
       |          FROM $table))""".stripMargin
  }

  private val shardPackSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, len($w)::BIGINT AS n_tokens FROM documents
       |)
       |${packShardsSql("t")}""".stripMargin
  }

  // ---- frequency-ranked vocabulary encoding -------------------------------
  private val VocabSize = 16

  /** Tokenizer vocabulary assignment + corpus encoding — the id-mapping
    * step between `bpe_merges` (learn the units) and `pack_sequences`
    * (lay out the ids): ids 0..V−1 go to the top-V tokens by
    * (freq DESC, token ASC); every other token is OOV (−1). The vocab
    * build is the corpus's ONE data-sized aggregate (vocab-bounded
    * output); the vocab itself is collected to the driver (V rows — the
    * k-means-centroid pattern) and applied as a literal map inside
    * higher-order functions, so encoding is MAP-ONLY: no explode, no
    * join, no per-doc re-aggregation shuffle. V=16 here keeps OOV
    * behavior exercised on this corpus (vocab ≈ 33).
    *
    * Output is per-doc accounting (token/OOV counts and a
    * position-weighted id checksum Σ(pos+1)·(id+2)) rather than the raw
    * id array — scalar columns are the oracle-comparable contract
    * (SchemaGuard), and the checksum pins both ids AND their order.
    */
  def vocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextFns.tokens(lower(col("text")))
    val vocab: Map[String, Int] = Tables.documents(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(VocabSize)
      .collect().zipWithIndex.map { case (r, i) => r.getString(0) -> i }.toMap
    val vm = typedLit(vocab)
    val ids = transform(toks, t => coalesce(element_at(vm, t), lit(-1)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), ids.as("ids"))
      .where(size(col("ids")) > 0)
      .select(
        col("doc_id"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), x => x === -1)).cast("long").as("n_oov"),
        aggregate(
          transform(col("ids"), (x, i) => (i + 1).cast("long") * (x + 2)),
          lit(0L), (a, b) => a + b).as("ids_checksum"))
  }

  private val vocabEncodeSql = {
    val w = graft.functions.TextFns.tokensSql("lower(text)")
    s"""WITH tf AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest($w) AS word FROM documents)
       |  GROUP BY word
       |), v AS (
       |  SELECT word, row_number() OVER (ORDER BY cnt DESC, word) - 1 AS vid
       |  FROM tf ORDER BY cnt DESC, word LIMIT $VocabSize
       |), tok AS (
       |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |), enc AS (
       |  SELECT t.doc_id, t.pos, coalesce(v.vid, -1) AS vid
       |  FROM (SELECT doc_id, pos, w[pos] AS t FROM tok) t
       |  LEFT JOIN v ON v.word = t.t
       |)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN vid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(pos * (vid + 2)) AS BIGINT) AS ids_checksum
       |FROM enc GROUP BY doc_id""".stripMargin
  }

  // ---- k-means embedding clustering ---------------------------------------
  private val KmK = 8
  private val KmIters = 3

  /** Deterministic Lloyd clustering of the embedding corpus
    * ([[graft.operators.KMeans]]): k=8, 3 exact integer-quantized
    * iterations, first-k-by-id init. The cluster column feeds per-topic
    * sampling the way [[stratifiedSample]] feeds per-source sampling.
    */
  // one quantized (vec_id, qv) copy of the embedding corpus, shared by the
  // Lloyd fit, the assignment and the silhouette readout — each formerly
  // paid its own quantize + checkpoint of the same bytes
  private def kmQv(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "kmeans_qv", dir) {
      graft.operators.KMeans.quantizedFrame(
        Tables.embeddings(spark, dir), "vec_id", "embedding")
    }

  /** The fitted centroids as a per-corpus shared artifact (prepare/serve
    * split): the Lloyd iterations — `KmIters` full corpus passes each — run
    * once per process inside the memo build and every consumer
    * (kmeans_cluster, kmeans_silhouette, cluster_sample, semantic_dedup,
    * cluster_prune) serves from the k-row result. Collecting k = [[KmK]]
    * rows per call keeps cost attribution honest: a cold attempt pays the
    * fit inside the memo (visible in `shared_builds`), a warm one pays a
    * k-row read, and [[graft.core.Shared.clear]] restores the cold path.
    */
  private def kmCentroids(spark: SparkSession, dir: String): Array[Array[Long]] = {
    val df = graft.core.Shared.memo(spark, "kmeans_centroids", dir) {
      import spark.implicits._
      val cents = graft.operators.KMeans.fit(kmQv(spark, dir), KmK, KmIters)
      cents.zipWithIndex.toSeq
        .map { case (c, j) => (j.toLong, c.toSeq) }.toDF("cid", "cv")
    }
    df.orderBy(col("cid")).collect().map(_.getSeq[Long](1).toArray)
  }

  def kmeansCluster(spark: SparkSession, dir: String): DataFrame =
    // memoized: cluster_sample and semantic_dedup re-consume the same
    // assignment instead of re-running Lloyd's iterations
    graft.core.Shared.memo(spark, "kmeans_assignment", dir) {
      graft.operators.KMeans.assign(
        kmQv(spark, dir), kmCentroids(spark, dir))
    }

  private val kmeansClusterSql =
    graft.operators.KMeans.clusterSql("embeddings", "vec_id", "embedding",
      KmK, KmIters, Dim)

  /** [[graft.operators.KMeans.silhouette]] over the same deterministic
    * Lloyd run as [[kmeansCluster]]: per-cluster mean of the per-point
    * (b−a)/b separation against the second-nearest centroid — the "is
    * this clustering worth sampling from" audit gating [[clusterSample]],
    * the clustering-side sibling of [[labelSeparation]].
    */
  def kmeansSilhouette(spark: SparkSession, dir: String): DataFrame =
    // serves from the SAME shared quantized frame + fitted centroids as
    // [[kmeansCluster]] — formerly re-ran the full Lloyd fit (KmIters
    // corpus passes) just to audit a clustering that was already computed
    graft.operators.KMeans.silhouetteFrom(
      kmQv(spark, dir), kmCentroids(spark, dir))

  private val kmeansSilhouetteSql =
    graft.operators.KMeans.silhouetteSql("embeddings", "vec_id", "embedding",
      KmK, KmIters, Dim)

  // ---- weighted sampling without replacement ------------------------------
  private val WsK = 200L
  private val WsSeed = 31

  /** Deterministic WEIGHTED sampling without replacement for integer
    * weights: doc priority = min over its `w` replicas of
    * h48(seed : doc_id : replica) — a doc with twice the weight gets twice
    * the draws at the priority lottery, so inclusion probability rises
    * with weight (the integer-exact stand-in for the Efraimidis–Spirakis
    * exponential-keys scheme, whose u^(1/w) keys would hang the
    * cross-engine compare on last-ulp ln/exp differences). Keep the k
    * smallest priorities globally.
    *
    * Scale shape: the replica fan-out is bounded by the WEIGHT (≤ 10
    * here), map-side generated and immediately min-aggregated — the
    * shuffle carries one (doc, priority) row per doc, and the global
    * top-k is TakeOrdered (per-partition k then merge), never a full
    * sort. Weights beyond ~100 should switch to the float-keys variant
    * with a quantized tie-band; integer corpus weights (quality tiers,
    * dedup counts) fit this directly.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = Tables.documents(spark, dir)
      .select(col("doc_id"), (lit(1) + col("n_chars") % 10).cast("long").as("wt"))
      .select(col("doc_id"), col("wt"),
        explode(sequence(lit(0L), col("wt") - 1)).as("rep"))
      .select(col("doc_id"), col("wt"), graft.functions.PortableHash.h48(
        concat_ws(":", lit(WsSeed.toString), col("doc_id"), col("rep"))).as("h"))
      .groupBy(col("doc_id"), col("wt")).agg(min(col("h")).as("pri"))
    // TakeOrdered top-k FIRST (per-partition k, then merge — no global
    // sort); the unpartitioned rank window then only ever sees k rows
    val w = Window.orderBy(col("pri"), col("doc_id"))
    pri.orderBy(col("pri"), col("doc_id")).limit(WsK.toInt)
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  private val weightedSampleSql =
    s"""WITH w AS (
       |  SELECT doc_id, (1 + n_chars % 10)::BIGINT AS wt FROM documents
       |), r AS (
       |  SELECT doc_id, wt, unnest(range(wt)) AS rep FROM w
       |), p AS (
       |  SELECT doc_id, wt,
       |    min(${graft.functions.PortableHash.h48Sql(
              s"'$WsSeed' || ':' || doc_id::VARCHAR || ':' || rep::VARCHAR")}) AS pri
       |  FROM r GROUP BY doc_id, wt
       |)
       |SELECT doc_id, wt, pri, row_number() OVER (ORDER BY pri, doc_id) AS rk
       |FROM p QUALIFY rk <= $WsK""".stripMargin

  // ---- per-cluster quota sampling (kmeans ∘ stratified) -------------------
  private val CsQuota = 20L
  private val CsSeed = 29

  /** Topic-balanced sampling: [[kmeansCluster]]'s clusters play the role
    * [[stratifiedSample]]'s sources play — keep the `CsQuota` vectors with
    * the smallest seeded h48 per cluster. Composes the two round-5
    * primitives into the pass that balances a training mixture by CONTENT
    * (embedding topic) rather than provenance; same determinism argument,
    * and at scale the same broadcast-count gate as stratifiedSample slots
    * in front of the rank window.
    */
  def clusterSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("h"), col("vec_id"))
    kmeansCluster(spark, dir).select(col("vec_id"), col("cluster"))
      .withColumn("h",
        graft.functions.PortableHash.h48(col("vec_id").cast("string"), CsSeed))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= CsQuota)
      .select(col("vec_id"), col("cluster"), col("rk"))
  }

  private val clusterSampleSql = {
    val h = graft.functions.PortableHash.h48Sql("vec_id::VARCHAR", CsSeed)
    s"""WITH km AS (
       |${graft.operators.KMeans.clusterSql("embeddings", "vec_id", "embedding", KmK, KmIters, Dim)
            .linesIterator.map("  " + _).mkString("\n")}
       |), r AS (
       |  SELECT vec_id, cluster,
       |    row_number() OVER (PARTITION BY cluster ORDER BY $h, vec_id) AS rk
       |  FROM km
       |)
       |SELECT vec_id, cluster, rk::BIGINT AS rk FROM r WHERE rk <= $CsQuota""".stripMargin
  }

  // ---- semantic dedup (SemDeDup-style: kmeans ∘ within-cluster cosine) ----
  private val SemDedupTau = 0.4

  /** Semantic near-dup removal à la SemDeDup (Abbas et al. 2023): cluster
    * the embedding space with [[kmeansCluster]], then compare pairs ONLY
    * within a cluster — exact quantized cosine, drop every vector that has
    * a ≥ τ near-dup with a smaller id. The rule is
    * "dominated-by-any-smaller-id", NOT sequential greedy keep-first: in a
    * chain a~b, b~c (a≁c), greedy keep-first would re-keep c after
    * removing b, while this rule removes c too — a deliberately
    * order-free (hence embarrassingly parallel, single-join) variant that
    * over-removes relative to the sequential scan; the oracle mirrors the
    * same rule. The id order is the deterministic stand-in for the
    * paper's keep-farthest-from-centroid rule. A vector's verdict is
    * (vec_id, cluster, kept).
    *
    * Scale shape: the pair generator is an equi-join on the cluster id —
    * candidates are Σ nᵢ²/2 over cluster sizes, never n²/2 — and k grows
    * with corpus size (the paper runs k≈10⁵ at web scale) so clusters stay
    * bounded; the kept-verdict anti-join is a shuffle on vec_id. The
    * cosine rescorer reuses the hoisted-norm integer dot
    * ([[VectorOps.cosineQN]]), so each candidate pair costs one codegen
    * dot product.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupFrom(Tables.embeddings(spark, dir),
      kmeansCluster(spark, dir), SemDedupTau)

  /** Core of [[semanticDedup]] over explicit frames: `emb` = (vec_id,
    * embedding), `assignments` = (vec_id, cluster).
    */
  def semanticDedupFrom(emb: DataFrame, assignments: DataFrame,
                        tau: Double): DataFrame = {
    val v = emb.select(col("vec_id"),
      VectorOps.quantize(col("embedding")).as("qv"))
      .withColumn("nq", VectorOps.normQ(col("qv")))
    val km = assignments.select(col("vec_id"), col("cluster"))
    val member = km.join(v, "vec_id")
    val a = member.select(col("vec_id").as("lo"), col("cluster"),
      col("qv").as("qa"), col("nq").as("na"))
    val b = member.select(col("vec_id").as("hi"), col("cluster").as("cluster_b"),
      col("qv").as("qb"), col("nq").as("nb"))
    val removed = a.join(b,
        col("cluster") === col("cluster_b") && col("lo") < col("hi"))
      .where(VectorOps.cosineQN(col("qa"), col("qb"), col("na"), col("nb"))
        >= lit(tau))
      .select(col("hi").as("vec_id")).distinct()
    km.join(removed.withColumn("gone", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("gone").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }

  private val semanticDedupSql =
    s"""WITH km AS (
       |${graft.operators.KMeans.clusterSql("embeddings", "vec_id", "embedding", KmK, KmIters, Dim)
            .linesIterator.map("  " + _).mkString("\n")}
       |), q AS (
       |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv FROM embeddings
       |), removed AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM km a JOIN km b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN q qa ON qa.vec_id = a.vec_id
       |  JOIN q qb ON qb.vec_id = b.vec_id
       |  WHERE ${VectorOps.cosineQSql("qa.qv", "qb.qv", Dim)} >= $SemDedupTau
       |)
       |SELECT km.vec_id, km.cluster,
       |  CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
       |FROM km LEFT JOIN removed r ON r.vec_id = km.vec_id""".stripMargin

  // ---- BM25 ranked retrieval ----------------------------------------------
  private[catalog] val Bm25QueryMod = 61
  private val Bm25K = 5

  /** Keyword search over the corpus via [[graft.operators.Bm25]]: the query
    * set is "distinct first-5 tokens of every doc_id % 61 == 0 doc" (a
    * deterministic stand-in for user queries), scored BM25 against the
    * whole corpus, top-5 per query — served from the STORED index
    * ([[graft.sources.Bm25Store]], the round-12 prepare/serve split:
    * `bm25_index_build` pays the corpus pass, this query only reads).
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.sources.Bm25Store.serve(spark, dir, bm25Queries(docs), Bm25K)
  }

  /** The prepare step: build (or fingerprint-validate) the stored BM25
    * inverted index, then report its census from the STORED postings —
    * the readout attests the artifact itself, not a recomputation.
    */
  def bm25IndexBuild(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Bm25Store.postings(spark, dir)
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("tf")).as("n_tokens"),
        max(col("tf")).as("max_tf"))

  private val bm25IndexBuildSql = {
    val w = graft.functions.TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $w AS w FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
       |  GROUP BY doc_id, term
       |)
       |SELECT count(*)::BIGINT AS n_postings,
       |  count(DISTINCT term)::BIGINT AS n_terms,
       |  count(DISTINCT doc_id)::BIGINT AS n_docs,
       |  CAST(sum(tf) AS BIGINT) AS n_tokens,
       |  CAST(max(tf) AS BIGINT) AS max_tf
       |FROM tf""".stripMargin
  }

  /** The bm25_topk query set — "distinct first-5 tokens of every
    * doc_id % [[Bm25QueryMod]] == 0 doc" — shared with
    * [[Composites.retrievalPipeline]] so the retrieval stages serve the
    * SAME queries the standalone leg does.
    */
  private[catalog] def bm25Queries(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % Bm25QueryMod === 0)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(
          graft.functions.TextFns.tokens(col("text")), 1, 5))).as("term"))

  private val bm25TopKSql =
    graft.operators.Bm25.topKSql("documents", Bm25QueryMod, Bm25K)

  // ---- hybrid retrieval: reciprocal-rank fusion ---------------------------
  private val RrfC = 60   // the standard RRF damping constant
  private val FuseK = 10

  /** Hybrid search — reciprocal-rank fusion of the SPARSE (BM25) and DENSE
    * (embedding cosine) retrieval legs over one query set (ids ≡ 0 mod
    * [[QueryMod]]; `vec_id` is the embedding of `doc_id` — the corpus
    * convention). RRF (Cormack et al. 2009) needs only ranks, so two
    * incomparable score scales fuse without calibration:
    * score = Σ_legs ⌊10⁶/(c + rank)⌋, c = 60, in exact integer math.
    *
    * Scale shape: each leg is already scalable (shared BM25 index;
    * broadcast query batch); the fusion itself is one full-outer equi-join
    * of two k·|queries|-row frames + a per-query top-k window — at scale
    * the dense leg swaps to [[annLsh]]/[[annIvf]] unchanged, because RRF
    * only consumes (query_id, doc_id, rank).
    */
  def rrfFuse(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") % QueryMod === 0)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(
          graft.functions.TextFns.tokens(col("text")), 1, 5))).as("term"))
    val sparse = graft.sources.Bm25Store.serve(spark, dir, queries, FuseK)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("r_sparse"))
    val emb = Tables.embeddings(spark, dir)
    val dense = VectorOps.bruteForceTopK(emb,
        emb.where(col("vec_id") % QueryMod === 0), "vec_id", "embedding", FuseK)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("rank").cast("long").as("r_dense"))
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"1000000L div ($RrfC + r_sparse)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($RrfC + r_dense)"), lit(0L))).as("rrf_q"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_q").desc, col("doc_id"))))
      .where(col("rank") <= FuseK)
  }

  private val rrfFuseSql =
    s"""WITH sp AS (
       |  SELECT query_id, doc_id, rank
       |  FROM (${graft.operators.Bm25.topKSql("documents", QueryMod, FuseK)})
       |), de AS (
       |  SELECT query_id, cand_id AS doc_id, rank FROM (${denseTopKSql(FuseK)})
       |), fused AS (
       |  SELECT coalesce(sp.query_id, de.query_id) AS query_id,
       |         coalesce(sp.doc_id, de.doc_id) AS doc_id,
       |         (coalesce(1000000 // ($RrfC + sp.rank), 0) +
       |          coalesce(1000000 // ($RrfC + de.rank), 0))::BIGINT AS rrf_q
       |  FROM sp FULL OUTER JOIN de
       |    ON sp.query_id = de.query_id AND sp.doc_id = de.doc_id
       |)
       |SELECT query_id, doc_id, rrf_q,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_q DESC, doc_id) AS INTEGER) AS rank
       |FROM fused
       |QUALIFY rank <= $FuseK""".stripMargin

  // ---- near-dup cluster assignment (connected components) -----------------
  private val ClusterN = 4

  /** Dedup clustering: collapse the pairwise near-dup signal into CLUSTERS
    * (doc → canonical representative = min doc_id in its connected
    * component). Edges here are "docs sharing any word 4-gram", generated
    * as per-shingle STARS to the shingle's min doc (connectivity-equivalent
    * to all-pairs-within-shingle but linear in exploded rows — a hot
    * shingle shared by 10k docs yields 10k star edges, not 10k²/2 pairs);
    * components come from [[graft.operators.ConnectedComponents]].
    * This is the pass that turns every pairwise dedup operator's output
    * into an actionable keep/drop list.
    */
  /** Directed star edges "doc → min doc sharing a word 4-gram". Edges join
    * on h48(shingle), not the shingle string (the [[decontaminate]]
    * trick): ~6× less exploded data in flight, and a 2^-48-odds hash
    * collision can only MERGE two clusters — for dedup the over-grouping
    * direction is safe, and the oracle mirrors the hash so the compare
    * stays exact. The exploded frame materializes once ([[graft.core.Materialize]])
    * because both the owner aggregate and the join-back consume it —
    * unmaterialized, Catalyst re-explodes the corpus on each side.
    */
  private def shingleStarEdges(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "shingle_star_edges", dir) {
      val ex = graft.core.Materialize(MinHashLsh.explodeShingles(
          Tables.documents(spark, dir), "doc_id", "text", ClusterN)
        .select(col("id"), graft.functions.PortableHash.h48(col("shingle")).as("hs")))
      val owners = ex.groupBy("hs").agg(min(col("id")).as("owner"))
      ex.join(owners, "hs")
        .filter(col("id") =!= col("owner"))
        .select(col("id").as("src"), col("owner").as("dst")).distinct()
    }

  /** Symmetrized near-dup graph — shared by [[pagerank]] and
    * [[triangleCount]] via the [[graft.core.Shared]] memo. */
  private def shingleStarSym(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "shingle_star_sym", dir) {
      val edges = shingleStarEdges(spark, dir)
      edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }

  /** Component assignment (doc_id, component) of the shingle-star graph —
    * built once per process ([[graft.core.Shared]]); [[dedupCluster]],
    * [[dedupKeepBest]] and any other cluster consumer read the same
    * materialized frame instead of re-running the CC fixpoint. */
  private def componentFrame(spark: SparkSession, dir: String): DataFrame =
    graft.core.Shared.memo(spark, "dedup_components", dir) {
      graft.operators.ConnectedComponents.run(
        Tables.documents(spark, dir).select(col("doc_id").as("id")),
        shingleStarEdges(spark, dir),
        trace = Some("dedup_cluster"))
    }

  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val comp = componentFrame(spark, dir)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
  }

  /** Shared oracle CTE chain producing [[shingleStarEdges]] (`ed`: directed
    * a→b stars) and their symmetrization (`sym`).
    */
  private val shingleEdgeCtes: String = {
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", ClusterN)
    val h = graft.functions.PortableHash.h48Sql("sg")
    s"""sh AS (
       |  SELECT doc_id AS id, $sh AS shingles
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |  WHERE len(w) >= $ClusterN
       |), e AS (
       |  SELECT id, $h AS hs
       |  FROM (SELECT id, unnest(shingles) AS sg FROM sh)
       |), o AS (
       |  SELECT hs, min(id) AS owner FROM e GROUP BY hs
       |), ed AS (
       |  SELECT DISTINCT e.id AS a, o.owner AS b
       |  FROM e JOIN o ON e.hs = o.hs WHERE e.id <> o.owner
       |), sym AS (
       |  SELECT a, b FROM ed UNION SELECT b, a FROM ed
       |)""".stripMargin
  }

  private val dedupClusterSql = {
    s"""WITH RECURSIVE $shingleEdgeCtes, reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.v = s.b
       |), comp AS (
       |  SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v
       |)
       |SELECT c.doc_id, c.component, s.cluster_size
       |FROM comp c JOIN (
       |  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
       |) s ON c.component = s.component""".stripMargin
  }

  /** Dedup audit rollup: the cluster-size histogram of the near-dup
    * component frame — "how much of the corpus is duplicated, at what
    * multiplicity" is the ONE number reviewed before a dedup pass ships,
    * and the histogram is where a broken shingle hash shows up as a
    * single giant component. Consumes the memoized [[componentFrame]]
    * (derive once, audit + act from the same frame); two count shuffles
    * over component-sized data, output is max-multiplicity rows.
    */
  def clusterSizeHist(spark: SparkSession, dir: String): DataFrame =
    componentFrame(spark, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))

  private val clusterSizeHistSql =
    s"""WITH RECURSIVE $shingleEdgeCtes, reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.v = s.b
       |), comp AS (
       |  SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v
       |), sz AS (
       |  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
       |)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM sz GROUP BY cluster_size""".stripMargin

  /** Per-source near-duplication rate — the datasheet row a corpus review
    * reads per ingestion source ("which feeds are mostly mirrors"): for
    * each source, the share of its docs that sit in a near-dup cluster of
    * size > 1 (basis points). Consumes the memoized [[componentFrame]]
    * (the audit and the dedup act on the SAME materialized assignment);
    * one join to the ≤|components| size table + one ≤|sources| rollup.
    */
  def dedupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val comp = componentFrame(spark, dir)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("csize"))
    val flagged = comp.join(sizes, "component")
      .select(col("id").as("doc_id"), (col("csize") > 1).as("is_dup"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(flagged, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_bp", expr("(10000 * n_dup) div n_docs"))
  }

  private val dedupRateBySourceSql =
    s"""WITH RECURSIVE $shingleEdgeCtes, reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.v = s.b
       |), comp AS (
       |  SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v
       |), sz AS (
       |  SELECT component, count(*) AS csize FROM comp GROUP BY component
       |), f AS (
       |  SELECT c.doc_id, (s.csize > 1) AS is_dup
       |  FROM comp c JOIN sz s ON c.component = s.component
       |)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN f.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST((10000 * sum(CASE WHEN f.is_dup THEN 1 ELSE 0 END)) // count(*)
       |    AS BIGINT) AS dup_bp
       |FROM documents d JOIN f ON d.doc_id = f.doc_id
       |GROUP BY d.source""".stripMargin

  // ---- sorted-neighborhood blocking ---------------------------------------
  /** Sorted-neighborhood entity-resolution blocking — the third candidate
    * recipe alongside LSH banding ([[MinHashLsh]]) and PPJoin prefix
    * filtering ([[graft.operators.SetSimJoin]]): sort the corpus by a
    * normalized signature (first 12 lowercased tokens), slide a fixed
    * window of W=8 over the GLOBAL sort order, and exact-verify only pairs
    * inside the window (`levenshtein(sig) <= 4`). Candidate volume is
    * EXACTLY n·W — linear by construction, no df caps or banding tuning
    * needed — at the cost of recall limited to what the sort key
    * co-locates (the classic Hernández–Stolfo trade, the reason it
    * complements rather than replaces the other two recipes).
    *
    * The global rank is NOT a single global-order window (one reducer owns
    * everything at 100 TB) but the [[TextAnalysis.docOffsets]] two-pass
    * shape: range-partition by (sig, doc_id) → per-partition `row_number`
    * (each task ranks only its slice) + a partition-count-sized base-offset
    * table broadcast back. Windowed pairing is an equi-join on
    * `(rk-1) div W` blocks with the right side exploded into its own and
    * its predecessor block — every in-window pair shares a join key in
    * exactly one of the two copies, so the candidate join is shuffle-
    * bounded and never quadratic. The oracle replays the same total order
    * with a plain `row_number() OVER (ORDER BY sig, doc_id)` — rank parity
    * needs only the shared total order, which (sig, doc_id) makes
    * unambiguous.
    */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Materialize
    import graft.functions.TextFns
    val W = 8
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(concat_ws(" ",
        slice(TextFns.tokens(coalesce(col("text"), lit(""))), 1, 12))).as("sig"))
    val parts = Materialize(
      sig.repartitionByRange(col("sig"), col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val base = parts.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("base"))
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("sig"), col("doc_id"))
    val ranked = parts
      .withColumn("local", row_number().over(wLocal).cast("long"))
      .join(broadcast(base), "pid")
      .select(col("doc_id"), col("sig"), (col("local") + col("base")).as("rk"))
      .withColumn("blk", expr(s"(rk - 1) div $W"))
    val lhs = ranked.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("rk").as("ra"), col("blk"))
    val rhs = ranked.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("rk").as("rb"), explode(array(col("blk"), col("blk") - 1)).as("blk"))
    // The n·W verification pairs dominate the query's CPU, so the exact
    // distance check is staged: a codegen'd length prefilter first
    // (|len_a − len_b| ≤ 4 is NECESSARY for edit distance ≤ 4 — each
    // edit changes length by at most 1), then Spark's BANDED 3-arg
    // levenshtein, which walks only the ±4 diagonal band and early-exits
    // (returns −1 iff the distance exceeds the threshold — exactly the
    // pairs the 2-arg form would have discarded, so the result set is
    // identical and the oracle keeps plain `levenshtein(...) <= 4`).
    lhs.join(rhs, "blk")
      .where(col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= W)
      .where(abs(length(col("sig_a")) - length(col("sig_b"))) <= 4)
      .withColumn("dist", expr("CAST(levenshtein(sig_a, sig_b, 4) AS BIGINT)"))
      .where(col("dist") >= 0L)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  private val sortedNeighborhoodSql =
    s"""WITH t AS (
       |  SELECT doc_id, lower(array_to_string(
       |    (${graft.functions.TextFns.tokensSql("coalesce(text, '')")})[1:12],
       |    ' ')) AS sig
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, sig,
       |    row_number() OVER (ORDER BY sig, doc_id) AS rk FROM t
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS dist
       |FROM r a JOIN r b ON b.rk BETWEEN a.rk + 1 AND a.rk + 8
       |WHERE levenshtein(a.sig, b.sig) <= 4""".stripMargin

  /** Newman modularity of the LANGUAGE partition over the near-dup shingle
    * graph: Q = Σ_c [e_c/m − (d_c/2m)²] — "do near-dup edges stay within
    * one language?" A healthy corpus scores near 1 (cross-language
    * near-dups are rare); a slide toward 0 means boilerplate/templating is
    * bridging languages, the signal that triggers a per-language dedup
    * review. Exact integer form: Q·4m² = 4m·Σe_c − Σd_c², reported as
    * `q_milli` by truncating div (the [[linregTrend]]-verified Spark `div`
    * ≡ DuckDB `//` semantics). Cost: the memoized edge frames
    * ([[shingleStarEdges]]/[[shingleStarSym]]) plus two bounded aggregates
    * (per-vertex degrees → per-language sums) and three 1-row broadcasts —
    * nothing here scales worse than the graph build itself.
    */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val lang = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val ed = shingleStarEdges(spark, dir)
      .join(lang.select(col("doc_id").as("src"), col("lang").as("la")), "src")
      .join(lang.select(col("doc_id").as("dst"), col("lang").as("lb")), "dst")
    val mi = ed.agg(count(lit(1)).as("m"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("intra_edges"))
    val d2 = shingleStarSym(spark, dir)
      .groupBy(col("src")).agg(count(lit(1)).as("d"))
      .join(lang.select(col("doc_id").as("src"), col("lang")), "src")
      .groupBy(col("lang")).agg(sum(col("d")).as("dc"))
      .agg(sum(col("dc") * col("dc")).as("sum_d2"))
    // the Q·4m² products are lifted to decimal(38,0)/HUGEINT BEFORE
    // multiplying: 64-bit 4·m·m overflows at m > ~1.5e9 edges (and the
    // numerator 4·m·intra has the same exposure), which would contradict
    // the "nothing here scales worse than the graph build" framing
    mi.crossJoin(broadcast(d2))
      .select(col("m"), col("intra_edges"), col("sum_d2"),
        expr("(1000 * (4 * CAST(m AS DECIMAL(38,0)) * intra_edges" +
          " - CAST(sum_d2 AS DECIMAL(38,0))))" +
          " div (4 * CAST(m AS DECIMAL(38,0)) * m)")
          .cast("long").as("q_milli"))
  }

  private val graphModularitySql =
    s"""WITH $shingleEdgeCtes, lg AS (
       |  SELECT doc_id, lang FROM documents
       |), mi AS (
       |  SELECT count(*) AS m,
       |    sum(CASE WHEN la.lang = lb.lang THEN 1 ELSE 0 END) AS intra
       |  FROM ed JOIN lg la ON ed.a = la.doc_id JOIN lg lb ON ed.b = lb.doc_id
       |), dg AS (
       |  SELECT s.a AS v, count(*) AS d FROM sym s GROUP BY s.a
       |), dc AS (
       |  SELECT lg.lang, sum(d) AS dcs FROM dg JOIN lg ON dg.v = lg.doc_id
       |  GROUP BY lg.lang
       |), d2 AS (
       |  SELECT sum(dcs * dcs) AS sum_d2 FROM dc
       |)
       |SELECT CAST(m AS BIGINT) AS m, CAST(intra AS BIGINT) AS intra_edges,
       |  CAST(sum_d2 AS BIGINT) AS sum_d2,
       |  CAST((1000 * (4 * m::HUGEINT * intra - sum_d2::HUGEINT))
       |    // (4 * m::HUGEINT * m) AS BIGINT) AS q_milli
       |FROM mi, d2""".stripMargin

  /** Quantile band filter: keep documents whose length sits inside the
    * per-language interquartile band — the "drop the trash and the
    * outliers" gate every corpus pipeline runs before training. The
    * quartiles are EXACT discrete percentiles via the integer rank pick
    * (`ceil(q·n/100)` in pure integer math, the [[Analytics.percentilesExact]]
    * device): one sort-window pass per language computes both bounds, the
    * tiny bounds table broadcasts back, and the filter is a map-only scan.
    * No float percentile interpolation exists anywhere, so both engines
    * select identical band edges.
    */
  def qualityBandFilter(spark: SparkSession, dir: String): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val w = byLang.orderBy(col("n_chars"), col("doc_id"))
    val ranked = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byLang))
    def pick(q: Int) = max(when(
      col("rn") === expr(s"(n * $q + 99) div 100"), col("n_chars")))
    val bounds = ranked.groupBy(col("lang"))
      .agg(pick(25).as("lo"), pick(75).as("hi"))
    Tables.documents(spark, dir)
      .join(broadcast(bounds), "lang")
      .where(col("n_chars").between(col("lo"), col("hi")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("total_chars"))
  }

  private val qualityBandSql =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |b AS (
      |  SELECT lang,
      |    max(CASE WHEN rn = (n * 25 + 99) // 100 THEN n_chars END) AS lo,
      |    max(CASE WHEN rn = (n * 75 + 99) // 100 THEN n_chars END) AS hi
      |  FROM ranked GROUP BY lang)
      |SELECT d.lang, count(*) AS kept,
      |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars
      |FROM documents d JOIN b USING (lang)
      |WHERE d.n_chars BETWEEN b.lo AND b.hi
      |GROUP BY d.lang""".stripMargin

  /** Keep-best selection over the near-dup clusters: per connected
    * component, retain the LONGEST member (n_chars desc, doc_id tiebreak) —
    * what a production pipeline actually does after clustering (keep the
    * most complete copy, not the smallest id). One extra shuffle on the
    * component key over [[dedupCluster]]'s output; the rank window's
    * per-group state is one row. Singleton clusters pass through
    * unchanged, so the result is exactly one kept doc per component.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    dedupCluster(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        "doc_id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("component"), col("doc_id").as("kept_doc"),
        col("n_chars"), col("cluster_size"))
  }

  private val dedupKeepBestSql = {
    s"""WITH RECURSIVE $shingleEdgeCtes, reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.v = s.b
       |), comp AS (
       |  SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v
       |)
       |SELECT component, doc_id AS kept_doc, n_chars, cluster_size FROM (
       |  SELECT c.component, c.doc_id, d.n_chars, s.cluster_size,
       |    row_number() OVER (PARTITION BY c.component
       |      ORDER BY d.n_chars DESC, c.doc_id) AS rk
       |  FROM comp c
       |  JOIN documents d USING (doc_id)
       |  JOIN (SELECT component, count(*) AS cluster_size
       |        FROM comp GROUP BY component) s USING (component))
       |WHERE rk = 1""".stripMargin
  }

  // ---- PageRank over the near-dup graph -----------------------------------
  private val PrIters = 3

  /** Integer PageRank ([[graft.operators.PageRank]]) over the symmetrized
    * shingle-star graph — centrality in the duplication graph surfaces the
    * "canonical" documents of each near-dup neighborhood (the doc sharing
    * material with the most others ranks highest).
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.run(
      Tables.documents(spark, dir).select(col("doc_id").as("id")),
      shingleStarSym(spark, dir), PrIters, trace = Some("pagerank"))
      .select(col("id").as("doc_id"), col("rank"))

  private val pagerankSql = {
    val scale = graft.operators.PageRank.Scale
    val base = 15L * scale / 100L
    val rounds = (0 until PrIters).map { t =>
      s"""c$t AS (
         |  SELECT s.b AS dst, sum(r.rank // d.deg)::BIGINT AS s
         |  FROM sym s JOIN deg d ON s.a = d.a JOIN r$t r ON r.id = s.a
         |  GROUP BY 1
         |), r${t + 1} AS (
         |  SELECT n.doc_id AS id,
         |    ($base + (coalesce(c.s, 0) * 85) // 100)::BIGINT AS rank
         |  FROM documents n LEFT JOIN c$t c ON c.dst = n.doc_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $shingleEdgeCtes, deg AS (
       |  SELECT a, count(*) AS deg FROM sym GROUP BY 1
       |), r0 AS (
       |  SELECT doc_id AS id, $scale::BIGINT AS rank FROM documents
       |),
       |$rounds
       |SELECT id AS doc_id, rank FROM r$PrIters""".stripMargin
  }

  /** Personalized PageRank from the seed subset (every 10th doc — the
    * `label_prop` seeding convention): proximity-to-trusted-docs in the
    * near-dup graph, the "expand a curated set" primitive. Non-seed docs
    * with high PPR share material (directly or transitively) with the
    * curated set. Output keeps only ranked docs (rank > 0 — reachable
    * from a seed) to stay reviewable.
    */
  def pprSeeded(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id").as("id"))
    graft.operators.PageRank.personalized(
      docs, docs.where(col("id") % 10 === 0),
      shingleStarSym(spark, dir), PrIters, trace = Some("ppr_seeded"))
      .where(col("rank") > 0)
      .select(col("id").as("doc_id"), col("rank"))
  }

  private val pprSeededSql = {
    val scale = graft.operators.PageRank.Scale
    val base = 15L * scale / 100L
    val rounds = (0 until PrIters).map { t =>
      s"""c$t AS (
         |  SELECT s.b AS dst, sum(r.rank // d.deg)::BIGINT AS s
         |  FROM sym s JOIN deg d ON s.a = d.a JOIN r$t r ON r.id = s.a
         |  GROUP BY 1
         |), r${t + 1} AS (
         |  SELECT n.doc_id AS id,
         |    (CASE WHEN n.doc_id % 10 = 0 THEN $base ELSE 0 END
         |     + (coalesce(c.s, 0) * 85) // 100)::BIGINT AS rank
         |  FROM documents n LEFT JOIN c$t c ON c.dst = n.doc_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $shingleEdgeCtes, deg AS (
       |  SELECT a, count(*) AS deg FROM sym GROUP BY 1
       |), r0 AS (
       |  SELECT doc_id AS id,
       |    (CASE WHEN doc_id % 10 = 0 THEN $scale ELSE 0 END)::BIGINT AS rank
       |  FROM documents
       |),
       |$rounds
       |SELECT id AS doc_id, rank FROM r$PrIters WHERE rank > 0""".stripMargin
  }

  // ---- triangle participation in the near-dup graph -----------------------
  /** Per-doc triangle counts over the symmetrized shingle-star graph
    * ([[graft.operators.TriangleCount]] — degree-ordered wedge join).
    * Triangle participation separates "hub of many unrelated pairs" from
    * "member of a mutually-similar clique" — the signal that grades how
    * cohesive a near-dup neighborhood is.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TriangleCount.perNode(shingleStarSym(spark, dir))
      .select(col("id").as("doc_id"), col("n_triangles"))

  // The oracle enumerates by plain id order (a<b<c) — a DIFFERENT
  // enumeration than the engine's degree order, same triangle set.
  private val triangleCountSql =
    s"""WITH $shingleEdgeCtes, d AS (
       |  SELECT a, b FROM sym WHERE a < b
       |), tri AS (
       |  SELECT x.a, x.b, y.b AS c
       |  FROM d x JOIN d y ON y.a = x.b
       |  JOIN d z ON z.a = x.a AND z.b = y.b
       |)
       |SELECT n AS doc_id, count(*) AS n_triangles
       |FROM (SELECT unnest([a, b, c]) AS n FROM tri) GROUP BY 1""".stripMargin

  /** Per-node local clustering coefficient of the near-dup graph
    * ([[graft.operators.TriangleCount.clusteringCoeff]]) — how clique-like
    * each document's near-dup neighborhood is (cc ≈ 1 → a tight
    * template-duplicate cluster; cc ≈ 0 → a hub stitching unrelated
    * docs). Exact integer output (tri, wedges, permille ratio), reusing
    * the degree-ordered triangle machinery and the SAME shared graph
    * frame as `pagerank`/`triangle_count`, so the bench attributes the
    * graph build once.
    */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TriangleCount.clusteringCoeff(shingleStarSym(spark, dir))

  private val clusteringCoeffSql =
    s"""WITH $shingleEdgeCtes, deg AS (
       |  SELECT a AS id, count(*) AS deg FROM sym GROUP BY a
       |), d AS (
       |  SELECT a, b FROM sym WHERE a < b
       |), tri AS (
       |  SELECT x.a, x.b, y.b AS c
       |  FROM d x JOIN d y ON y.a = x.b
       |  JOIN d z ON z.a = x.a AND z.b = y.b
       |), tcnt AS (
       |  SELECT n AS id, count(*) AS t
       |  FROM (SELECT unnest([a, b, c]) AS n FROM tri) GROUP BY 1
       |)
       |SELECT deg.id AS doc_id,
       |  CAST(coalesce(t, 0) AS BIGINT) AS n_triangles,
       |  CAST((deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges,
       |  CAST((2000 * coalesce(t, 0)) // (deg * (deg - 1)) AS BIGINT) AS cc_permille
       |FROM deg LEFT JOIN tcnt ON tcnt.id = deg.id
       |WHERE deg >= 2""".stripMargin

  // ---- multimodal: binary payload → mapPartitions feature extraction ------
  /** Opaque binary payloads featurized per partition (see [[Multimodal]]).
    * The oracle recomputes the stub's byte math from `text` — valid because
    * this corpus is pure ASCII (bytes == codepoints); the engine side works
    * on real bytes and handles arbitrary binary.
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, dir))).toDF()

  private val multimodalSql =
    """WITH b AS (
      |  SELECT doc_id, source, octet_length(encode(text)) AS n_bytes,
      |    list_sum(list_transform(range(1, len(text) + 1),
      |      i -> ascii(substr(text, i, 1))))::BIGINT AS sum_bytes
      |  FROM documents
      |)
      |SELECT doc_id, source, n_bytes,
      |  64 + n_bytes % 577 AS width, 64 + sum_bytes % 479 AS height, sum_bytes
      |FROM b""".stripMargin

  /** REAL container decode end-to-end: per document a small synthetic P6
    * PPM image is serialized (dimensions derived from doc_id, pixel bytes
    * the closed-form pattern `(doc_id + i) mod 251`), then
    * [[Multimodal.decodePpm]] parses the binary back — magic, comment
    * line, dimensions, maxval, raster walk — and emits header fields plus
    * exact per-channel sums. The oracle never sees the container: it
    * recomputes the expected stats straight from the generative formula,
    * so a parser bug (off-by-one in the header, channel interleave swap)
    * fails the compare. Encode and decode both run inside one
    * mapPartitions pass — payload bytes never leave the executors.
    */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        (id, Multimodal.encodePpm(id, w, h))
      })
    Multimodal.decodeImages(media).toDF()
  }

  private val imageDecodeSql =
    """WITH g AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
      |)
      |SELECT doc_id, w AS width, h AS height, 255::BIGINT AS maxval,
      |  list_sum(list_transform(range(w * h), p -> (doc_id + 3 * p) % 251))::BIGINT AS sum_r,
      |  list_sum(list_transform(range(w * h), p -> (doc_id + 3 * p + 1) % 251))::BIGINT AS sum_g,
      |  list_sum(list_transform(range(w * h), p -> (doc_id + 3 * p + 2) % 251))::BIGINT AS sum_b
      |FROM g""".stripMargin

  /** Audio modality, same proof shape as [[imageDecode]]: per document a
    * canonical RIFF/WAVE file (PCM16, mono or stereo, with a junk LIST
    * chunk so the parser must iterate chunks) is serialized then parsed
    * back by [[Multimodal.decodeWav]] — magic, chunk walk, fmt fields,
    * sign-extended sample stats. Oracle recomputes from the generative
    * sample formula; byte-order or sign-extension bugs fail the compare.
    */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeWav(id, nSamples = 100 + (id % 400).toInt,
          sampleRate = 8000 + ((id % 3) * 4000).toInt,
          channels = 1 + (id % 2).toInt))
      })
    Multimodal.decodeAudio(media).toDF()
  }

  private val audioDecodeSql =
    """WITH g AS (
      |  SELECT doc_id, 100 + doc_id % 400 AS ns,
      |    8000 + (doc_id % 3) * 4000 AS rate, 1 + doc_id % 2 AS ch
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, ns, rate, ch,
      |    list_transform(range(ns * ch),
      |      i -> (doc_id + 7 * i) % 65536 - 32768) AS smp
      |  FROM g
      |)
      |SELECT doc_id, ch AS channels, rate AS sample_rate, 16::BIGINT AS bits,
      |  ns AS n_samples, list_sum(smp)::BIGINT AS sum_samples,
      |  list_max(list_transform(smp, x -> abs(x)))::BIGINT AS max_abs
      |FROM s""".stripMargin

  /** Video modality: a raw multi-frame container (concatenated P6 frames,
    * frame f seeded doc_id·7 + f) decoded to PER-FRAME rows by chained
    * image parses — the distributed frame-extraction shape: each payload
    * fans out to its frames inside mapPartitions, output is flat columns,
    * nothing touches the driver.
    */
  def videoDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeVideo(id * 7, frames = 1 + (id % 3).toInt,
          w = 3 + (id % 4).toInt, h = 2 + (id % 3).toInt))
      })
    Multimodal.decodeVideos(media).toDF()
  }

  private val videoDecodeSql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 3 AS nf, 3 + doc_id % 4 AS w,
      |    2 + doc_id % 3 AS h
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, w, h, unnest(range(nf)) AS frame_idx FROM g
      |)
      |SELECT doc_id, frame_idx, w AS width, h AS height,
      |  list_sum(list_transform(range(w * h),
      |    p -> (doc_id * 7 + frame_idx + 3 * p) % 251))::BIGINT AS sum_r,
      |  list_sum(list_transform(range(w * h),
      |    p -> (doc_id * 7 + frame_idx + 3 * p + 1) % 251))::BIGINT AS sum_g,
      |  list_sum(list_transform(range(w * h),
      |    p -> (doc_id * 7 + frame_idx + 3 * p + 2) % 251))::BIGINT AS sum_b
      |FROM f""".stripMargin

  /** Frame sampling: each media row expands to a controlled number of frame
    * rows (video → frames). Pure column fan-out via explode(sequence) — the
    * pattern that keeps frame extraction distributed instead of per-driver.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val nBytes = length(encode(col("text"), "UTF-8"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), nBytes.as("n_bytes"))
      .withColumn("n_frames", col("n_bytes") % 4 + 1)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_key",
        substring(md5(concat_ws(":", col("doc_id"), col("frame_idx"))), 1, 8))
  }

  private val frameSampleSql =
    """WITH f AS (
      |  SELECT doc_id,
      |    unnest(range(octet_length(encode(text)) % 4 + 1)) AS frame_idx
      |  FROM documents
      |)
      |SELECT doc_id, frame_idx,
      |  substr(md5(doc_id::VARCHAR || ':' || frame_idx::VARCHAR), 1, 8) AS frame_key
      |FROM f""".stripMargin

  // ---- gram / covariance matrix -------------------------------------------
  /** Quantization scale for the gram pass: 1e-4 per-component resolution
    * keeps xi·xj ≤ 10^8, so the int64 accumulator survives ~9·10^10 rows —
    * a deliberately COARSER grid than [[graft.operators.VectorOps.Scale]]
    * (1e6), whose 10^12 products would overflow a global sum beyond ~10^6
    * rows. Statistics tolerate 1e-4 rounding; per-pair cosine doesn't.
    */
  private val GramScale = 10000L

  /** Distributed gram matrix Gᵀ·G over the embedding corpus — the
    * covariance/PCA building block. The scale-critical shape: NO join.
    * Each row explodes to its own d² component products in-stage (two
    * nested generators, narrow), and Catalyst's partial HashAggregate
    * folds them map-side to the d(d+1)/2 upper-triangle cells before the
    * only shuffle — which carries d² rows per partition, independent of
    * corpus size. The naive alternative (self-join of (vec_id, dim, x) on
    * vec_id) shuffles the full n·d expansion; this plan ships 2080 cells.
    * Components quantize to ints ([[GramScale]]) so the sums are exact and
    * order-free — the DuckDB twin (lateral range × range) is bit-identical.
    */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * GramScale).cast("long"))
    Tables.embeddings(spark, dir)
      .select(q.as("q"))
      .select(posexplode(col("q")).as(Seq("i", "xi")), col("q"))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(sum(col("xi") * col("xj")).as("s"))
  }

  private val gramMatrixSql =
    s"""WITH q AS (
       |  SELECT list_transform(embedding,
       |           x -> floor(x::DOUBLE * $GramScale)::BIGINT) AS qv
       |  FROM embeddings
       |)
       |SELECT i, j, CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS s
       |FROM q, range(0, 64) AS t1(i), range(0, 64) AS t2(j)
       |WHERE j >= i
       |GROUP BY i, j""".stripMargin

  // ---- top principal component --------------------------------------------
  private val PcaRounds = 10

  /** Top principal direction of the embedding corpus by power iteration on
    * the [[gramMatrix]] — the PCA primitive. The distributed work is the
    * gram pass (linear in corpus size, one d²-row shuffle); the iteration
    * itself runs driver-side on the collected d×d matrix — 4160 longs,
    * the same bounded-driver-state contract as k-means centroids. All
    * iteration arithmetic is integer fixed-point: the gram is normalized
    * to Q30 by its max |entry| (exact via BigInt/HUGEINT cross-multiply),
    * the vector renormalized to Q20 by max |component| each round, so
    * products stay ≤ 2^56 and the DuckDB oracle — ten mechanically
    * generated CTE rounds of the same multiply-normalize — reproduces
    * every bit. Sign is deterministic too: iteration starts from the
    * all-ones vector, so no eigenvector sign ambiguity exists to flake
    * on. 10 rounds is the attested contract, not "until converged" —
    * accuracy vs a double-precision replay is spec-pinned (cos ≥ 0.999).
    */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val d = 64
    val G = Array.ofDim[Long](d, d)
    gramMatrix(spark, dir).collect().foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      G(i)(j) = s; G(j)(i) = s
    }
    val maxG = G.map(_.map(math.abs).max).max
    val Gn = G.map(_.map(v => ((BigInt(v) << 30) / maxG).toLong))
    var v = Array.fill(d)(1L << 20)
    (1 to PcaRounds).foreach { _ =>
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => Gn(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(x => ((BigInt(x) << 20) / mx).toLong)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toSeq
      .toDF("dim", "loading_q20")
  }

  private val pcaPowerSql = {
    // AS MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    // each round references its w-CTE twice — un-materialized, the whole
    // 10-round chain re-inlines exponentially (2^10 copies of the gram
    // scan) and the oracle runs for minutes instead of milliseconds
    val rounds = (1 to PcaRounds).map { k =>
      val prev = if (k == 1) "v0" else s"n${k - 1}"
      s"""w$k AS MATERIALIZED (
         |  SELECT g.i AS i, CAST(sum(g.g * v.v) AS BIGINT) AS w
         |  FROM gn g JOIN $prev v ON g.j = v.i GROUP BY g.i
         |), n$k AS MATERIALIZED (
         |  SELECT i, CAST((w::HUGEINT * 1048576) // (SELECT max(abs(w)) FROM w$k)
         |       AS BIGINT) AS v
         |  FROM w$k
         |)"""
    }.mkString(", ")
    s"""WITH q AS (
       |  SELECT list_transform(embedding,
       |           x -> floor(x::DOUBLE * $GramScale)::BIGINT) AS qv
       |  FROM embeddings
       |), gram AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS s
       |  FROM q, range(0, 64) AS t1(i), range(0, 64) AS t2(j)
       |  WHERE j >= i GROUP BY i, j
       |), full_g AS MATERIALIZED (
       |  SELECT i, j, s FROM gram
       |  UNION ALL SELECT j AS i, i AS j, s FROM gram WHERE i <> j
       |), mg AS (
       |  SELECT max(abs(s)) AS m FROM full_g
       |), gn AS MATERIALIZED (
       |  SELECT i, j, CAST((s::HUGEINT * 1073741824) // m AS BIGINT) AS g
       |  FROM full_g, mg
       |), v0 AS (
       |  SELECT i, 1048576::BIGINT AS v FROM range(0, 64) t(i)
       |), $rounds
       |SELECT i AS dim, v AS loading_q20 FROM n$PcaRounds""".stripMargin
  }

  // ---- per-label embedding-space profile ----------------------------------
  /** [[Extras]]' table_profile, extended to vector columns: per (label,
    * dimension) count / mean / variance in exact integer fixed-point —
    * the QA readout run on every new embedding drop before anything joins
    * or classifies against it (a shifted per-dim mean between drops =
    * embedding-version skew, the vector analog of schema drift). Same
    * monoid shape as [[Analytics.linregTrend]]: one partial-aggregated
    * groupBy over (label, dim) moment sums, map-side combined; output is
    * labels × dims rows regardless of corpus size. mean is Q4 (the
    * [[GramScale]] grid), variance Q8; both exact integer divisions.
    */
  def embedProfile(spark: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * GramScale).cast("long"))
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(q).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("label"), col("dim"), col("n"),
        expr("sx div n").as("mean_q4"),
        expr("(n * sxx - sx * sx) div (n * n)").as("var_q8"))
  }

  private val embedProfileSql =
    s"""WITH q AS (
       |  SELECT label, list_transform(embedding,
       |           x -> floor(x::DOUBLE * $GramScale)::BIGINT) AS qv
       |  FROM embeddings
       |), e AS (
       |  SELECT label, i AS dim, qv[i + 1] AS x
       |  FROM q, range(0, 64) AS t(i)
       |), m AS (
       |  SELECT label, dim, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |         CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM e GROUP BY label, dim
       |)
       |SELECT label, dim, n, CAST(sx // n AS BIGINT) AS mean_q4,
       |  CAST((n * sxx - sx * sx) // (n * n) AS BIGINT) AS var_q8
       |FROM m""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("gram_matrix", gramMatrix, Some(gramMatrixSql)),
    QueryDef("pca_power", pcaPower, Some(pcaPowerSql)),
    QueryDef("embed_profile", embedProfile, Some(embedProfileSql)),
    QueryDef("dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("dedup_minhash_lsh", dedupMinhashLsh, Some(dedupMinhashSql)),
    QueryDef("dedup_simhash", dedupSimhash, Some(dedupSimhashSql)),
    QueryDef("ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    QueryDef("embed_neardup", embedNearDup, Some(embedNearDupSql)),
    QueryDef("ann_topk", annTopK, Some(annTopKSql)),
    QueryDef("knn_classify", knnClassify, Some(knnClassifySql)),
    QueryDef("label_separation", labelSeparation, Some(labelSeparationSql)),
    QueryDef("ann_lsh", annLsh, Some(annLshSql)),
    QueryDef("ann_ivf", annIvf, Some(annIvfSql)),
    QueryDef("ann_pq", annPq, Some(annPqSql)),
    QueryDef("ann_ivfpq", annIvfPq, Some(annIvfPqSql)),
    QueryDef("hard_negatives", hardNegatives, Some(hardNegativesSql)),
    QueryDef("span_dedup", spanDedup, Some(spanDedupSql)),
    QueryDef("containment_pairs", containmentPairs, Some(containmentPairsSql)),
    QueryDef("tfidf_pairs", tfidfPairs, Some(tfidfPairsSql)),
    QueryDef("rank_normalize", rankNormalize, Some(rankNormalizeSql)),
    QueryDef("rendezvous_route", rendezvousRoute, Some(rendezvousRouteSql)),
    QueryDef("dedup_cluster", dedupCluster, Some(dedupClusterSql)),
    QueryDef("cluster_size_hist", clusterSizeHist, Some(clusterSizeHistSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("quality_band_filter", qualityBandFilter, Some(qualityBandSql)),
    QueryDef("pagerank", pagerank, Some(pagerankSql)),
    QueryDef("triangle_count", triangleCount, Some(triangleCountSql)),
    QueryDef("clustering_coeff", clusteringCoeff, Some(clusteringCoeffSql)),
    QueryDef("bm25_topk", bm25TopK, Some(bm25TopKSql)),
    QueryDef("bm25_index_build", bm25IndexBuild, Some(bm25IndexBuildSql)),
    QueryDef("kmeans_cluster", kmeansCluster, Some(kmeansClusterSql)),
    QueryDef("vocab_encode", vocabEncode, Some(vocabEncodeSql)),
    QueryDef("ppr_seeded", pprSeeded, Some(pprSeededSql)),
    QueryDef("lsh_recall_audit", lshRecallAudit, Some(lshRecallAuditSql)),
    QueryDef("simhash_recall_audit", simhashRecallAudit, Some(simhashRecallAuditSql)),
    QueryDef("ann_recall_audit", annRecallAudit, Some(annRecallAuditSql)),
    QueryDef("dim_truncation_audit", dimTruncationAudit,
      Some(dimTruncationAuditSql)),
    QueryDef("dedup_threshold_sweep", dedupThresholdSweep,
      Some(dedupThresholdSweepSql)),
    QueryDef("minhash_est_audit", minhashEstAudit, Some(minhashEstAuditSql)),
    QueryDef("rrf_fuse", rrfFuse, Some(rrfFuseSql)),
    QueryDef("dedup_rate_by_source", dedupRateBySource, Some(dedupRateBySourceSql)),
    QueryDef("sorted_neighborhood", sortedNeighborhood, Some(sortedNeighborhoodSql)),
    QueryDef("graph_modularity", graphModularity, Some(graphModularitySql)),
    QueryDef("mmr_rerank", mmrRerank, Some(mmrRerankSql)),
    QueryDef("diverse_sample", diverseSample, Some(diverseSampleSql)),
    QueryDef("cluster_sample", clusterSample, Some(clusterSampleSql)),
    QueryDef("kmeans_silhouette", kmeansSilhouette, Some(kmeansSilhouetteSql)),
    QueryDef("semantic_dedup", semanticDedup, Some(semanticDedupSql)),
    QueryDef("domain_mix", domainMix, Some(domainMixSql)),
    QueryDef("split_assign", splitAssign, Some(splitAssignSql)),
    QueryDef("shard_pack", shardPack, Some(shardPackSql)),
    QueryDef("stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("weighted_sample", weightedSample, Some(weightedSampleSql)),
    QueryDef("decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("dup_span_extent", dupSpanExtent, Some(dupSpanExtentSql)),
    QueryDef("ingest_dedup", ingestDedup, Some(ingestDedupSql)),
    QueryDef("multimodal_features", multimodalFeatures, Some(multimodalSql)),
    QueryDef("image_decode", imageDecode, Some(imageDecodeSql)),
    QueryDef("audio_decode", audioDecode, Some(audioDecodeSql)),
    QueryDef("video_decode", videoDecode, Some(videoDecodeSql)),
    QueryDef("frame_sample", frameSample, Some(frameSampleSql)),
  )
}
