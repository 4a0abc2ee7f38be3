package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PortableHash
import graft.operators.{SimHash, VectorOps}

/** Pipeline-shaped composites: multi-stage queries that CHAIN existing
  * catalog components end-to-end, rather than adding another leaf metric.
  * Each stage reuses the exact machinery of its standalone component
  * (same constants, same helper code paths), so the composite is an
  * integration proof: the pieces agree when wired together, and the
  * DuckDB twin replays the whole chain.
  *
  * Reference framing: the closest reference shape is a JobControl DAG of
  * chained MapReduce jobs (reference `src/mapred/.../jobcontrol/JobControl.java`)
  * — here the chain is ONE declarative plan, so Catalyst sees across
  * stage boundaries (shared scans, pruned columns) instead of
  * re-materializing between jobs.
  */
object Composites extends QueryModule {

  // ---- staged curation funnel ---------------------------------------------

  /** End-to-end curation funnel: ingest → Gopher-rule admission →
    * exact dedup → SimHash near-dedup → token-budget shard packing, with
    * a per-stage census (docs, tokens, shards) as the readout — the
    * datasheet a corpus build publishes: how much survived each gate and
    * what got packed.
    *
    * Stage reuse: admission = [[CurationOps.gopherDocStats]] +
    * [[CurationOps.gopherAdmit]] (the gopher_rules constants); exact
    * dedup = the dedup_exact content key (min-id canonical per key);
    * near-dedup = the MEMOIZED [[LlmPipeline.simhashFingerprints]] frame
    * restricted to the exact-dedup survivors BEFORE banding (cheaper than
    * pairing the full corpus, and identical: Hamming distance is
    * per-pair), dropping the larger id of every near pair; packing =
    * [[LlmPipeline.packShards]] on the survivors.
    *
    * Scale: one map-only stats pass + one content-key window for stages
    * 0–3 (flags as columns, census = ONE conditional-sum rollup); the
    * near-pair join is banded (never all-pairs); packing is the
    * bucket-partitioned window of shard_pack. The two `.collect()`s are
    * 1-row aggregate rows (the bounded class).
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wCk = Window.partitionBy(col("content_key"))
    val staged0 = CurationOps.gopherDocStats(Tables.documents(spark, dir))
      .withColumn("pass1", CurationOps.gopherAdmit)
      .withColumn("cid", min(when(col("pass1"), col("doc_id"))).over(wCk))
      .withColumn("pass2", col("pass1") && col("doc_id") === col("cid"))
    val s2ids = staged0.where(col("pass2")).select(col("doc_id").as("id"))
    val drops = SimHash.nearPairs(
        LlmPipeline.simhashFingerprints(spark, dir).join(s2ids, "id"))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("dropped", lit(1))
    val staged = staged0.join(drops, Seq("doc_id"), "left")
      .withColumn("pass3", col("pass2") && col("dropped").isNull)
    def d(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L)), lit(0L))
    def t(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, col("n_tok"))), lit(0L))
    val cen = staged.agg(
      count(lit(1)).as("d0"), coalesce(sum(col("n_tok")), lit(0L)).as("t0"),
      d(col("pass1")).as("d1"), t(col("pass1")).as("t1"),
      d(col("pass2")).as("d2"), t(col("pass2")).as("t2"),
      d(col("pass3")).as("d3"), t(col("pass3")).as("t3"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val pk = LlmPipeline.packShards(
      staged.where(col("pass3"))
        .select(col("doc_id"), col("n_tok").as("n_tokens")))
    val shards = pk
      .agg(countDistinct(struct(col("bucket"), col("shard"))).as("s"),
        count(lit(1)).as("nd"), coalesce(sum(col("n_tokens")), lit(0L)).as("nt"))
      .as[(Long, Long, Long)].head()
    Seq(
      (0L, "ingest", cen._1, cen._2, 0L),
      (1L, "admitted", cen._3, cen._4, 0L),
      (2L, "exact_dedup", cen._5, cen._6, 0L),
      (3L, "near_dedup", cen._7, cen._8, 0L),
      (4L, "packed", shards._2, shards._3, shards._1))
      .toDF("stage", "stage_name", "n_docs", "n_tokens", "n_shards")
  }

  /** The funnel's shared CTE chain (ingest stats → admission → exact
    * dedup → near dedup → packing) — factored so the resumable funnel's
    * oracle replays the IDENTICAL stage semantics (the two queries must
    * agree row-for-row on their overlapping stages by construction).
    */
  private def funnelCtesSql: String = {
    val simFull = SimHash.nearPairsSql("documents", "doc_id", "text")
    s"""d AS MATERIALIZED (
       |  ${CurationOps.gopherDocStatsSql("documents")}
       |), f AS MATERIALIZED (
       |  SELECT *, ${CurationOps.gopherAdmitSql} AS pass1 FROM d
       |), c AS (
       |  SELECT *, min(CASE WHEN pass1 THEN doc_id END)
       |    OVER (PARTITION BY content_key) AS cid
       |  FROM f
       |), s2 AS MATERIALIZED (
       |  SELECT * FROM c WHERE pass1 AND doc_id = cid
       |), sp AS (
       |  SELECT doc_a, doc_b FROM ($simFull)
       |), drops AS (
       |  SELECT DISTINCT p.doc_b AS doc_id FROM sp p
       |  JOIN s2 a ON a.doc_id = p.doc_a
       |  JOIN s2 b ON b.doc_id = p.doc_b
       |), s3 AS MATERIALIZED (
       |  SELECT s2.* FROM s2 LEFT JOIN drops dr ON s2.doc_id = dr.doc_id
       |  WHERE dr.doc_id IS NULL
       |), pk AS MATERIALIZED (
       |  ${LlmPipeline.packShardsSql("(SELECT doc_id, n_tok AS n_tokens FROM s3)")}
       |)""".stripMargin
  }

  private def funnelCenRowSql(stage: Int, name: String, from: String,
                              tok: String) =
    s"""SELECT ${stage}::BIGINT AS stage, '$name' AS stage_name,
       |  count(*)::BIGINT AS n_docs,
       |  CAST(coalesce(sum($tok), 0) AS BIGINT) AS n_tokens,
       |  0::BIGINT AS n_shards
       |FROM $from""".stripMargin

  private val curationFunnelSql = {
    val cenRow = funnelCenRowSql _
    s"""WITH $funnelCtesSql
       |${cenRow(0, "ingest", "d", "n_tok")}
       |UNION ALL
       |${cenRow(1, "admitted", "f WHERE pass1", "n_tok")}
       |UNION ALL
       |${cenRow(2, "exact_dedup", "s2", "n_tok")}
       |UNION ALL
       |${cenRow(3, "near_dedup", "s3", "n_tok")}
       |UNION ALL
       |SELECT 4::BIGINT AS stage, 'packed' AS stage_name,
       |  count(*)::BIGINT AS n_docs,
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens,
       |  (SELECT count(*) FROM (SELECT DISTINCT bucket, shard FROM pk))::BIGINT
       |    AS n_shards
       |FROM pk""".stripMargin
  }

  // ---- resumable funnel (stage-committed, kill-and-resume) ----------------

  /** Bump when any stage's SEMANTICS change: the artifact root carries
    * this version, so edited stage logic can never be served from a
    * stale committed artifact built by the old logic.
    */
  private val RfVersion = 1

  /** The curation funnel re-run as a RESUMABLE pipeline: the same
    * admission → exact-dedup → near-dedup → packing chain, but each
    * stage boundary is committed through
    * [[graft.operators.StageCommit]] (the reference's
    * FileOutputCommitter two-phase promote, elevated to pipeline level —
    * write the stage artifact, THEN drop the `_COMMITTED` marker). A
    * re-run serves committed stages from their stored frames and
    * recomputes only uncommitted ones, so a crash at stage k loses only
    * stage k's work; a half-written uncommitted artifact is trampled by
    * the overwrite. The RESUMABILITY CONTRACT is that the readout is
    * byte-identical whether the run was interrupted-and-resumed or ran
    * straight through — which is exactly what lets one DuckDB oracle
    * attest every execution history ([[ResumableFunnelSpec]] kills the
    * pipeline mid-chain and pins resumed ≡ from-scratch, committed
    * stages not rebuilt, junk uncommitted data ignored).
    *
    * Stage semantics are pinned to curation_funnel's (the spec also
    * asserts the overlapping census rows agree with the standalone
    * funnel row-for-row); the oracle replays [[funnelCtesSql]] — the
    * SAME factored CTE chain curation_funnel's oracle uses.
    *
    * Scale: identical per-stage shuffle shape to curation_funnel, plus
    * one parquet write+read per boundary — the MR-style durability trade
    * (SURVEY §4), bought ONLY at the four explicit stage boundaries
    * instead of at every operator the way the reference materializes
    * every job. At 100 TB the artifacts land on the durable FS and a
    * 10-hour funnel survives a driver loss at hour 9.
    */
  def resumableFunnel(spark: SparkSession, dir: String): DataFrame =
    resumableFunnelAt(spark, dir, java.nio.file.Paths.get(
      graft.core.Scratch.dir(s"resumable_funnel_v$RfVersion", dir),
      // corpus fingerprint in the root: a regenerated corpus at the same
      // path rebuilds under a new root instead of serving stale stages
      graft.operators.StageCommit.corpusFingerprint(dir, "documents.parquet"))
      .toString)

  /** Spec hook: explicit stage root + crash injection (`crashAfter` =
    * throw once that many stages have committed — the kill half of the
    * kill-and-resume spec).
    */
  private[catalog] def resumableFunnelAt(spark: SparkSession, dir: String,
      root: String, crashAfter: Int = Int.MaxValue): DataFrame = {
    import graft.operators.StageCommit
    def gate(n: Int): Unit =
      if (n >= crashAfter)
        throw new IllegalStateException(s"injected crash after stage $n")
    val wCk = Window.partitionBy(col("content_key"))
    val s1 = StageCommit.stage(spark, root, "admitted") {
      CurationOps.gopherDocStats(Tables.documents(spark, dir))
        .withColumn("pass1", CurationOps.gopherAdmit)
        .where(col("pass1"))
        .select(col("doc_id"), col("content_key"), col("n_tok"))
    }
    gate(1)
    val s2 = StageCommit.stage(spark, root, "exact_dedup") {
      s1.withColumn("cid", min(col("doc_id")).over(wCk))
        .where(col("doc_id") === col("cid"))
        .select(col("doc_id"), col("n_tok"))
    }
    gate(2)
    val s3 = StageCommit.stage(spark, root, "near_dedup") {
      val ids = s2.select(col("doc_id").as("id"))
      val drops = SimHash.nearPairs(
          LlmPipeline.simhashFingerprints(spark, dir).join(ids, "id"))
        .select(col("doc_b").as("doc_id")).distinct()
      s2.join(drops, Seq("doc_id"), "left_anti")
    }
    gate(3)
    val s4 = StageCommit.stage(spark, root, "packed") {
      LlmPipeline.packShards(
        s3.select(col("doc_id"), col("n_tok").as("n_tokens")))
    }
    gate(4)
    // census over the COMMITTED artifacts — the readout attests the
    // stored bytes every downstream consumer would read, not an
    // in-memory recomputation
    def cen(stage: Long, name: String, f: DataFrame) =
      f.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"), lit(0L).as("n_shards"))
    cen(1, "admitted", s1)
      .unionByName(cen(2, "exact_dedup", s2))
      .unionByName(cen(3, "near_dedup", s3))
      .unionByName(s4.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
          countDistinct(struct(col("bucket"), col("shard"))).as("n_shards"))
        .select(lit(4L).as("stage"), lit("packed").as("stage_name"),
          col("n_docs"), col("n_tokens"), col("n_shards")))
  }

  private val resumableFunnelSql = {
    val cenRow = funnelCenRowSql _
    s"""WITH $funnelCtesSql
       |${cenRow(1, "admitted", "f WHERE pass1", "n_tok")}
       |UNION ALL
       |${cenRow(2, "exact_dedup", "s2", "n_tok")}
       |UNION ALL
       |${cenRow(3, "near_dedup", "s3", "n_tok")}
       |UNION ALL
       |SELECT 4::BIGINT AS stage, 'packed' AS stage_name,
       |  count(*)::BIGINT AS n_docs,
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens,
       |  (SELECT count(*) FROM (SELECT DISTINCT bucket, shard FROM pk))::BIGINT
       |    AS n_shards
       |FROM pk""".stripMargin
  }

  // ---- multi-round active-learning loop -----------------------------------

  private val AlSeedBudget = 10L
  private val AlRounds = 3
  private val AlBatch = 8
  private val AlK = 3
  private val AlDim = 64

  /** Pool-based active-learning acquisition loop over the embedding
    * corpus: start from a FIXED-budget seed of labeled vectors
    * ([[VectorOps.auditSample]] — the same bounded-batch contract as
    * label_noise_audit), then for [[AlRounds]] rounds score every
    * unlabeled pool vector by its [[AlK]]-NN vote margin against the
    * CURRENT labeled set (the label_noise_audit vote machinery with the
    * roles flipped: the labeled set is the tiny broadcast side, the pool
    * stays distributed), acquire the [[AlBatch]] lowest-margin (most
    * uncertain) vectors with their true labels, and fold them into the
    * labeled set for the next round.
    *
    * Readout per round: labeled-set size entering the round, acquisition
    * count, how many acquisitions the current labeled set would have
    * mislabeled (`acq_vote_err` — the "was the acquisition informative"
    * signal), and the summed vote margin (uncertainty mass) — all exact
    * integers.
    *
    * Scale: per round ONE map-only pass over the pool — the bounded
    * labeled roster (≤ seed + rounds·batch rows) enters the plan as a
    * literal array and each pool vector computes its top-[[AlK]] vote
    * locally (array HOFs over ≤roster-length arrays; no pair shuffle,
    * no window) — then a distributed `TakeOrdered` for the batch cut
    * (orderBy+limit — no global sort materialized). Driver-side state is
    * the labeled ROSTER (bounded as above) and the ≤[[AlBatch]]-row
    * acquisition — the bradley_terry bounded-collect class. The DuckDB
    * twin unrolls the identical [[AlRounds]] rounds as a CTE chain.
    */
  def activeLearningLoop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // each side's integer squared norm is computed ONCE and carried
    // (the VectorOps.cosineQN hoist): the pair loop then does one dot
    // per (pool, labeled) pair instead of three — the exact sums are
    // unchanged, so the float tail (sqrt·sqrt, divide, round) is
    // bit-identical to the oracle's per-pair norm recompute
    // memoized + persisted: every round's acquisition pass would
    // otherwise re-scan parquet and re-quantize — the frame is
    // (vec_id, label, 64-long qv, nq), small enough to pin columnar
    val emb = graft.core.Shared.memo(spark, "al_emb_q", dir, persist = true) {
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label"),
          VectorOps.quantize(col("embedding")).as("qv"))
        .withColumn("nq", expr("dot_q(qv, qv)"))
    }
    var labeled: Seq[(Long, Int, Seq[Long], Long)] =
      VectorOps.auditSample(emb, "vec_id", AlSeedBudget)
        .select(col("vec_id"), col("label"), col("qv"), col("nq"))
        .as[(Long, Int, Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    // each round is ONE map-only pass + a TakeOrdered: the labeled roster
    // (bounded: ≤ seed + rounds·batch rows) rides into the plan as a
    // literal array and every pool row computes its own top-[[AlK]] vote
    // locally with array HOFs — the former crossJoin → rank-window →
    // vote-groupBy → majority-window chain shuffled |pool|·|labeled|
    // scored rows per round and replayed its subtree twice (top1/top2
    // legs). Exact same integers: the struct sort key (-s_u, l_id)
    // replays the (s_u DESC, l_id ASC) rank order, the vote sort
    // (-v, l_label) the (v DESC, l_label ASC) majority order, and the
    // per-element dot/norm arithmetic is the identical expression tree.
    // The acquisition collect carries (qv, nq) so the fold-in needs no
    // second job; still the bradley_terry ≤AlBatch-row bounded class.
    val stats = (1 to AlRounds).map { r =>
      val nLabeled = labeled.size.toLong
      val lIds = labeled.map(_._1)
      val pool = emb.join(broadcast(lIds.toDF("vec_id")),
        Seq("vec_id"), "left_anti")
      val top = expr(
        s"""slice(array_sort(transform(lab, l -> struct(
           |  -CAST(round(1000000e0 * (CAST(dot_q(qv, l._3) AS DOUBLE)
           |    / (sqrt(CAST(nq AS DOUBLE))
           |    * sqrt(CAST(l._4 AS DOUBLE))))) AS BIGINT) AS ns,
           |  l._1 AS l_id, l._2 AS l_label))), 1, $AlK)""".stripMargin)
      val acqDf = pool
        .withColumn("lab", typedLit(labeled))
        .withColumn("top", top)
        .withColumn("cnts", expr(
          "array_sort(transform(array_distinct(transform(top, x -> x.l_label)), " +
            "lb -> struct(-size(filter(top, x -> x.l_label = lb)) AS nv, lb AS lb)))"))
        .select(col("vec_id"), col("label"),
          expr("element_at(cnts, 1).lb").as("maj_label"),
          expr("CAST(-element_at(cnts, 1).nv AS BIGINT)" +
            " - IF(size(cnts) > 1, CAST(-element_at(cnts, 2).nv AS BIGINT), 0L)")
            .as("margin"),
          col("qv"), col("nq"))
        .orderBy(col("margin").asc, col("vec_id").asc)
        .limit(AlBatch)
      val acquired =
        acqDf.as[(Long, Int, Int, Long, Seq[Long], Long)].collect().toSeq // ≤ AlBatch rows
      // the loop's returned frame is a LocalTableScan, so the round body
      // (where the former pair shuffle lived) is only auditable through
      // the per-round capture — the Bfs/PageRank convention
      graft.core.PlanTrace.capture(acqDf, s"active_learning_loop_round$r")
      labeled = labeled ++
        acquired.map(a => (a._1, a._2, a._5, a._6)).sortBy(_._1)
      (r.toLong, nLabeled, acquired.size.toLong,
        acquired.count(a => a._3 != a._2).toLong,
        acquired.map(_._4).sum)
    }
    stats.toDF("round", "n_labeled", "n_acquired", "acq_vote_err",
      "sum_margin")
  }

  private val activeLearningLoopSql = {
    val cos = VectorOps.cosineQSql("p.qv", "l.qv", AlDim)
    val sU = s"CAST(round(1000000e0 * ($cos)) AS BIGINT)"
    def roundCtes(r: Int): String = {
      val prev = s"l${r - 1}"
      s"""p$r AS (
         |  SELECT e.* FROM e LEFT JOIN $prev lb ON e.vec_id = lb.vec_id
         |  WHERE lb.vec_id IS NULL
         |), sc$r AS (
         |  SELECT p.vec_id, p.label, l.vec_id AS l_id, l.label AS l_label,
         |    $sU AS s_u
         |  FROM p$r p CROSS JOIN $prev l
         |), v$r AS (
         |  SELECT vec_id, label, l_label, count(*)::BIGINT AS v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY s_u DESC, l_id) AS rk
         |    FROM sc$r)
         |  WHERE rk <= $AlK
         |  GROUP BY vec_id, label, l_label
         |), t$r AS MATERIALIZED (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY v DESC, l_label) AS vr
         |  FROM v$r
         |), a$r AS MATERIALIZED (
         |  SELECT o.vec_id, o.label, o.l_label AS maj_label,
         |    o.v - coalesce(w.v, 0) AS margin
         |  FROM (SELECT * FROM t$r WHERE vr = 1) o
         |  LEFT JOIN (SELECT * FROM t$r WHERE vr = 2) w ON o.vec_id = w.vec_id
         |  ORDER BY margin, o.vec_id LIMIT $AlBatch
         |), l$r AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT e.vec_id, e.label, e.qv FROM e
         |  JOIN a$r a ON e.vec_id = a.vec_id
         |)""".stripMargin
    }
    val rounds = (1 to AlRounds).map(roundCtes).mkString(", ")
    val stats = (1 to AlRounds).map { r =>
      s"""SELECT ${r}::BIGINT AS round,
         |  (SELECT count(*) FROM l${r - 1})::BIGINT AS n_labeled,
         |  (SELECT count(*) FROM a$r)::BIGINT AS n_acquired,
         |  CAST((SELECT coalesce(sum(CASE WHEN maj_label <> label
         |    THEN 1 ELSE 0 END), 0) FROM a$r) AS BIGINT) AS acq_vote_err,
         |  CAST((SELECT coalesce(sum(margin), 0) FROM a$r) AS BIGINT)
         |    AS sum_margin""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, label, ${VectorOps.quantizeSql("embedding")} AS qv
       |  FROM embeddings
       |), l0 AS MATERIALIZED (
       |  SELECT vec_id, label, qv FROM e
       |  WHERE vec_id % ${VectorOps.auditSampleModSql("embeddings", AlSeedBudget)} = 0
       |), $rounds
       |$stats""".stripMargin
  }

  // ---- split-hygiene pipeline ---------------------------------------------

  private val ShFolds = 5L

  /** Train/eval split hygiene, end to end: decontaminate → deterministic
    * k-fold split → cross-fold leakage census. The eval set is the
    * decontaminate convention (`doc_id % 97 == 0`); train docs sharing
    * any word 8-gram hash with it are REMOVED (the exact
    * [[LlmPipeline.decontamHits]] frame the standalone census counts —
    * fold −1 in the readout); clean docs land in fold
    * `h48(doc_id) % [[ShFolds]]` (map-only, content-stable, the
    * stratified_kfold portability contract without the label
    * stratification documents don't have); then the leakage audit: a
    * dedup_exact content key present in ≥ 2 folds means the same text
    * trains in one fold and validates in another — per fold, the count
    * of docs carrying such a key.
    *
    * Scale: the decontamination pass is scan + broadcast probe (the
    * decontaminate shape); the fold assignment is map-only; the leakage
    * census is one content-key aggregate + one key-equi-join — nothing
    * pairwise. Output: one row per fold (−1 = removed), docs / tokens /
    * leaky-doc counts, all exact integers.
    */
  def splitHygienePipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hits = LlmPipeline.decontamHits(docs).withColumn("hit", lit(1))
    // materialized: narrow (no text) but derived by the corpus
    // tokenize+md5+decontam probe, and BOTH the leaky-key census and the
    // final fold rollup consume it — each reference re-ran that pass
    val base = graft.core.Materialize(docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("content_key"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("fold",
        when(col("hit").isNotNull, lit(-1L))
          .otherwise(graft.functions.PortableHash.h48(
            col("doc_id").cast("string")) % ShFolds)))
    val leakyKeys = base.where(col("fold") >= 0)
      .groupBy(col("content_key"))
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") >= 2)
      .select(col("content_key"), lit(1).as("leaky"))
    base.join(leakyKeys, Seq("content_key"), "left")
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("leaky").isNotNull && col("fold") >= 0, 1L)
          .otherwise(0L)).as("n_leaky_docs"))
  }

  private val splitHygienePipelineSql = {
    val wtok = graft.functions.TextFns.tokensSql("text")
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR")
    s"""WITH ${LlmPipeline.decontamHitsCtes}, base AS MATERIALIZED (
       |  SELECT doc_id, len($wtok)::BIGINT AS n_tokens,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |      AS content_key,
       |    CASE WHEN doc_id IN (SELECT doc_id FROM hits) THEN -1::BIGINT
       |         ELSE ($h) % $ShFolds END AS fold
       |  FROM documents WHERE doc_id % 97 <> 0
       |), kf AS (
       |  SELECT content_key FROM (
       |    SELECT content_key, count(DISTINCT fold) AS nf
       |    FROM base WHERE fold >= 0 GROUP BY content_key)
       |  WHERE nf >= 2
       |)
       |SELECT fold, count(*)::BIGINT AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN fold >= 0 AND content_key IN
       |    (SELECT content_key FROM kf) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_leaky_docs
       |FROM base GROUP BY fold""".stripMargin
  }

  // ---- token-budget mixture pipeline --------------------------------------

  /** Budget → allocation → selection → packing, end to end: the mixture
    * side of a corpus build as one chain. [[MixtureOps.waterfillBudget]]
    * (consumed AS-IS — the composite calls the standalone component)
    * allocates half the corpus's token mass across sources at the water
    * level; each source then KEEPS its hash-ranked doc prefix up to its
    * allocation (rank by (h48(doc_id), doc_id) within source — the
    * stratified_sample determinism contract: the kept set is a pure
    * function of content keys, reproducible across runs and engines);
    * the kept docs go through [[LlmPipeline.packShards]]. Readout per
    * source: supply, alloc, picked docs/tokens, and how many distinct
    * shards the source's docs landed in.
    *
    * Scale: the allocation is sources-bounded (broadcast); selection is
    * one per-source running-sum window (a giant source serializes its
    * own partition — the deployment variant sub-buckets each source with
    * per-bucket sub-allocations, exactly the shard_pack trade); packing
    * and census are the shard_pack shapes. picked_tokens ≤ alloc ≤
    * supply by construction — the spec pins it.
    */
  def tokenBudgetPipeline(spark: SparkSession, dir: String): DataFrame = {
    // materialized: |sources| rows, but each reference re-runs the
    // waterfill's own corpus tokenize (two consumers: selection gate,
    // final readout join)
    val alloc = graft.core.Materialize(MixtureOps.waterfillBudget(spark, dir)
      .select(col("source"), col("supply"), col("alloc")))
    val h = graft.functions.PortableHash.h48(col("doc_id").cast("string"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialized: consumed by the packer AND the census join — each
    // reference would re-run the corpus tokenize + per-source window
    val picked = graft.core.Materialize(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        h.as("h"))
      .withColumn("cum", sum(col("n_tokens")).over(wSrc))
      .join(broadcast(alloc.select(col("source"), col("alloc"))), "source")
      .where(col("cum") <= col("alloc"))
      .select(col("doc_id"), col("source"), col("n_tokens")))
    val pk = LlmPipeline.packShards(
      picked.select(col("doc_id"), col("n_tokens")))
    val cen = pk.join(picked.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_picked"),
        sum(col("n_tokens")).as("picked_tokens"),
        countDistinct(struct(col("bucket"), col("shard")))
          .as("n_shards_touched"))
    alloc.join(cen, Seq("source"), "left")
      .select(col("source"), col("supply"), col("alloc"),
        coalesce(col("n_picked"), lit(0L)).as("n_picked"),
        coalesce(col("picked_tokens"), lit(0L)).as("picked_tokens"),
        coalesce(col("n_shards_touched"), lit(0L)).as("n_shards_touched"))
  }

  private val tokenBudgetPipelineSql = {
    val wtok = graft.functions.TextFns.tokensSql("text")
    val h = graft.functions.PortableHash.h48Sql("doc_id::VARCHAR")
    s"""WITH al AS MATERIALIZED (
       |  SELECT source, supply, alloc
       |  FROM (${MixtureOps.waterfillBudgetSql})
       |), d AS (
       |  SELECT doc_id, source, len($wtok)::BIGINT AS n_tokens, $h AS h
       |  FROM documents
       |), cm AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY source
       |    ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d
       |), p AS MATERIALIZED (
       |  SELECT cm.doc_id, cm.source, cm.n_tokens
       |  FROM cm JOIN al ON cm.source = al.source
       |  WHERE cm.cum <= al.alloc
       |), pk AS (
       |  ${LlmPipeline.packShardsSql("(SELECT doc_id, n_tokens FROM p)")}
       |), j AS MATERIALIZED (
       |  SELECT pk.doc_id, pk.n_tokens, pk.bucket, pk.shard, p.source
       |  FROM pk JOIN p ON pk.doc_id = p.doc_id
       |), cen AS (
       |  SELECT source, count(*)::BIGINT AS n_picked,
       |    CAST(sum(n_tokens) AS BIGINT) AS picked_tokens
       |  FROM j GROUP BY source
       |), shc AS (
       |  SELECT source, count(*)::BIGINT AS n_shards_touched
       |  FROM (SELECT DISTINCT source, bucket, shard FROM j) GROUP BY source
       |)
       |SELECT al.source, al.supply, al.alloc,
       |  CAST(coalesce(cen.n_picked, 0) AS BIGINT) AS n_picked,
       |  CAST(coalesce(cen.picked_tokens, 0) AS BIGINT) AS picked_tokens,
       |  CAST(coalesce(shc.n_shards_touched, 0) AS BIGINT) AS n_shards_touched
       |FROM al
       |LEFT JOIN cen ON al.source = cen.source
       |LEFT JOIN shc ON al.source = shc.source""".stripMargin
  }

  // ---- staged retrieval pipeline ------------------------------------------

  private val RpK1 = 20 // sparse shortlist size
  private val RpK2 = 8  // dense rerank keep
  private val RpK3 = 5  // final diversified k
  private val RpLambdaPct = 70
  private val RpDim = 64

  /** Staged retrieval serving pipeline — the narrow-as-you-go shape every
    * production retrieval stack runs, chained end-to-end:
    *
    *   1. SPARSE recall: BM25 top-[[RpK1]] shortlist per query over the
    *      STORED index ([[graft.sources.Bm25Store]]), with the exact
    *      bm25_topk query set ([[LlmPipeline.bm25Queries]]);
    *   2. DENSE precision: rerank the shortlist by exact integer-micro
    *      embedding cosine, keep top-[[RpK2]];
    *   3. DIVERSITY: greedy MMR (λ = 0.7) down to [[RpK3]] picks per
    *      query, pairwise sims computed only within each query's
    *      [[RpK2]]-candidate set (≤ K2² pairs per query, never corpus
    *      pairs).
    *
    * Cost narrows stage by stage: the corpus-sized work is stage 1's
    * index probe (shared, memoized); stages 2–3 touch only
    * |queries|·K1 rows. At 100 TB the dense leg swaps its candidate
    * source to the ANN paths unchanged (the rrf_fuse argument — stages
    * consume only (query_id, doc_id) + vectors). Readout: (query_id,
    * pick_order, doc_id, rel_u, mmr_u) — mmr_u NULL on the relevance-only
    * first pick, exact integers throughout, DuckDB twin replays all
    * three stages plus the [[RpK3]]−1 greedy rounds as a CTE chain.
    */
  def retrievalPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val shortlist = graft.sources.Bm25Store
      .serve(spark, dir, LlmPipeline.bm25Queries(docs), RpK1)
      .select(col("query_id"), col("doc_id"))
    val ev = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    def cosU(a: String, b: String) =
      expr(s"CAST(round(1000000e0 * (CAST(dot_q($a, $b) AS DOUBLE)" +
        s" / (sqrt(CAST(dot_q($a, $a) AS DOUBLE))" +
        s" * sqrt(CAST(dot_q($b, $b) AS DOUBLE))))) AS BIGINT)")
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel_u").desc, col("doc_id"))
    val rr = shortlist
      .join(ev.select(col("vec_id").as("query_id"), col("qv").as("q_qv")),
        "query_id")
      .join(ev.select(col("vec_id").as("doc_id"), col("qv").as("c_qv")),
        "doc_id")
      .select(col("query_id"), col("doc_id"), col("c_qv"),
        cosU("q_qv", "c_qv").as("rel_u"))
      .withColumn("rk", row_number().over(wRel))
      .where(col("rk") <= RpK2)
      .select(col("query_id"), col("doc_id"), col("rel_u"), col("c_qv"))
    // stage 3 runs INSIDE one grouped pass: each query's greedy state is
    // its own ≤K2-candidate set, so the K3−1 rounds are per-group local
    // compute (O(K2²·K3) integer ops) — one shuffle total, instead of
    // K3−1 chained join/window jobs whose subtrees replay earlier rounds
    import spark.implicits._
    rr.as[(Long, Long, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Seq[Long])]) =>
        mmrGreedy(qid, it.toArray)
      }
      .toDF("query_id", "doc_id", "pick_order", "rel_u", "mmr_u")
  }

  /** Per-query greedy MMR over one reranked candidate group (≤ [[RpK2]]
    * rows: doc_id, rel_u, qv). Deterministic integer math, bit-matched to
    * the unrolled oracle: pair cosines in micro units rounded HALF_UP
    * away from zero (`BigDecimal.valueOf` — the same decimal-string
    * rounding Spark's `round` applies, equivalent to DuckDB's `round`
    * since every N.5 is an exact double at this magnitude), and
    * mmr = (λ·rel − (1−λ)·maxSim) with Scala `/` — truncation toward
    * zero, the Spark `div` / DuckDB `//` contract.
    */
  private def mmrGreedy(qid: Long,
                        group: Array[(Long, Long, Long, Seq[Long])])
      : Iterator[(Long, Long, Long, Long, Option[Long])] = {
    val cands = group.map(c => (c._2, c._3, c._4.toArray))
      .sortBy(c => (-c._2, c._1)) // rel desc, doc_id asc — the p1 order
    if (cands.isEmpty) return Iterator.empty
    def cosU(a: Array[Long], b: Array[Long]): Long = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val x = 1000000e0 *
        (dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val selected = scala.collection.mutable.ArrayBuffer(0)
    val out = scala.collection.mutable.ArrayBuffer(
      (qid, cands(0)._1, 1L, cands(0)._2, Option.empty[Long]))
    var r = 2
    while (r <= RpK3 && selected.size < cands.length) {
      var bestIdx = -1
      var bestMmr = 0L
      var i = 0
      while (i < cands.length) {
        if (!selected.contains(i)) {
          var msim = Long.MinValue
          selected.foreach { s =>
            val c = cosU(cands(i)._3, cands(s)._3)
            if (c > msim) msim = c
          }
          val mmr =
            (RpLambdaPct * cands(i)._2 - (100 - RpLambdaPct) * msim) / 100
          if (bestIdx < 0 || mmr > bestMmr ||
              (mmr == bestMmr && cands(i)._1 < cands(bestIdx)._1)) {
            bestIdx = i
            bestMmr = mmr
          }
        }
        i += 1
      }
      selected += bestIdx
      out += ((qid, cands(bestIdx)._1, r.toLong, cands(bestIdx)._2,
        Some(bestMmr)))
      r += 1
    }
    out.iterator
  }

  private val retrievalPipelineSql = {
    val bm25 = graft.operators.Bm25.topKSql("documents",
      LlmPipeline.Bm25QueryMod, RpK1)
    def cosU(a: String, b: String) =
      s"CAST(round(1000000e0 * (${VectorOps.cosineQSql(a, b, RpDim)})) AS BIGINT)"
    val mu = 100 - RpLambdaPct
    val rounds = (2 to RpK3).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT query_id, doc_id, rel_u, mmr_u FROM (
         |    SELECT c.query_id, c.doc_id, c.rel_u,
         |      CAST(($RpLambdaPct * c.rel_u - $mu * m.msim) // 100 AS BIGINT)
         |        AS mmr_u,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY ($RpLambdaPct * c.rel_u - $mu * m.msim) // 100 DESC,
         |          c.doc_id) AS rk
         |    FROM (SELECT rr.* FROM rr LEFT JOIN $prev
         |            ON rr.query_id = $prev.query_id
         |            AND rr.doc_id = $prev.doc_id
         |          WHERE $prev.doc_id IS NULL) c
         |    JOIN (SELECT s.query_id, s.a, max(s.s_u) AS msim
         |          FROM sims s JOIN $prev
         |            ON $prev.query_id = s.query_id AND $prev.doc_id = s.b
         |          GROUP BY s.query_id, s.a) m
         |      ON m.query_id = c.query_id AND m.a = c.doc_id)
         |  WHERE rk = 1
         |), s$r AS (
         |  SELECT query_id, doc_id FROM $prev
         |  UNION ALL SELECT query_id, doc_id FROM p$r
         |)""".stripMargin
    }.mkString(", ")
    val branches = Seq(
      s"""SELECT query_id, doc_id, 1::BIGINT AS pick_order, rel_u,
         |  NULL::BIGINT AS mmr_u FROM p1""".stripMargin) ++
      (2 to RpK3).map(r =>
        s"SELECT query_id, doc_id, ${r}::BIGINT AS pick_order, rel_u, mmr_u" +
          s" FROM p$r")
    s"""WITH sl AS MATERIALIZED (
       |  SELECT query_id, doc_id FROM ($bm25)
       |), ev AS MATERIALIZED (
       |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv
       |  FROM embeddings
       |), rr AS MATERIALIZED (
       |  SELECT query_id, doc_id, rel_u FROM (
       |    SELECT query_id, doc_id, rel_u,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY rel_u DESC, doc_id) AS rk
       |    FROM (SELECT s.query_id, s.doc_id, ${cosU("q.qv", "c.qv")} AS rel_u
       |          FROM sl s
       |          JOIN ev q ON q.vec_id = s.query_id
       |          JOIN ev c ON c.vec_id = s.doc_id))
       |  WHERE rk <= $RpK2
       |), sims AS MATERIALIZED (
       |  SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
       |    ${cosU("xa.qv", "yb.qv")} AS s_u
       |  FROM rr x
       |  JOIN rr y ON x.query_id = y.query_id AND x.doc_id <> y.doc_id
       |  JOIN ev xa ON xa.vec_id = x.doc_id
       |  JOIN ev yb ON yb.vec_id = y.doc_id
       |), p1 AS MATERIALIZED (
       |  SELECT query_id, doc_id, rel_u FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel_u DESC, doc_id) AS rk FROM rr)
       |  WHERE rk = 1
       |), s1 AS (
       |  SELECT query_id, doc_id FROM p1
       |), $rounds
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ---- eval-protocol pipeline -----------------------------------------------

  private val EpQuota = 20L
  private val EpSeed = 29

  /** Benchmark-eval protocol, end to end: compromised-item screen →
    * per-source quota selection → deterministic metric → Poisson-bootstrap
    * CI. The eval pool is the decontaminate convention (`doc_id % 97 == 0`,
    * standing in for an external benchmark table); an eval item sharing any
    * word 8-gram hash with TRAINING data is COMPROMISED (its score is
    * memorization, not capability — [[LlmPipeline.decontamHits]] with the
    * roles flipped: there the contaminated train doc is removed, here the
    * contaminated eval item is); clean items are selected per source by the
    * factored [[LlmPipeline.quotaSample]] (the stratified_sample gate —
    * constants shared, cannot drift); the "model" is the deterministic
    * hashed-bag-of-words classifier of quality_classify
    * ([[TextAnalysis.classifierScore]], score > 0 ⇔ predicts `en`), graded
    * against the `lang` label; and the headline accuracy ships with a 90%
    * Poisson-bootstrap CI — [[EvalMetrics.bootstrapCi]]'s replicate scheme
    * (same [[EvalMetrics.BootstrapB]] = 32 replicates, same literal
    * inverse-CDF weight table, same seeded h48(b:key) draw) over the
    * selected items' correctness bits.
    *
    * Scale: the screen is the decontaminate shape (the corpus side scans
    * once and probes a broadcast of the eval pool's shingle hashes — an
    * eval set is tiny by convention); selection is the quota-gate (never a
    * global sort); everything after operates on ≤ |sources|·quota rows, so
    * the bootstrap fan-out, replicate fold, and CI rank-pick are
    * bounded-size no matter the corpus. Output: ONE row — pool census,
    * compromised count, selection size, point accuracy (micro), CI bounds.
    * All exact integers; both engines draw identical replicate weights, so
    * even the CI bounds hash-attest.
    */
  def evalProtocolPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = graft.operators.MinHashLsh
      .explodeShingles(docs, "doc_id", "text", LlmPipeline.DecontamN)
      .select(col("id"),
        graft.functions.PortableHash.h48(col("shingle")).as("hs"))
    // the eval-side shingle hashes are a pushed-filter (1/97) pass with a
    // bounded result — materialized so the broadcast build is not a second
    // full tokenize; compromised (≤ pool docs) is materialized because its
    // two consumers (clean anti-join, census) would each re-run the
    // corpus-side shingle join
    val evalHs = graft.core.Materialize(sh.filter(col("id") % 97 === 0)
      .select(col("id").as("doc_id"), col("hs")).distinct())
    val compromised = graft.core.Materialize(
      sh.filter(col("id") % 97 =!= 0)
        .join(broadcast(evalHs), "hs")
        .select(col("doc_id")).distinct())
    val pool = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val clean = pool.join(compromised, Seq("doc_id"), "left_anti")
    val sel = LlmPipeline
      .quotaSample(clean.select(col("source"), col("doc_id")), EpQuota, EpSeed)
      .join(clean, Seq("doc_id", "source"))
    // ≤ |sources|·quota rows; two consumers (bootstrap fan-out, point
    // accuracy) would each replay the screen+selection subtree
    val graded = graft.core.Materialize(sel.select(col("doc_id"),
      when((TextAnalysis.classifierScore > 0) === (col("lang") === "en"), 1L)
        .otherwise(0L).as("correct")))
    val rep = graded
      .select(col("doc_id"), col("correct"),
        explode(sequence(lit(0), lit(EvalMetrics.BootstrapB - 1))).as("b"))
      .withColumn("u", graft.functions.PortableHash.h48(concat_ws(":",
        col("b").cast("string"), col("doc_id").cast("string"))) % 1000000L)
      .withColumn("w", expr(EvalMetrics.poissonCase("u")))
    val accs = rep.groupBy(col("b"))
      .agg(sum(col("w")).as("nw"), sum(col("w") * col("correct")).as("cw"))
      .select(col("b"),
        expr("CASE WHEN nw = 0 THEN 0L ELSE (1000000 * cw) div nw END")
          .as("acc_b"))
    val loRank = math.ceil(0.05 * EvalMetrics.BootstrapB).toLong
    val hiRank = math.ceil(0.95 * EvalMetrics.BootstrapB).toLong
    val ci = accs
      .withColumn("r", row_number().over(Window.orderBy(col("acc_b"), col("b"))))
      .agg(max(when(col("r") === loRank, col("acc_b"))).as("ci_lo_micro"),
        max(when(col("r") === hiRank, col("acc_b"))).as("ci_hi_micro"),
        count(lit(1)).as("n_replicates"))
    val pt = graded.agg(count(lit(1)).as("n_selected"),
        sum(col("correct")).as("n_correct"))
      .withColumn("acc_micro", expr(
        "CASE WHEN n_selected = 0 THEN 0L" +
          " ELSE (1000000 * n_correct) div n_selected END"))
    pool.agg(count(lit(1)).as("n_eval_pool"))
      .crossJoin(broadcast(compromised
        .agg(count(lit(1)).as("n_compromised"))))
      .crossJoin(broadcast(pt))
      .crossJoin(broadcast(ci))
      .select(col("n_eval_pool"), col("n_compromised"), col("n_selected"),
        col("n_correct"), col("acc_micro"), col("ci_lo_micro"),
        col("ci_hi_micro"), col("n_replicates"))
  }

  private val evalProtocolPipelineSql = {
    val wtok = graft.functions.TextFns.tokensSql("text")
    val shl = graft.functions.TextFns.shinglesSql("w", LlmPipeline.DecontamN)
    val hsh = graft.functions.PortableHash.h48Sql("sg")
    val hbd = graft.functions.PortableHash.h48Sql(
      "CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    val loRank = math.ceil(0.05 * EvalMetrics.BootstrapB).toLong
    val hiRank = math.ceil(0.95 * EvalMetrics.BootstrapB).toLong
    s"""WITH t AS (
       |  SELECT doc_id, $wtok AS w FROM documents
       |), e AS (
       |  SELECT doc_id, $hsh AS hs
       |  FROM (SELECT doc_id, unnest(sh) AS sg FROM
       |    (SELECT doc_id, $shl AS sh FROM t))
       |), comp AS MATERIALIZED (
       |  SELECT DISTINCT ev.doc_id
       |  FROM (SELECT DISTINCT doc_id, hs FROM e WHERE doc_id % 97 = 0) ev
       |  JOIN e tr ON ev.hs = tr.hs AND tr.doc_id % 97 <> 0
       |), pool AS MATERIALIZED (
       |  SELECT doc_id, source, lang, text FROM documents
       |  WHERE doc_id % 97 = 0
       |), clean AS MATERIALIZED (
       |  SELECT * FROM pool
       |  WHERE doc_id NOT IN (SELECT doc_id FROM comp)
       |), sel AS (
       |  ${LlmPipeline.quotaSampleSql("clean", EpQuota, EpSeed)}
       |), graded AS MATERIALIZED (
       |  SELECT c.doc_id,
       |    CASE WHEN ((${TextAnalysis.classifierScoreSql}) > 0)
       |              = (lang = 'en') THEN 1 ELSE 0 END AS correct
       |  FROM sel s JOIN clean c ON s.doc_id = c.doc_id
       |), rep AS (
       |  SELECT doc_id, correct, b, $hbd % 1000000 AS u
       |  FROM graded CROSS JOIN range(0, ${EvalMetrics.BootstrapB}) AS tb(b)
       |), wt AS (
       |  SELECT b, correct, ${EvalMetrics.poissonCaseSql("u")} AS w FROM rep
       |), accs AS (
       |  SELECT b, CAST(CASE WHEN sum(w) = 0 THEN 0
       |    ELSE (1000000 * sum(w::HUGEINT * correct)) // sum(w) END
       |    AS BIGINT) AS acc_b
       |  FROM wt GROUP BY b
       |), r AS (
       |  SELECT b, acc_b, row_number() OVER (ORDER BY acc_b, b) AS r
       |  FROM accs
       |), ci AS (
       |  SELECT
       |    max(CASE WHEN r = $loRank THEN acc_b END) AS ci_lo_micro,
       |    max(CASE WHEN r = $hiRank THEN acc_b END) AS ci_hi_micro,
       |    count(*) AS n_replicates
       |  FROM r
       |), pt AS (
       |  SELECT count(*)::BIGINT AS n_selected,
       |    CAST(coalesce(sum(correct), 0) AS BIGINT) AS n_correct,
       |    CAST(CASE WHEN count(*) = 0 THEN 0
       |      ELSE (1000000 * coalesce(sum(correct), 0)) // count(*) END
       |      AS BIGINT) AS acc_micro
       |  FROM graded
       |)
       |SELECT (SELECT count(*) FROM pool)::BIGINT AS n_eval_pool,
       |  (SELECT count(*) FROM comp)::BIGINT AS n_compromised,
       |  pt.n_selected, pt.n_correct, pt.acc_micro,
       |  CAST(ci.ci_lo_micro AS BIGINT) AS ci_lo_micro,
       |  CAST(ci.ci_hi_micro AS BIGINT) AS ci_hi_micro,
       |  CAST(ci.n_replicates AS BIGINT) AS n_replicates
       |FROM pt CROSS JOIN ci""".stripMargin
  }

  // ---- ANN index refresh ----------------------------------------------------

  private val ArDeltaMod = 11
  private val ArBudget = 10L

  /** ANN index refresh, end to end: corpus snapshot → delta arrival →
    * assign-without-retrain → serve the merged index → recall audit. The
    * delta (`vec_id % ArDeltaMod == 0`, ~9% of vectors, standing in for a
    * day's new embeddings) is folded into the IVF index by ASSIGNING it to
    * the centroids trained on the base snapshot — never retraining the
    * codebook — which is the only index-maintenance shape that works at
    * 100 TB (a rebuild re-clusters the whole corpus for a 1% delta; an
    * assign is one broadcast argmax over just the new rows). The audit
    * then serves a fixed [[VectorOps.auditSample]] query batch from the
    * MERGED index ([[LlmPipeline]]'s ann_ivf geometry: same
    * [[LlmPipeline.IvfCentroidMod]]/[[LlmPipeline.IvfNProbe]]/
    * [[LlmPipeline.LshK]] constants) and scores recall against the exact
    * brute-force top-k over base ∪ delta — the number that decides when
    * drift has degraded the stale codebook enough to pay for retraining.
    *
    * Scale: centroid training set and codebook are broadcast-sized by the
    * centroidMod rule; assignment is map-side (no shuffle of the scored
    * frame — the ivfTopK argmax shape); the audit legs are
    * budget-bounded. Single-row readout, all exact integers.
    */
  def annIndexRefresh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val baseCent = emb.where(col("vec_id") % ArDeltaMod =!= 0)
    val queries = VectorOps.auditSample(emb, "vec_id", ArBudget)
    val ivf = VectorOps.ivfTopK(emb, queries, "vec_id", "embedding",
        LlmPipeline.IvfCentroidMod, LlmPipeline.IvfNProbe, LlmPipeline.LshK,
        centroids = Some(baseCent
          .where(col("vec_id") % LlmPipeline.IvfCentroidMod === 1)))
      .select(col("query_id"), col("cand_id"))
    // materialized (≤ budget·k rows): two consumers (hit join + census)
    // would each re-run the queries×corpus brute-force leg
    val exact = graft.core.Materialize(VectorOps
      .bruteForceTopK(emb, queries, "vec_id", "embedding", LlmPipeline.LshK)
      .select(col("query_id"), col("cand_id")))
    val hits = ivf.join(exact, Seq("query_id", "cand_id"))
    emb.agg(sum(when(col("vec_id") % ArDeltaMod =!= 0, 1L).otherwise(0L))
          .as("n_base"),
        sum(when(col("vec_id") % ArDeltaMod === 0, 1L).otherwise(0L))
          .as("n_delta"),
        sum(when(col("vec_id") % ArDeltaMod =!= 0 &&
          col("vec_id") % LlmPipeline.IvfCentroidMod === 1, 1L)
          .otherwise(0L)).as("nlist"))
      .crossJoin(broadcast(exact
        .agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_base"), col("n_delta"), col("nlist"), col("n_queries"),
        col("n_exact"), col("n_hits"),
        expr("CASE WHEN n_exact = 0 THEN 0L " +
          "ELSE (1000 * n_hits) div n_exact END").cast("long")
          .as("recall_permille"))
  }

  private val annIndexRefreshSql = {
    val mod = VectorOps.auditSampleModSql("embeddings", ArBudget)
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", LlmPipeline.Dim)
    val centWhere =
      s"id % $ArDeltaMod <> 0 AND id % ${LlmPipeline.IvfCentroidMod} = 1"
    val ivfSql = VectorOps.ivfTopKSql("embeddings", "vec_id", "embedding",
      centWhere, LlmPipeline.IvfNProbe, LlmPipeline.LshK, LlmPipeline.Dim,
      mod)
    val exactSql =
      s"""WITH v AS (
         |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv
         |  FROM embeddings
         |), q AS (
         |  SELECT vec_id AS query_id, qv AS qq FROM v
         |  WHERE vec_id % ($mod) = 0
         |), scored AS (
         |  SELECT q.query_id, v.vec_id AS cand_id, round($cos, 6) AS score
         |  FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id
         |)
         |SELECT query_id, cand_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
         |FROM scored
         |QUALIFY rank <= ${LlmPipeline.LshK}""".stripMargin
    s"""WITH ex AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM ($exactSql)
       |), iv AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM ($ivfSql)
       |), h AS (
       |  SELECT count(*) AS n_hits FROM iv JOIN ex
       |    ON iv.query_id = ex.query_id AND iv.cand_id = ex.cand_id
       |), cen AS (
       |  SELECT
       |    CAST(sum(CASE WHEN vec_id % $ArDeltaMod <> 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_base,
       |    CAST(sum(CASE WHEN vec_id % $ArDeltaMod = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_delta,
       |    CAST(sum(CASE WHEN vec_id % $ArDeltaMod <> 0
       |      AND vec_id % ${LlmPipeline.IvfCentroidMod} = 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS nlist
       |  FROM embeddings
       |)
       |SELECT cen.n_base, cen.n_delta, cen.nlist,
       |  CAST((SELECT count(DISTINCT query_id) FROM ex) AS BIGINT)
       |    AS n_queries,
       |  CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
       |  CAST(h.n_hits AS BIGINT) AS n_hits,
       |  CAST(CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 0
       |    ELSE (1000 * h.n_hits) // (SELECT count(*) FROM ex) END AS BIGINT)
       |    AS recall_permille
       |FROM cen CROSS JOIN h""".stripMargin
  }

  // ---- media-curation pipeline ----------------------------------------------

  private val McMeanLo = 100000L
  private val McMeanHi = 150000L
  private val McMinPixels = 20L

  /** Multimodal curation, end to end: media generation → REAL container
    * decode → quality gate on decoded features → byte-budget shard
    * packing, with a per-stage census — the image-side twin of
    * [[curationFunnel]] (there the gate reads text stats, here it reads
    * pixels). Media is the image_decode convention (one binary P6 PPM per
    * document, [[graft.operators.Multimodal.encodePpm]] — same size
    * constants, so the decode stage IS the standalone component's pass);
    * the gate drops images that are too small (< [[McMinPixels]] pixels)
    * or whose mean pixel value in milli falls outside
    * [[[McMeanLo]], [[McMeanHi]]] (the over/under-exposure screen — at
    * these raster sizes the deterministic pattern's wrap makes both
    * cuts bite); survivors pack into [[LlmPipeline.packShards]] shards
    * with payload BYTES as the budget unit (the token budget's storage
    * twin — same bucket/budget constants).
    *
    * Scale: generation/decode are map-only partition passes (codec init
    * once per partition — the mapPartitions shape a real decoder needs);
    * the census is one conditional-sum rollup; packing is the
    * bucket-partitioned window. The two `.collect()`s are 1-row
    * aggregates. Oracle replays decode features from the closed
    * generative form (payload bytes = 35 + 3·w·h at these single-digit
    * dimensions) — a parser bug, a byte-length drift, or a gate-constant
    * drift all fail the compare.
    */
  def mediaCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        (id, graft.operators.Multimodal.encodePpm(id, w, h))
      })
    val bytes = media.toDF("doc_id", "payload")
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"))
    val staged = graft.operators.Multimodal.decodeImages(media).toDF()
      .join(bytes, "doc_id")
      .withColumn("px", col("width") * col("height"))
      .withColumn("mean_milli",
        expr("(1000 * (sum_r + sum_g + sum_b)) div (3 * px)"))
      .withColumn("admit", col("px") >= McMinPixels &&
        col("mean_milli") >= McMeanLo && col("mean_milli") <= McMeanHi)
    val cen = staged.agg(count(lit(1)).as("n0"),
        coalesce(sum(col("n_bytes")), lit(0L)).as("b0"),
        coalesce(sum(when(col("admit"), 1L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("admit"), col("n_bytes"))), lit(0L)).as("b1"))
      .as[(Long, Long, Long, Long)].head()
    val pk = LlmPipeline.packShards(staged.where(col("admit"))
      .select(col("doc_id"), col("n_bytes").as("n_tokens")))
    val shards = pk
      .agg(countDistinct(struct(col("bucket"), col("shard"))).as("s"),
        count(lit(1)).as("nd"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("nb"))
      .as[(Long, Long, Long)].head()
    Seq(
      (0L, "media", cen._1, cen._2, 0L),
      (1L, "admitted", cen._3, cen._4, 0L),
      (2L, "packed", shards._2, shards._3, shards._1))
      .toDF("stage", "stage_name", "n_media", "n_bytes", "n_shards")
  }

  private val mediaCurationPipelineSql = {
    def cenRow(stage: Int, name: String, from: String) =
      s"""SELECT ${stage}::BIGINT AS stage, '$name' AS stage_name,
         |  count(*)::BIGINT AS n_media,
         |  CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS n_bytes,
         |  0::BIGINT AS n_shards
         |FROM $from""".stripMargin
    s"""WITH g AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, w * h AS px, 35 + 3 * w * h AS n_bytes,
       |    list_sum(list_transform(range(3 * w * h),
       |      p -> (doc_id + p) % 251))::BIGINT AS sum_all
       |  FROM g
       |), s AS MATERIALIZED (
       |  SELECT doc_id, px, n_bytes, mean_milli,
       |    (px >= $McMinPixels AND mean_milli >= $McMeanLo
       |      AND mean_milli <= $McMeanHi) AS admit
       |  FROM (SELECT *, (1000 * sum_all) // (3 * px) AS mean_milli FROM f)
       |), adm AS MATERIALIZED (
       |  SELECT doc_id, n_bytes FROM s WHERE admit
       |), pk AS MATERIALIZED (
       |  ${LlmPipeline.packShardsSql(
             "(SELECT doc_id, n_bytes AS n_tokens FROM adm)")}
       |)
       |${cenRow(0, "media", "s")}
       |UNION ALL
       |${cenRow(1, "admitted", "adm")}
       |UNION ALL
       |SELECT 2::BIGINT AS stage, 'packed' AS stage_name,
       |  count(*)::BIGINT AS n_media,
       |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_bytes,
       |  (SELECT count(*) FROM (SELECT DISTINCT bucket, shard FROM pk))::BIGINT
       |    AS n_shards
       |FROM pk""".stripMargin
  }

  // ---- tokenizer-training pipeline --------------------------------------------

  /** Tokenizer training, end to end: learn BPE merges on the TRAIN split →
    * encode the WHOLE corpus with the learned rules → per-source fertility
    * census. The transfer question a tokenizer build actually answers: do
    * merges learned on half the corpus (`doc_id % 2 == 0`) tokenize every
    * source efficiently, or does some source pay a fertility penalty?
    *
    * Stage reuse: training is [[graft.operators.BpeMerges.learn]] with
    * [[TextAnalysis.BpeRounds]] rounds and bpe_merges' exact word hygiene
    * (lowercase whitespace tokens, `[a-z0-9]+` only); the learned rules
    * come back as ≤ BpeRounds driver rows (the model-as-driver-state
    * shape — bounded by construction) and are applied as literal chained
    * replaces ([[graft.operators.BpeMerges.applyMerges]] — map-only over
    * the word-TYPE table, never the token stream). The oracle learns its
    * own rules through the factored [[TextAnalysis.bpeRoundCtesSql]]
    * device — identical counts/tiebreaks/greedy-replace — then applies
    * its b_1..b_n CTEs the same way, so rules AND application attest.
    * FAILS LOUDLY on BOTH sides if the train split exhausts before
    * BpeRounds merges: the Spark path via require, the oracle via a
    * DuckDB error() guard on the last round's b-CTE (b_k empty implies
    * every later b empty, so checking the last round suffices) — an
    * oracle-only run can no longer silently return zero rows on a
    * degenerate corpus.
    *
    * Scale: one corpus pass per word-freq aggregate (train + per-source);
    * everything else is vocabulary-bounded. Readout per source: word
    * types, running words, encoded symbols, fertility (symbols per 1000
    * words).
    */
  def tokenizerTrainPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def words(df: DataFrame) = df
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
    val trainFreq = words(docs.where(col("doc_id") % 2 === 0))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val learned = graft.operators.BpeMerges
      .learn(trainFreq, TextAnalysis.BpeRounds).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    require(learned.length == TextAnalysis.BpeRounds,
      s"train split exhausted after ${learned.length} merges " +
        s"(< ${TextAnalysis.BpeRounds}); oracle unroll would diverge")
    val perSource = words(docs)
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("n_sym", graft.operators.BpeMerges.symbolCount(
        graft.operators.BpeMerges.applyMerges(col("word"), learned))
        .cast("long"))
    perSource.groupBy(col("source"))
      .agg(count(lit(1)).as("n_word_types"),
        sum(col("freq")).as("n_words"),
        sum(col("freq") * col("n_sym")).as("n_symbols"))
      .withColumn("fertility_milli",
        expr("(1000 * n_symbols) div n_words"))
  }

  private val tokenizerTrainPipelineSql = {
    val applyCtes = (1 to TextAnalysis.BpeRounds).map { r =>
      s"""a$r AS (
         |  SELECT a.source, a.word, a.freq,
         |    replace(a.s, '[' || b.lft || '][' || b.rgt || ']',
         |            '[' || b.lft || b.rgt || ']') AS s
         |  FROM a${r - 1} a CROSS JOIN b$r b
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH tw AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
       |        FROM documents WHERE doc_id % 2 = 0)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY word
       |), w0 AS (
       |  SELECT regexp_replace(word, '(.)', '[\\1]', 'g') AS s, freq FROM tw
       |),
       |${TextAnalysis.bpeRoundCtesSql(TextAnalysis.BpeRounds)},
       |aw AS (
       |  SELECT source, word, count(*) AS freq
       |  FROM (SELECT source,
       |          unnest(string_split_regex(lower(text), '\\s+')) AS word
       |        FROM documents)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY source, word
       |), a0 AS (
       |  SELECT source, word, freq,
       |    regexp_replace(word, '(.)', '[\\1]', 'g') AS s
       |  FROM aw
       |),
       |$applyCtes
       |SELECT source, count(*)::BIGINT AS n_word_types,
       |  CAST(sum(freq) AS BIGINT) AS n_words,
       |  CAST(sum(freq * len(string_split(trim(s, '[]'), ']['))) AS BIGINT)
       |    AS n_symbols,
       |  CAST((1000 * sum(freq * len(string_split(trim(s, '[]'), ']['))))
       |       // sum(freq) AS BIGINT) AS fertility_milli
       |FROM a${TextAnalysis.BpeRounds}
       |WHERE 1 = (SELECT CASE WHEN count(*) = 1 THEN 1
       |  ELSE CAST(error('train split exhausted before ${TextAnalysis.BpeRounds} merges') AS INT) END
       |  FROM b${TextAnalysis.BpeRounds})
       |GROUP BY source""".stripMargin
  }

  // ---- privacy-release pipeline -----------------------------------------------

  private val PrSeed = 43

  /** Privacy release, end to end: PII scrub → per-source redaction census
    * → noise-perturbed count release. The scrub stage is pii_scrub's exact
    * injection + redaction ([[TextAnalysis.piiAug]]/[[TextAnalysis.piiClean]]
    * — factored, so patterns cannot drift from the component that proves
    * byte-identical output); the census rolls up per source (docs,
    * redactions by all three kinds, scrubbed byte footprint); and the
    * PII-document count — the sensitive statistic — leaves only through
    * the dp_noisy_counts release device (bounded additive noise +
    * non-negativity clamp, same [[CurationOps.NoiseBound]], own release
    * seed) with its `NONE_DETERMINISTIC_NOISE` marker travelling in-band
    * (the noise is a seeded hash so the oracle can attest the release;
    * real deployments swap in a sampled Laplace draw — one line).
    *
    * Scale: one map-only regex scan (codegen'd), one partial-aggregated
    * rollup, a ≤|sources|-row perturbation. Nothing else touches data.
    */
  def privacyReleasePipeline(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), TextAnalysis.piiAug.as("t"))
      .select(col("source"),
        (size(regexp_extract_all(col("t"), lit(TextAnalysis.EmailRe), lit(0))) +
          size(regexp_extract_all(col("t"), lit(TextAnalysis.PhoneRe), lit(0))) +
          size(regexp_extract_all(col("t"), lit(TextAnalysis.IpRe), lit(0))))
          .cast("long").as("n_pii"),
        length(TextAnalysis.piiClean(col("t"))).cast("long").as("clean_len"))
    scrubbed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_pii")).as("n_redactions"),
        sum(col("clean_len")).as("clean_bytes"),
        sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("pii_docs"))
      .select(col("source"), col("n_docs"), col("n_redactions"),
        col("clean_bytes"),
        greatest(col("pii_docs") +
          pmod(graft.functions.PortableHash.h48(col("source"), PrSeed),
            lit(2 * CurationOps.NoiseBound + 1)) - CurationOps.NoiseBound,
          lit(0L)).as("noisy_pii_docs"),
        lit(CurationOps.NoiseBound).as("noise_bound"),
        lit("NONE_DETERMINISTIC_NOISE").as("privacy"))
  }

  private val privacyReleasePipelineSql = {
    val h = graft.functions.PortableHash.h48Sql("source", PrSeed)
    val b = CurationOps.NoiseBound
    s"""WITH aug AS (
       |  SELECT doc_id, source, ${TextAnalysis.piiAugSql} AS t
       |  FROM documents
       |), sc AS (
       |  SELECT source,
       |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
       |    + len(regexp_extract_all(t, '\\d{3}-\\d{3}-\\d{4}'))::BIGINT
       |    + len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT
       |      AS n_pii,
       |    len(${TextAnalysis.piiCleanSql("t")})::BIGINT AS clean_len
       |  FROM aug
       |), cen AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    CAST(sum(n_pii) AS BIGINT) AS n_redactions,
       |    CAST(sum(clean_len) AS BIGINT) AS clean_bytes,
       |    CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS pii_docs
       |  FROM sc GROUP BY source
       |)
       |SELECT source, n_docs, n_redactions, clean_bytes,
       |  greatest(pii_docs + ($h % ${2 * b + 1}) - $b, 0)::BIGINT
       |    AS noisy_pii_docs,
       |  $b::BIGINT AS noise_bound,
       |  'NONE_DETERMINISTIC_NOISE' AS privacy
       |FROM cen""".stripMargin
  }

  // ---- incremental dedup against a stored corpus index ---------------------

  /** Fixed delta-batch budget — the workload-shaped side of the incremental
    * contract (the [[graft.sources.Bm25Store]] ndcg_eval precedent): a
    * production ingest dedups a bounded ARRIVING batch against a growing
    * committed corpus, so serving cost must track the batch, not the
    * corpus. 100 docs × [[graft.operators.MinHashLsh.Bands]] = 800 distinct
    * band keys, inside the 1024 pushed-In-filter threshold
    * ([[graft.core.GraftSession]]), so the stored-index probe row-group-
    * prunes instead of scanning.
    */
  private[graft] val IncDeltaDocs = 100
  private val IncThreshMicro: Long =
    math.round(LlmPipeline.JaccardThreshold * 1000000L) // same near-dup bar

  /** The deterministic arriving-batch split behind [[incrementalDedup]]:
    * (delta docs (doc_id, text), delta ids, committed-corpus docs).
    */
  private[graft] def incSplit(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val hd = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
      PortableHash.h48(col("doc_id").cast("string")).as("h"))
    val deltaIds = hd.orderBy(col("h"), col("doc_id")).limit(IncDeltaDocs)
      .select(col("doc_id"))
    val deltaDocs = hd.join(broadcast(deltaIds), "doc_id")
    val corpusDocs = hd.join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
    (deltaDocs, deltaIds, corpusDocs)
  }

  /** The stored corpus LSH index of [[incrementalDedup]] — (bands, sets),
    * both [[graft.sources.FrameStore]] artifacts built once per corpus
    * fingerprint. Shared verbatim by the streaming face
    * ([[graft.streaming.StreamingOps.incDedupStream]]), so batch and
    * stream serve from the SAME bytes.
    */
  private[graft] def incStoredFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import graft.operators.MinHashLsh
    import graft.sources.FrameStore
    val n = LlmPipeline.ShingleN
    def corpusDocs = incSplit(spark, dir)._3
    val smallGroups = Map("parquet.block.size" -> (1 << 20).toString)
    val storedBands = FrameStore.frame(spark, dir, "inc_lsh_bands", 1,
      "documents.parquet", smallGroups) {
      MinHashLsh.bandKeys(MinHashLsh.signatures(
          MinHashLsh.explodeShingles(corpusDocs, "doc_id", "text", n)))
        .repartitionByRange(col("band_key"))
        .sortWithinPartitions(col("band_key"))
    }
    // v2 layout (round-13): range-sorted on `id` with 1 MB row groups — the
    // same pruning layout the bands artifact has on band_key — so incServe's
    // verification probe pushes the bounded candidate-id set as an In(id)
    // filter and reads only the row groups holding candidates, instead of
    // scanning the whole corpus-linear sets artifact per arriving batch
    val storedSets = FrameStore.frame(spark, dir, "inc_lsh_sets", 2,
      "documents.parquet", smallGroups) {
      MinHashLsh.explodeShingles(corpusDocs, "doc_id", "text", n)
        .groupBy(col("id")).agg(sort_array(collect_set(col("shingle"))).as("sa"))
        .repartitionByRange(col("id"))
        .sortWithinPartitions(col("id"))
    }
    (storedBands, storedSets)
  }

  /** The serving path of [[incrementalDedup]], factored over an arbitrary
    * arriving batch so the streaming face replays the IDENTICAL code per
    * micro-batch: signatures/bands/sets on the batch (batch-sized work),
    * pushed-In-filtered probes of the stored bands AND the stored sets
    * (probe-key collects LIMIT-bounded at the In-pushdown threshold, with
    * a distributed semi-join fallback past it), exact `array_intersect`
    * verification, one readout row per batch doc.
    */
  private[graft] def incServe(spark: SparkSession, deltaDocs: DataFrame,
                              storedBands: DataFrame,
                              storedSets: DataFrame): DataFrame = {
    import graft.operators.MinHashLsh
    val n = LlmPipeline.ShingleN
    val deltaIds = deltaDocs.select(col("doc_id"))
    val deltaEx = MinHashLsh.explodeShingles(deltaDocs, "doc_id", "text", n)
    val deltaBands = MinHashLsh.bandKeys(MinHashLsh.signatures(deltaEx))
    val deltaSets = deltaEx.groupBy(col("id"))
      .agg(sort_array(collect_set(col("shingle"))).as("sa"))
    // Probe-key collects are LIMIT-bounded at the In-pushdown threshold
    // ([[graft.sources.Bm25Store.MaxPruneTerms]] = the session's parquet
    // inFilterThreshold), not by an assumed batch size: the batch face
    // sends ≤ IncDeltaDocs·Bands = 800
    // keys, but the streaming face accepts arbitrary micro-batches, and an
    // unbounded collect would both flood the driver and silently overflow
    // the pushdown threshold (losing row-group pruning without saying so).
    // Within the limit the keys become a pushed In filter that prunes the
    // range-sorted store at row-group granularity; past it, fall back to a
    // distributed semi-join against the same store — identical results,
    // only the pruning device changes (the Bm25Store.prunedPostings
    // pattern).
    val inPushdownLimit = graft.sources.Bm25Store.MaxPruneTerms
    def prunedProbe(store: DataFrame, keyCol: String,
                    probe: DataFrame): DataFrame = {
      val keys = probe.select(col(keyCol)).distinct()
        .limit(inPushdownLimit + 1).collect().map(_.get(0)).toSeq
      if (keys.size <= inPushdownLimit)
        store.where(col(keyCol).isin(keys: _*))
      else
        store.join(probe.select(col(keyCol)).distinct(), Seq(keyCol),
          "left_semi")
    }
    val probeIsEmpty = deltaBands.isEmpty // degenerate: no shingled docs
    val cand =
      if (probeIsEmpty)
        spark.range(0).selectExpr("id AS a", "id AS b")
      else {
        // bounded (≤ batch·matches); materialized because it feeds both
        // the b-id probe collect and the verification join — computed once
        val raw = deltaBands.select(col("band"), col("band_key"), col("id").as("a"))
          .join(prunedProbe(storedBands, "band_key", deltaBands)
              .select(col("band"), col("band_key"), col("id").as("b")),
            Seq("band", "band_key"))
          .select(col("a"), col("b")).distinct()
        val m = graft.core.Materialize(raw)
        // the checkpoint truncates this subplan out of the query's final
        // executed plan, so the band-probe pushdown is attested through
        // the PlanTrace side channel (the iterative-operator convention)
        graft.core.PlanTrace.capture(raw, "incremental_dedup_candprobe")
        m
      }
    // verification reads ONLY the row groups holding candidate ids: the
    // bounded candidate b-id set is pushed as In(id) into the id-sorted
    // sets artifact (or the semi-join fallback past the threshold) — the
    // serving read is probe-sized, not corpus-sized
    val candSets =
      if (probeIsEmpty) storedSets.limit(0)
      else prunedProbe(storedSets, "id", cand.select(col("b").as("id")))
    val ver = cand
      .join(deltaSets.select(col("id").as("a"), col("sa").as("sda")), "a")
      .join(candSets.select(col("id").as("b"), col("sa").as("sdb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("sda"), col("sdb"))).cast("long").as("shared"),
        size(col("sda")).cast("long").as("na"),
        size(col("sdb")).cast("long").as("nb"))
      .withColumn("jm",
        expr("(1000000L * shared) div (na + nb - shared)"))
      .where(col("jm") >= IncThreshMicro)
    val w = Window.partitionBy(col("a"))
    val best = ver
      .withColumn("rn", row_number().over(w.orderBy(desc("jm"), asc("b"))))
      .withColumn("nm", count(lit(1)).over(w))
      .where(col("rn") === 1)
      .select(col("a"), col("nm"), col("b"), col("jm"))
    deltaIds.join(best, col("doc_id") === col("a"), "left")
      .select(col("doc_id"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        coalesce(col("b"), lit(-1L)).as("best_match"),
        coalesce(col("jm"), lit(0L)).as("best_j_micro"))
  }

  /** Incremental dedup — the near-dup pipeline re-shaped for CONTINUOUS
    * ingest, the missing production counterpart of the batch recipes
    * (dedup_minhash_lsh re-pairs the WHOLE corpus; a 100 TB pipeline never
    * does that per arriving batch):
    *
    *   1. split ([[incSplit]]): the [[IncDeltaDocs]] docs with the lowest
    *      (h48(doc_id), doc_id) are "the arriving batch" (a deterministic
    *      surrogate for an ingest timestamp); everything else is the
    *      committed corpus.
    *   2. corpus index, STORED ([[incStoredFrames]] →
    *      [[graft.sources.FrameStore]], build-once per corpus fingerprint —
    *      the MapFileOutputFormat contract):
    *      `inc_lsh_bands` = the corpus's (band, band_key, id) rows,
    *      range-sorted on band_key and written with 1 MB row groups so a
    *      pushed band_key filter prunes at row-group granularity (the
    *      [[graft.sources.Bm25Store]] postings layout); `inc_lsh_sets` =
    *      per-doc sorted distinct-shingle arrays for exact verification,
    *      range-sorted on `id` with the same 1 MB row groups (round 13)
    *      so the verification probe prunes exactly like the band probe.
    *   3. serve ([[incServe]]): delta docs → shingles →
    *      [[graft.operators.MinHashLsh]]
    *      signatures → band keys (batch-sized work); candidates = pushed-
    *      In-filtered probe of the stored bands; verification reads ONLY
    *      the row groups holding candidate ids via a pushed In(id) filter
    *      on the id-sorted sets artifact. Both probe-key collects are
    *      LIMIT-bounded at the In-pushdown threshold with a distributed
    *      semi-join fallback past it — an arbitrarily large streaming
    *      micro-batch can neither flood the driver nor silently lose
    *      row-group pruning. Verify EXACTLY via
    *      `array_intersect` of the delta's fresh shingle arrays with the
    *      stored corpus arrays (the containment_pairs verification shape;
    *      shingles are distinct per doc so the intersect size IS the
    *      overlap). Integer Jaccard: jm = (10⁶·shared) div (na+nb−shared),
    *      admitted at jm ≥ [[IncThreshMicro]] — the same bar as
    *      dedup_minhash_lsh, shared constants so they cannot drift.
    *
    * Readout: one row per delta doc — how many committed near-dups it hit,
    * the best match (highest jm, ties to the lowest corpus id) and its
    * score; unmatched docs report (0, −1, 0). LSH recall caveats are the
    * batch pipeline's own (candidates only within shared bands); precision
    * is 1.0 because verification is exact.
    *
    * Scale: every serving leg is probe-sized — the band probe and the
    * verification read are both pushed-In row-group-pruned against their
    * range-sorted artifacts, everything else is batch-sized. The index
    * build is linear but paid once per corpus version, off the serving
    * path.
    *
    * The streaming face —
    * [[graft.streaming.StreamingOps.incDedupStream]] — replays [[incServe]]
    * verbatim per micro-batch against the same stored frames.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val (deltaDocs, _, _) = incSplit(spark, dir)
    val (storedBands, storedSets) = incStoredFrames(spark, dir)
    incServe(spark, deltaDocs.select(col("doc_id"), col("text")),
      storedBands, storedSets)
  }

  private val incrementalDedupSql = {
    import graft.operators.MinHashLsh
    val n = LlmPipeline.ShingleN
    val h = PortableHash.h48Sql("CAST(doc_id AS VARCHAR)")
    val w = graft.functions.TextFns.tokensSql("text")
    val sh = graft.functions.TextFns.shinglesSql("w", n)
    val perms = (0 until MinHashLsh.NumHashes)
      .map(i => s"(${i}, ${MinHashLsh.PermA(i)}, ${MinHashLsh.PermB(i)})")
      .mkString(", ")
    s"""WITH delta AS (
       |  SELECT doc_id FROM documents ORDER BY $h, doc_id LIMIT $IncDeltaDocs
       |), tag AS (
       |  SELECT d.doc_id, d.text,
       |    d.doc_id IN (SELECT doc_id FROM delta) AS is_delta
       |  FROM documents d
       |), sh AS (
       |  SELECT doc_id, is_delta, $sh AS shingles
       |  FROM (SELECT doc_id, is_delta, $w AS w FROM tag)
       |  WHERE len(w) >= $n
       |), e AS (
       |  SELECT doc_id, is_delta, unnest(shingles) AS shingle,
       |    len(shingles) AS nsh
       |  FROM sh
       |), sig AS (
       |  SELECT doc_id, any_value(is_delta) AS is_delta, p.i,
       |    min((p.a * eh.h32 + p.b) % ${MinHashLsh.P}) AS hv
       |  FROM (SELECT doc_id, is_delta,
       |          ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32
       |        FROM e) eh
       |  CROSS JOIN (VALUES $perms) p(i, a, b)
       |  GROUP BY doc_id, p.i
       |), bands AS (
       |  SELECT doc_id, any_value(is_delta) AS is_delta,
       |    i // ${MinHashLsh.RowsPerBand} AS band,
       |    md5(string_agg(hv::VARCHAR, '|' ORDER BY i)) AS band_key
       |  FROM sig GROUP BY doc_id, i // ${MinHashLsh.RowsPerBand}
       |), cand AS (
       |  SELECT DISTINCT dx.doc_id AS a, cy.doc_id AS b
       |  FROM bands dx JOIN bands cy
       |    ON dx.band = cy.band AND dx.band_key = cy.band_key
       |  WHERE dx.is_delta AND NOT cy.is_delta
       |), ver AS (
       |  SELECT c.a, c.b, count(*) AS shared,
       |    any_value(ea.nsh) AS na, any_value(eb.nsh) AS nb
       |  FROM cand c
       |  JOIN e ea ON ea.doc_id = c.a
       |  JOIN e eb ON eb.doc_id = c.b AND eb.shingle = ea.shingle
       |  GROUP BY c.a, c.b
       |), j AS (
       |  SELECT a, b, (1000000 * shared) // (na + nb - shared) AS jm
       |  FROM ver
       |  WHERE (1000000 * shared) // (na + nb - shared) >= $IncThreshMicro
       |), rk AS (
       |  SELECT a, b, jm,
       |    row_number() OVER (PARTITION BY a ORDER BY jm DESC, b ASC) AS rn,
       |    count(*) OVER (PARTITION BY a) AS nm
       |  FROM j
       |)
       |SELECT d.doc_id,
       |  CAST(coalesce(rk.nm, 0) AS BIGINT) AS n_matches,
       |  CAST(coalesce(rk.b, -1) AS BIGINT) AS best_match,
       |  CAST(coalesce(rk.jm, 0) AS BIGINT) AS best_j_micro
       |FROM delta d
       |LEFT JOIN (SELECT * FROM rk WHERE rn = 1) rk ON rk.a = d.doc_id""".stripMargin
  }

  /** Cross-run audit of the artifact STORE itself (round-13 verdict task
    * 8): the engine now keeps six fingerprint-keyed per-corpus artifact
    * families on disk ([[graft.sources.Bm25Store]] postings+stats;
    * [[graft.sources.FrameStore]] pq_codes / ivfpq_index / inc_lsh_bands
    * / inc_lsh_sets / typo_variants) — this query forces each family to
    * its current-fingerprint version (build-or-validate, exactly what a
    * serving consumer does) and reads ONE census row per artifact from
    * the stored bytes. Staleness is impossible to observe here by
    * construction — the accessor resolves through the corpus fingerprint,
    * so a regenerated corpus makes this row attest the NEW artifact (and
    * pay its build); what the census checks cross-engine is that every
    * stored artifact's row count equals the count DERIVED FROM THE BASE
    * TABLES — a stored index that dropped or duplicated rows (a partial
    * write served as complete, a bad overwrite) fails the oracle twin.
    * The widened-table copies (`wide_*`) are excluded: their membership
    * varies with the scale factor's file sizes, and TablesSpec pins their
    * content equality directly.
    */
  def storeCensus(spark: SparkSession, dir: String): DataFrame = {
    val (bands, sets) = incStoredFrames(spark, dir)
    val fams: Seq[(String, DataFrame)] = Seq(
      "bm25_postings" -> graft.sources.Bm25Store.postings(spark, dir),
      "bm25_stats" -> graft.sources.Bm25Store.stats(spark, dir),
      "inc_lsh_bands" -> bands,
      "inc_lsh_sets" -> sets,
      "ivfpq_index" -> LlmPipeline.ivfPqIndexStored(spark, dir),
      "pq_codes" -> LlmPipeline.pqCodesStored(spark, dir),
      "typo_variants" -> Algorithms.typoVariants(spark, dir))
    fams.map { case (nm, df) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(nm).as("artifact"), col("n_rows"))
    }.reduce(_.unionAll(_))
  }

  private val storeCensusSql = {
    import graft.operators.MinHashLsh
    val n = LlmPipeline.ShingleN
    val h = PortableHash.h48Sql("CAST(doc_id AS VARCHAR)")
    val w = graft.functions.TextFns.tokensSql("text")
    s"""WITH delta AS (
       |  SELECT doc_id FROM documents ORDER BY $h, doc_id LIMIT $IncDeltaDocs
       |), cd AS (
       |  SELECT count(*) AS c
       |  FROM (SELECT doc_id, $w AS w FROM documents) t
       |  WHERE len(w) >= $n AND doc_id NOT IN (SELECT doc_id FROM delta)
       |), bp AS (
       |  SELECT count(*) AS c FROM (
       |    SELECT DISTINCT doc_id, term FROM (
       |      SELECT doc_id, unnest(w) AS term
       |      FROM (SELECT doc_id, $w AS w FROM documents)))
       |), tv AS (
       |  SELECT CAST(sum(length(name)) AS BIGINT) AS c
       |  FROM (SELECT DISTINCT c_name AS name FROM customer)
       |)
       |SELECT 'bm25_postings' AS artifact, (SELECT c FROM bp)::BIGINT AS n_rows
       |UNION ALL SELECT 'bm25_stats', 1::BIGINT
       |UNION ALL SELECT 'inc_lsh_bands',
       |  ((SELECT c FROM cd) * ${MinHashLsh.Bands})::BIGINT
       |UNION ALL SELECT 'inc_lsh_sets', (SELECT c FROM cd)::BIGINT
       |UNION ALL SELECT 'ivfpq_index',
       |  (SELECT count(*) FROM embeddings)::BIGINT
       |UNION ALL SELECT 'pq_codes', (SELECT count(*) FROM embeddings)::BIGINT
       |UNION ALL SELECT 'typo_variants', (SELECT c FROM tv)::BIGINT""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("curation_funnel", curationFunnel, Some(curationFunnelSql)),
    QueryDef("incremental_dedup", incrementalDedup, Some(incrementalDedupSql)),
    QueryDef("store_census", storeCensus, Some(storeCensusSql)),
    QueryDef("resumable_funnel", resumableFunnel, Some(resumableFunnelSql)),
    QueryDef("active_learning_loop", activeLearningLoop,
      Some(activeLearningLoopSql)),
    QueryDef("retrieval_pipeline", retrievalPipeline,
      Some(retrievalPipelineSql)),
    QueryDef("token_budget_pipeline", tokenBudgetPipeline,
      Some(tokenBudgetPipelineSql)),
    QueryDef("split_hygiene_pipeline", splitHygienePipeline,
      Some(splitHygienePipelineSql)),
    QueryDef("eval_protocol_pipeline", evalProtocolPipeline,
      Some(evalProtocolPipelineSql)),
    QueryDef("ann_index_refresh", annIndexRefresh,
      Some(annIndexRefreshSql)),
    QueryDef("media_curation_pipeline", mediaCurationPipeline,
      Some(mediaCurationPipelineSql)),
    QueryDef("tokenizer_train_pipeline", tokenizerTrainPipeline,
      Some(tokenizerTrainPipelineSql)),
    QueryDef("privacy_release_pipeline", privacyReleasePipeline,
      Some(privacyReleasePipelineSql)),
  )
}
