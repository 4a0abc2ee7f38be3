package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{PortableHash, TextFns}
import graft.operators.VectorOps

/** Training-data-pipeline operators, round 10: the audits and transforms a
  * model-training team runs BETWEEN curation and the trainer — drift gates
  * (PSI), split hygiene (stratified k-fold), memorization/novelty
  * profiling, label-noise screening, preference-strength fitting
  * (Bradley–Terry, the RLHF-reward-data shape) and conformal calibration.
  * Every readout is exact-integer or micro-rounded so the DuckDB oracle
  * attests it bit-for-bit; every plan is a bounded number of shuffles
  * with no corpus-quadratic step.
  */
object TrainingOps extends QueryModule {

  // ---- population stability index (distribution drift gate) ---------------
  private val PsiBins = 10

  /** PSI of the event `value` distribution between the corpus's first and
    * second half-periods — the go/no-go drift gate a feature/training
    * pipeline runs before reusing yesterday's model on today's data
    * (rule of thumb: PSI < 0.1 stable, > 0.25 shifted). Values land in
    * [[PsiBins]] fixed-width bands (`floor(value) div 25`, clamped);
    * the period split derives from the corpus's own (min, max) day
    * midpoint — a broadcast 1-row bound, so the query is calendar-free
    * and scale-invariant. Per bin: counts in each period plus the
    * micro-rounded PSI contribution `(p_a − p_e)·ln(p_a/p_e)` with +0.5
    * Laplace smoothing over the fixed [[PsiBins]]-bin domain (no empty
    * bin can zero the log). Two corpus scans collapse to one binned
    * rollup + two broadcast 1-row frames; all float math in `e0` IEEE
    * doubles under micro rounding (the woe_iv parity convention).
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      expr("least(greatest(CAST(floor(value) AS BIGINT) div 25, 0L), 9L)")
        .as("bin"),
      expr("ts div 86400000000000").as("day"))
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("is_e", (col("day") < expr("(d0 + d1 + 1) div 2"))
        .cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("is_e")).as("n_expected"),
        sum(lit(1L) - col("is_e")).as("n_actual"))
    val tot = binned.agg(sum(col("n_expected")).as("te"),
      sum(col("n_actual")).as("ta"))
    val pe = s"((n_expected + 0.5e0) / (te + ${PsiBins / 2}e0))"
    val pa = s"((n_actual + 0.5e0) / (ta + ${PsiBins / 2}e0))"
    binned.crossJoin(broadcast(tot))
      .withColumn("psi_u",
        expr(s"CAST(round(1e6 * ($pa - $pe) * ln($pa / $pe)) AS BIGINT)"))
      .select(col("bin"), col("n_expected"), col("n_actual"), col("psi_u"))
  }

  private val psiDriftSql = {
    val pe = s"((n_expected + 0.5e0) / (te + ${PsiBins / 2}e0))"
    val pa = s"((n_actual + 0.5e0) / (ta + ${PsiBins / 2}e0))"
    s"""WITH ev AS (
       |  SELECT least(greatest(CAST(floor(value) AS BIGINT) // 25, 0), 9)
       |      AS bin,
       |    epoch_us(ts) // 86400000000 AS day
       |  FROM events
       |), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
       |binned AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN day < (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_expected,
       |    CAST(sum(CASE WHEN day < (d0 + d1 + 1) // 2 THEN 0 ELSE 1 END)
       |      AS BIGINT) AS n_actual
       |  FROM ev CROSS JOIN bounds GROUP BY bin
       |), tot AS (
       |  SELECT sum(n_expected) AS te, sum(n_actual) AS ta FROM binned
       |)
       |SELECT bin, n_expected, n_actual,
       |  CAST(round(1e6 * ($pa - $pe) * ln($pa / $pe)) AS BIGINT) AS psi_u
       |FROM binned CROSS JOIN tot""".stripMargin
  }

  // ---- stratified k-fold assignment ----------------------------------------
  private val Folds = 5

  /** Deterministic stratified k-fold split over the labeled embedding
    * corpus: within each label, rows ordered by a portable seedless hash
    * of the id round-robin into [[Folds]] folds, so every (label, fold)
    * cell holds ⌊n/k⌋ or ⌈n/k⌉ rows — the split-hygiene primitive under
    * any cross-validated eval. The readout attests MEMBERSHIP, not just
    * balance: per (label, fold) the count AND the exact id sum, so two
    * engines that balanced differently cannot collide. The within-label
    * rank is NOT a per-label window (|labels| reducers would own the
    * whole corpus at scale) — it is the [[TextAnalysis.docOffsets]]
    * two-pass range-partitioned prefix count: range-partition by
    * (label, hash, id), per-partition local ranks, and a bounded
    * (label × partition)-sized base-offset table broadcast back. The
    * hash order is portable (md5-48), so the assignment is reproducible
    * across runs, engines and cluster sizes.
    */
  def stratifiedKfold(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        PortableHash.h48(col("vec_id").cast("string")).as("h"))
    val parts = graft.core.Materialize(
      d.repartitionByRange(col("label"), col("h"), col("vec_id"))
        .withColumn("pid", spark_partition_id()))
    val base = parts.groupBy(col("label"), col("pid"))
      .agg(count(lit(1)).as("c"))
      .withColumn("base", coalesce(sum(col("c")).over(
        Window.partitionBy(col("label")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("label"), col("pid"), col("base"))
    val wLocal = Window.partitionBy(col("label"), col("pid"))
      .orderBy(col("h"), col("vec_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("local", coalesce(count(lit(1)).over(wLocal), lit(0L)))
      .join(broadcast(base), Seq("label", "pid"))
      .withColumn("fold", ((col("base") + col("local")) % Folds).cast("int"))
      .groupBy(col("label"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("ids_sum"))
  }

  private val stratifiedKfoldSql =
    s"""WITH a AS (
       |  SELECT label, vec_id,
       |    CAST((row_number() OVER (PARTITION BY label
       |      ORDER BY ${PortableHash.h48Sql("CAST(vec_id AS VARCHAR)")},
       |      vec_id) - 1) % $Folds AS INTEGER) AS fold
       |  FROM embeddings
       |)
       |SELECT label, fold, count(*)::BIGINT AS n,
       |  CAST(sum(vec_id) AS BIGINT) AS ids_sum
       |FROM a GROUP BY label, fold""".stripMargin

  // ---- n-gram novelty profiling ---------------------------------------------
  private val NovN = 5

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * [[NovN]]-grams whose FIRST corpus occurrence (minimum doc_id) is the
    * document itself — the memorization/templating profile that separates
    * original text (novelty → 1000‰) from boilerplate recombination
    * (novelty → 0). The gram frame is map-only (`transform` over the
    * token array — no positional self-join), first-owner is one
    * min-aggregate on the gram key, and the join back is gram-partitioned
    * — both shuffles linear in total gram volume at any corpus size.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= NovN)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(tk) - ${NovN - 1}), " +
          s"i -> concat_ws(' ', slice(tk, i, $NovN)))")).as("gram"))
      .distinct()
    val firstDoc = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(firstDoc, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
      .withColumn("novelty_pm", expr("(1000 * n_novel) div n_grams"))
  }

  private val ngramNoveltySql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id,
       |    array_to_string(tk[i:i + ${NovN - 1}], ' ') AS gram
       |  FROM toks, UNNEST(generate_series(1, len(tk) - ${NovN - 1})) AS u(i)
       |  WHERE len(tk) >= $NovN
       |), f AS (
       |  SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
       |)
       |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  (1000 * CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT)) // count(*) AS novelty_pm
       |FROM g JOIN f USING (gram) GROUP BY g.doc_id""".stripMargin

  // ---- label-noise screening (kNN disagreement) ------------------------------
  private val LnK = 10
  private val LnBudget = 50L
  private val LnMinVotes = 6

  /** Confident-learning-style label-noise screen: for each audited vector
    * (a FIXED [[VectorOps.auditSample]] budget of ~[[LnBudget]] ids — a
    * `% constant` audit set grew with the corpus and measured exponent
    * 2.13 on a real 10× step before the cap), the [[LnK]]-NN label vote —
    * a row is `suspect` when a ≥[[LnMinVotes]]-vote neighbor majority
    * carries a DIFFERENT label than its own, the standard candidate set a
    * curation pass sends for re-annotation. Emits every audited row (flag
    * column), not just suspects, so the readout also attests the clean
    * majority. Same exact integer-cosine / deterministic-tiebreak
    * contract as knn_classify; the brute-force candidate pass swaps to
    * the ANN paths at scale unchanged.
    */
  def labelNoiseAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val nn = VectorOps.bruteForceTopK(emb,
      VectorOps.auditSample(emb, "vec_id", LnBudget),
      "vec_id", "embedding", LnK)
    val lbl = emb.select(col("vec_id"), col("label"))
    val votes = nn.join(lbl.withColumnRenamed("vec_id", "cand_id"), "cand_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .join(lbl.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "own_label"), "query_id")
      .select(col("query_id").as("vec_id"), col("own_label"),
        col("label").as("maj_label"), col("votes").as("maj_votes"),
        (col("label") =!= col("own_label") &&
          col("votes") >= LnMinVotes).cast("int").as("suspect"))
  }

  private val labelNoiseAuditSql = {
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", 64)
    s"""WITH v AS (
       |  SELECT vec_id, ${VectorOps.quantizeSql("embedding")} AS qv
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, qv AS qq FROM v
       |  WHERE vec_id % ${VectorOps.auditSampleModSql("embeddings", LnBudget)} = 0
       |), nn AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.query_id, v.vec_id AS cand_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round($cos, 6) DESC, v.vec_id) AS rank
       |    FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id)
       |  WHERE rank <= $LnK
       |), votes AS (
       |  SELECT nn.query_id, e.label, count(*) AS votes
       |  FROM nn JOIN embeddings e ON e.vec_id = nn.cand_id
       |  GROUP BY 1, 2
       |)
       |SELECT w.query_id AS vec_id, te.label AS own_label,
       |  w.label AS maj_label, w.votes AS maj_votes,
       |  CAST(CASE WHEN w.label <> te.label AND w.votes >= $LnMinVotes
       |    THEN 1 ELSE 0 END AS INTEGER) AS suspect
       |FROM (SELECT query_id, label, votes, row_number() OVER (
       |        PARTITION BY query_id ORDER BY votes DESC, label) AS rk
       |      FROM votes) w
       |JOIN embeddings te ON te.vec_id = w.query_id
       |WHERE w.rk = 1""".stripMargin
  }

  // ---- Bradley–Terry preference strengths ------------------------------------
  private val BtRounds = 8
  private val BtM = 1000000L

  /** Bradley–Terry strength fit over pairwise "duels" — the
    * preference-data shape under an RLHF reward model, fit here on event
    * types: within each (user, day) basket, type a beats type b when a
    * occurred strictly more often. The distributed pass is one corpus
    * rollup + a per-basket self-join (baskets are ≤|types| rows, so the
    * pair volume is basket-bounded, never corpus-quadratic); the duel
    * table is ≤|types|² cells and iterates driver-side — [[BtRounds]]
    * minorize-maximize rounds in exact integer micro units, each per-pair
    * term the truncating division `(n·M) div max(s_a + s_b, 1)` (the
    * [[graft.operators.MarkovKernel]] order-free contract), followed by a
    * Σs = k·M renormalization. The DuckDB twin replays the identical
    * schedule as a CTE chain, bit for bit.
    */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val dc = Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val duels = dc.select(col("user_id"), col("day"),
        col("event_type").as("wi"), col("c").as("cw"))
      .join(dc.select(col("user_id"), col("day"),
        col("event_type").as("lo"), col("c").as("cl")), Seq("user_id", "day"))
      .where(col("wi") =!= col("lo") && col("cw") > col("cl"))
      .groupBy(col("wi"), col("lo")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val dom = (duels.map(_._1) ++ duels.map(_._2)).distinct.sorted
    val wins = dom.map(t => t -> duels.filter(_._1 == t).map(_._3).sum).toMap
    // symmetric games table, both orientations
    val games = (duels ++ duels.map(d => (d._2, d._1, d._3)))
      .groupBy(d => (d._1, d._2))
      .map { case ((a, b), ds) => (a, b, ds.map(_._3).sum) }.toSeq
    val ngames = dom.map(t =>
      t -> games.filter(_._1 == t).map(_._3).sum).toMap
    val k = dom.length
    var s: Map[String, Long] = dom.map(_ -> BtM).toMap
    (1 to BtRounds).foreach { _ =>
      val d = games.groupBy(_._1).map { case (t, gs) =>
        t -> gs.map(g => g._3 * BtM / math.max(s(t) + s(g._2), 1L)).sum
      }
      val raw = dom.map(t =>
        t -> (BigInt(wins(t)) * BtM * BtM / BigInt(d(t)).max(1)).toLong).toMap
      val sumRaw = BigInt(raw.values.sum).max(1)
      s = dom.map(t =>
        t -> (BigInt(raw(t)) * k * BtM / sumRaw).toLong).toMap
    }
    import spark.implicits._
    dom.toSeq.map(t => (t, wins(t), ngames(t), s(t)))
      .toDF("event_type", "n_wins", "n_games", "strength_u")
  }

  private val bradleyTerrySql = {
    val rounds = (1 to BtRounds).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""d$r AS MATERIALIZED (
         |  SELECT gm.a AS t,
         |    CAST(sum((gm.n * $BtM) // greatest(sa.p + sb.p, 1)) AS BIGINT)
         |      AS d
         |  FROM gm JOIN $prev sa ON sa.t = gm.a JOIN $prev sb ON sb.t = gm.b
         |  GROUP BY gm.a
         |), r$r AS MATERIALIZED (
         |  SELECT wt.t,
         |    (wt.w::HUGEINT * $BtM * $BtM) // greatest(d.d, 1) AS raw
         |  FROM wt JOIN d$r d ON d.t = wt.t
         |), s$r AS MATERIALIZED (
         |  SELECT t, CAST((raw * (SELECT count(*) FROM dom) * $BtM) //
         |    greatest((SELECT sum(raw) FROM r$r), 1) AS BIGINT) AS p
         |  FROM r$r
         |)"""
    }.mkString(", ")
    s"""WITH dc AS (
       |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
       |    count(*) AS c
       |  FROM events GROUP BY 1, 2, 3
       |), dw AS MATERIALIZED (
       |  SELECT x.event_type AS wi, y.event_type AS lo, count(*)::BIGINT AS n
       |  FROM dc x JOIN dc y ON x.user_id = y.user_id AND x.day = y.day
       |    AND x.event_type <> y.event_type AND x.c > y.c
       |  GROUP BY 1, 2
       |), dom AS MATERIALIZED (
       |  SELECT DISTINCT t FROM
       |    (SELECT wi AS t FROM dw UNION ALL SELECT lo FROM dw)
       |), wt AS MATERIALIZED (
       |  SELECT d.t, CAST(COALESCE(sum(dw.n), 0) AS BIGINT) AS w
       |  FROM dom d LEFT JOIN dw ON dw.wi = d.t GROUP BY d.t
       |), gm AS MATERIALIZED (
       |  SELECT a, b, CAST(sum(n) AS BIGINT) AS n FROM (
       |    SELECT wi AS a, lo AS b, n FROM dw
       |    UNION ALL SELECT lo AS a, wi AS b, n FROM dw)
       |  GROUP BY 1, 2
       |), ng AS (
       |  SELECT a AS t, CAST(sum(n) AS BIGINT) AS n FROM gm GROUP BY a
       |), s0 AS (SELECT t, $BtM::BIGINT AS p FROM dom), $rounds
       |SELECT s.t AS event_type, wt.w AS n_wins, ng.n AS n_games,
       |  s.p AS strength_u
       |FROM s$BtRounds s JOIN wt ON wt.t = s.t JOIN ng ON ng.t = s.t""".stripMargin
  }

  // ---- split-conformal calibration -------------------------------------------
  /** Split-conformal interval calibration per event type: the calibration
    * half (even event_id) fixes a per-type center (truncating-mean of
    * exact value-cents) and the q95 absolute residual; the held-out half
    * measures empirical coverage of `center ± q95` — the distribution-free
    * "is this interval honest" audit run before anyone ships a predictor's
    * error bars. All math in exact integer cents/permille. Scale shape:
    * ONE corpus pass rolls BOTH halves up to (type, half, cents) cells —
    * bounded by the value domain, not the corpus — and center, residual
    * histogram, q95 pick and coverage all derive from the materialized
    * cells; the quantile is never a per-type global sort (the former
    * per-reference dataflow re-executed the calibration subtree once per
    * consumer: 15 parquet scans of events where one suffices).
    */
  def conformalInterval(spark: SparkSession, dir: String): DataFrame = {
    // the single corpus-sized pass: value-domain-bounded (type, half,
    // cents) cells. Materialized so every downstream aggregate re-reads
    // the few cell rows instead of re-running the scan+rollup per
    // reference (mc alone had three consumers)
    val cells = graft.core.Materialize(
      Tables.events(spark, dir).select(col("event_type"),
        (col("event_id") % 2).as("half"),
        expr("CAST(round(value * 100e0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("half"), col("cents"))
        .agg(count(lit(1)).as("cnt")))
    val cal = cells.where(col("half") === 0)
    val hold = cells.where(col("half") === 1)
    // center = (Σ cents) div n over calibration ROWS ≡ Σ(cents·cnt) div Σcnt
    val mc = cal.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_cal"),
        sum(col("cents") * col("cnt")).as("sc"))
      .withColumn("center", expr("sc div n_cal"))
      .select(col("event_type"), col("n_cal"), col("center"))
    // residual histogram: (type, r) cells — value-domain-bounded
    val hist = cal.join(broadcast(mc), "event_type")
      .select(col("event_type"), abs(col("cents") - col("center")).as("r"),
        col("cnt"))
      .groupBy(col("event_type"), col("r")).agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q95 = hist.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(mc), "event_type")
      .where(col("cum") >= expr("(n_cal * 95 + 99) div 100"))
      .groupBy(col("event_type")).agg(min(col("r")).as("q95_cents"))
    hold.join(broadcast(mc), "event_type")
      .join(broadcast(q95), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n_cal")).as("n_cal"),
        max(col("center")).as("center"),
        max(col("q95_cents")).as("q95_cents"),
        sum(col("cnt")).as("n_eval"),
        sum(when(abs(col("cents") - col("center")) <= col("q95_cents"),
          col("cnt")).otherwise(lit(0L))).as("n_within"))
      .withColumn("coverage_pm", expr("(1000 * n_within) div n_eval"))
      .select(col("event_type"), col("n_cal"), col("center"),
        col("q95_cents"), col("n_eval"), col("n_within"), col("coverage_pm"))
  }

  private val conformalIntervalSql =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100e0) AS BIGINT) AS cents
      |  FROM events
      |), cal AS (SELECT * FROM ev WHERE event_id % 2 = 0),
      |hold AS (SELECT * FROM ev WHERE event_id % 2 = 1),
      |mc AS (
      |  SELECT event_type, count(*)::BIGINT AS n_cal,
      |    CAST(sum(cents) AS BIGINT) // count(*) AS center
      |  FROM cal GROUP BY event_type
      |), hist AS (
      |  SELECT cal.event_type, abs(cal.cents - mc.center) AS r,
      |    count(*)::BIGINT AS cnt
      |  FROM cal JOIN mc USING (event_type) GROUP BY 1, 2
      |), q AS (
      |  SELECT event_type, min(r) AS q95_cents FROM (
      |    SELECT h.event_type, h.r,
      |      sum(h.cnt) OVER (PARTITION BY h.event_type ORDER BY h.r
      |        ROWS UNBOUNDED PRECEDING) AS cum,
      |      mc.n_cal
      |    FROM hist h JOIN mc USING (event_type))
      |  WHERE cum >= (n_cal * 95 + 99) // 100
      |  GROUP BY event_type
      |)
      |SELECT hold.event_type, max(mc.n_cal) AS n_cal,
      |  max(mc.center) AS center, max(q.q95_cents) AS q95_cents,
      |  count(*)::BIGINT AS n_eval,
      |  CAST(sum(CASE WHEN abs(hold.cents - mc.center) <= q.q95_cents
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
      |  (1000 * CAST(sum(CASE WHEN abs(hold.cents - mc.center) <= q.q95_cents
      |    THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS coverage_pm
      |FROM hold JOIN mc USING (event_type) JOIN q USING (event_type)
      |GROUP BY hold.event_type""".stripMargin

  // ---- span corruption (denoising-objective masking plan) -------------------
  private val SpanLen = 3
  private val SpanPct = 3 // masked blocks per 20 → 15%

  /** Deterministic T5-style span-corruption PLAN over the token stream:
    * positions group into [[SpanLen]]-token blocks, and a block is masked
    * iff a portable seeded hash of (doc, block) clears the [[SpanPct]]/20
    * gate — 15% expected token corruption in contiguous spans, decided by
    * data (not RNG state) so any executor, engine or retry derives the
    * SAME mask. Per doc: token count, masked tokens, masked spans and the
    * realized permille — the readout a pretraining pipeline checks before
    * materializing corrupted inputs. One posexplode (map-only, linear) +
    * one doc rollup.
    */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("blk", expr(s"pos div $SpanLen"))
      .withColumn("msk",
        (PortableHash.h48(concat_ws(":", col("doc_id"), col("blk")))
          % 20 < SpanPct).cast("long"))
    toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("msk")).as("n_masked"),
        countDistinct(when(col("msk") === 1L, col("blk"))).as("n_spans"))
      .withColumn("masked_pm", expr("(1000 * n_masked) div n_tokens"))
  }

  private val spanCorruptionSql =
    s"""WITH tk AS (
       |  SELECT doc_id, (u.ord - 1) // $SpanLen AS blk,
       |    CASE WHEN ${PortableHash.h48Sql(
             s"CAST(doc_id AS VARCHAR) || ':' || CAST((u.ord - 1) // $SpanLen AS VARCHAR)")}
       |      % 20 < $SpanPct THEN 1 ELSE 0 END AS msk
       |  FROM documents,
       |    UNNEST(generate_series(1, len(string_split(text, ' ')))) AS u(ord)
       |)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  CAST(sum(msk) AS BIGINT) AS n_masked,
       |  CAST(count(DISTINCT CASE WHEN msk = 1 THEN blk END) AS BIGINT)
       |    AS n_spans,
       |  (1000 * CAST(sum(msk) AS BIGINT)) // count(*) AS masked_pm
       |FROM tk GROUP BY doc_id""".stripMargin

  // ---- data-constrained epoch allocation -------------------------------------
  private val MaxEpochs = 4L

  /** Multi-epoch training-mix schedule under a token budget (the
    * data-constrained recipe: when a source can't fill its share in one
    * pass, repeat it — up to [[MaxEpochs]] epochs — and report the
    * shortfall). Budget = 2× the corpus's own token supply, share =
    * budget div |sources|; per source: available tokens, the equal-share
    * target, the epoch count ⌈target/avail⌉ clamped to [[MaxEpochs]], the
    * allocation min(target, epochs·avail) and the unfilled shortfall.
    * Exact integers end to end; one source rollup + one broadcast 1-row
    * totals frame.
    */
  def multiEpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).as("avail_tokens"))
    val tot = bySrc.agg(sum(col("avail_tokens")).as("total_avail"),
      count(lit(1)).as("n_sources"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr("(2 * total_avail) div n_sources"))
      .withColumn("epochs", expr(
        s"least($MaxEpochs, (target_tokens + avail_tokens - 1) div avail_tokens)"))
      .withColumn("alloc_tokens",
        expr("least(target_tokens, epochs * avail_tokens)"))
      .withColumn("shortfall", expr("target_tokens - alloc_tokens"))
      .select(col("source"), col("avail_tokens"), col("target_tokens"),
        col("epochs"), col("alloc_tokens"), col("shortfall"))
  }

  private val multiEpochScheduleSql =
    s"""WITH b AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
       |  FROM documents GROUP BY source
       |), t AS (
       |  SELECT CAST(sum(avail_tokens) AS BIGINT) AS total_avail,
       |    count(*)::BIGINT AS n_sources
       |  FROM b
       |), s AS (
       |  SELECT source, avail_tokens,
       |    (2 * total_avail) // n_sources AS target_tokens
       |  FROM b CROSS JOIN t
       |)
       |SELECT source, avail_tokens, target_tokens,
       |  least($MaxEpochs,
       |    (target_tokens + avail_tokens - 1) // avail_tokens) AS epochs,
       |  least(target_tokens,
       |    least($MaxEpochs, (target_tokens + avail_tokens - 1) // avail_tokens)
       |      * avail_tokens) AS alloc_tokens,
       |  target_tokens - least(target_tokens,
       |    least($MaxEpochs, (target_tokens + avail_tokens - 1) // avail_tokens)
       |      * avail_tokens) AS shortfall
       |FROM s""".stripMargin

  // ---- Fleiss' kappa (multi-rater agreement audit) ---------------------------
  /** Fleiss' κ over three deterministic document "raters" — the
    * annotation-pipeline agreement audit (is the labeling rubric tight
    * enough that independent raters converge?), computed here on three
    * rule raters a quality rubric might ship: length (≥55 tokens),
    * lexical diversity (type-token ratio ≥ 550‰) and stopword density
    * (≥ 60‰ of {the,a,of,to,in}). Per item the agreement term
    * `Σ_c n_c(n_c−1) / (n(n−1))` folds to one map-only scan + a 1-row
    * aggregate; P̄, chance agreement P̄ₑ and κ are micro-rounded ratios of
    * those exact counters. One row out regardless of corpus size.
    */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val votes = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("tk"))
      .select(
        expr("size(tk)").as("n"),
        expr("size(array_distinct(tk))").as("nd"),
        expr("size(filter(tk, x -> x IN ('the','a','of','to','in')))")
          .as("stp"))
      .select((expr("CASE WHEN n >= 55 THEN 1 ELSE 0 END") +
        expr("CASE WHEN (1000 * nd) div n >= 550 THEN 1 ELSE 0 END") +
        expr("CASE WHEN (1000 * stp) div n >= 60 THEN 1 ELSE 0 END"))
        .cast("long").as("n1"))
    votes
      .agg(count(lit(1)).as("n_items"), sum(col("n1")).as("s1"),
        sum(expr("n1 * (n1 - 1) + (3 - n1) * (2 - n1)")).as("agree_num"))
      .withColumn("p_bar_u",
        expr("CAST(round(1e6 * agree_num / (6e0 * n_items)) AS BIGINT)"))
      .withColumn("p_e_u", expr(
        "CAST(round(1e6 * ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items)) " +
          "+ (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items)))) " +
          "AS BIGINT)"))
      .withColumn("kappa_u", expr(
        "CAST(round(1e6 * (agree_num / (6e0 * n_items) " +
          "- ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items)) " +
          "+ (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items)))) " +
          "/ (1e0 - ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items)) " +
          "+ (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items))))) " +
          "AS BIGINT)"))
      .select(col("n_items"), col("s1"), col("p_bar_u"), col("p_e_u"),
        col("kappa_u"))
  }

  private val fleissKappaSql =
    """WITH v AS (
      |  SELECT len(tk) AS n, len(list_distinct(tk)) AS nd,
      |    len(list_filter(tk, x -> x IN ('the','a','of','to','in'))) AS stp
      |  FROM (SELECT string_split(text, ' ') AS tk FROM documents)
      |), n1s AS (
      |  SELECT (CASE WHEN n >= 55 THEN 1 ELSE 0 END +
      |    CASE WHEN (1000 * nd) // n >= 550 THEN 1 ELSE 0 END +
      |    CASE WHEN (1000 * stp) // n >= 60 THEN 1 ELSE 0 END)::BIGINT AS n1
      |  FROM v
      |), a AS (
      |  SELECT count(*)::BIGINT AS n_items, CAST(sum(n1) AS BIGINT) AS s1,
      |    CAST(sum(n1 * (n1 - 1) + (3 - n1) * (2 - n1)) AS BIGINT)
      |      AS agree_num
      |  FROM n1s
      |)
      |SELECT n_items, s1,
      |  CAST(round(1e6 * agree_num / (6e0 * n_items)) AS BIGINT) AS p_bar_u,
      |  CAST(round(1e6 * ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items))
      |    + (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items))))
      |    AS BIGINT) AS p_e_u,
      |  CAST(round(1e6 * (agree_num / (6e0 * n_items)
      |    - ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items))
      |      + (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items))))
      |    / (1e0 - ((s1 / (3e0 * n_items)) * (s1 / (3e0 * n_items))
      |      + (1e0 - s1 / (3e0 * n_items)) * (1e0 - s1 / (3e0 * n_items)))))
      |    AS BIGINT) AS kappa_u
      |FROM a""".stripMargin

  // ---- temporal leakage audit -------------------------------------------------
  /** Train/test leakage scan for a time-based split: with the corpus split
    * at its own (min, max)-day midpoint (the [[psiDrift]] bound), per
    * event type — how many users appear in the train half, the test half,
    * and BOTH. A user on both sides of a temporal split leaks label
    * signal into evaluation; overlap_pm is the number an eval harness
    * gates on (expect ~0 after proper user-level splitting, high when
    * splitting rows instead of users). One (type, user) rollup + one
    * per-type fold; both corpus-linear.
    */
  def leakageAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      col("user_id"), expr("ts div 86400000000000").as("day"))
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("(d0 + d1 + 1) div 2"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max((col("day") < col("mid")).cast("long")).as("in_train"),
        max((col("day") >= col("mid")).cast("long")).as("in_test"))
      .groupBy(col("event_type"))
      .agg(sum(col("in_train")).as("n_train_users"),
        sum(col("in_test")).as("n_test_users"),
        sum(col("in_train") * col("in_test")).as("n_overlap"))
      .withColumn("overlap_pm",
        expr("(1000 * n_overlap) div greatest(n_test_users, 1)"))
  }

  private val leakageAuditSql =
    """WITH ev AS (
      |  SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events
      |), b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |pu AS (
      |  SELECT event_type, user_id,
      |    max(CASE WHEN day < (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END)
      |      AS in_train,
      |    max(CASE WHEN day >= (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END)
      |      AS in_test
      |  FROM ev CROSS JOIN b GROUP BY 1, 2
      |)
      |SELECT event_type,
      |  CAST(sum(in_train) AS BIGINT) AS n_train_users,
      |  CAST(sum(in_test) AS BIGINT) AS n_test_users,
      |  CAST(sum(in_train * in_test) AS BIGINT) AS n_overlap,
      |  (1000 * CAST(sum(in_train * in_test) AS BIGINT)) //
      |    greatest(CAST(sum(in_test) AS BIGINT), 1) AS overlap_pm
      |FROM pu GROUP BY event_type""".stripMargin

  // ---- out-of-fold target encoding ---------------------------------------------
  /** Leakage-free (out-of-fold) target encoding of `event_type` against
    * the value target: rows fold by a portable hash of the id, and each
    * (category, fold) cell's encoding is the target mean computed from
    * the OTHER folds only — `(s_total − s_fold) div (n_total − n_fold)`
    * in exact cents — the standard high-cardinality categorical feature
    * that doesn't let a row see its own label. One (type, fold) rollup;
    * the per-type totals derive from that same bounded frame (no second
    * corpus scan) and join back broadcast.
    */
  def targetEncodeOof(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        (PortableHash.h48(col("event_id").cast("string")) % 5)
          .cast("int").as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100e0) AS BIGINT)")).as("s"))
    val tt = pf.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_t"), sum(col("s")).as("s_t"))
    pf.join(broadcast(tt), "event_type")
      .withColumn("oof_mean_cents",
        expr("(s_t - s) div greatest(n_t - n, 1)"))
      .select(col("event_type"), col("fold"), col("n"),
        col("oof_mean_cents"))
  }

  private val targetEncodeOofSql =
    s"""WITH pf AS (
       |  SELECT event_type,
       |    CAST(${PortableHash.h48Sql("CAST(event_id AS VARCHAR)")} % 5
       |      AS INTEGER) AS fold,
       |    count(*)::BIGINT AS n,
       |    CAST(sum(CAST(round(value * 100e0) AS BIGINT)) AS BIGINT) AS s
       |  FROM events GROUP BY 1, 2
       |), tt AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_t,
       |    CAST(sum(s) AS BIGINT) AS s_t
       |  FROM pf GROUP BY event_type
       |)
       |SELECT pf.event_type, pf.fold, pf.n,
       |  (tt.s_t - pf.s) // greatest(tt.n_t - pf.n, 1) AS oof_mean_cents
       |FROM pf JOIN tt USING (event_type)""".stripMargin

  // ---- recency-decay sampling weights -------------------------------------------
  /** Recency-weighted sampling mass per event type: each event carries
    * weight `2^(−age/7d)` — implemented as the EXACT integer
    * `1e6 >> (age_days div 7)`, a whole-week half-life bit shift, so both
    * engines agree bit-for-bit with no float pow — and the per-type sum /
    * mean is the freshness-biased sampling budget a training pipeline
    * allocates when newer data should dominate. Map-only weight + one
    * rollup; the corpus max-day anchor is a broadcast 1-row frame.
    */
  def recencyWeights(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      expr("ts div 86400000000000").as("day"))
    val anchor = ev.agg(max(col("day")).as("d1"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("w_ppm",
        expr("shiftright(1000000L, CAST((d1 - day) div 7 AS INT))"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("w_ppm")).as("w_sum_ppm"))
      .withColumn("w_mean_ppm", expr("w_sum_ppm div n_events"))
  }

  private val recencyWeightsSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
      |), a AS (SELECT max(day) AS d1 FROM ev)
      |SELECT event_type, count(*)::BIGINT AS n_events,
      |  CAST(sum(1000000 >> CAST((d1 - day) // 7 AS INTEGER)) AS BIGINT)
      |    AS w_sum_ppm,
      |  CAST(sum(1000000 >> CAST((d1 - day) // 7 AS INTEGER)) AS BIGINT)
      |    // count(*) AS w_mean_ppm
      |FROM ev CROSS JOIN a GROUP BY event_type""".stripMargin

  // ---- Brier reliability ------------------------------------------------------

  /** Brier-score reliability table for a probabilistic classifier: the
    * predictor is the capped English-stopword count (p̂ = min(count,10)/10,
    * an 11-cell probability grid), the outcome is the corpus `lang` tag.
    * Per probability cell: n, positives, the EXACT integer squared-error
    * sum in (milli)² units — per-row square ≤ 10⁶ so the sum holds to
    * ~9·10¹² rows in int64 — and the cell Brier in micro units
    * (truncating div). The Brier score is the PROPER scoring rule a
    * quality/language classifier gate should report instead of accuracy;
    * the per-cell table is its Murphy reliability decomposition. One
    * map-only scan + an 11-row rollup.
    */
  def brierScore(spark: SparkSession, dir: String): DataFrame = {
    val nStop = size(filter(TextFns.tokens(lower(col("text"))),
      t => Seq("the", "of", "and", "to", "in", "is", "it", "that", "for",
        "on").map(s => t === lit(s)).reduce(_ || _)))
    Tables.documents(spark, dir)
      .select(least(nStop, lit(10)).cast("long").as("p_deci"),
        (col("lang") === "en").cast("long").as("y"))
      .withColumn("sq",
        (col("p_deci") * 100 - col("y") * 1000) *
          (col("p_deci") * 100 - col("y") * 1000))
      .groupBy(col("p_deci"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("sq")).as("sum_sq"))
      .withColumn("brier_u", expr("sum_sq div n"))
  }

  private val brierScoreSql = {
    val wl = TextFns.tokensSql("lower(text)")
    val stops = Seq("the", "of", "and", "to", "in", "is", "it", "that",
      "for", "on").map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT least(len(list_filter($wl, x -> list_contains($stops, x))),
       |           10)::BIGINT AS p_deci,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents
       |)
       |SELECT p_deci, count(*) AS n,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(sum((p_deci * 100 - y * 1000) * (p_deci * 100 - y * 1000))
       |    AS BIGINT) AS sum_sq,
       |  CAST(sum((p_deci * 100 - y * 1000) * (p_deci * 100 - y * 1000))
       |    AS BIGINT) // count(*) AS brier_u
       |FROM d GROUP BY p_deci""".stripMargin
  }

  // ---- inverse-propensity-scored policy evaluation ----------------------------

  /** Offline (counterfactual) policy evaluation by inverse-propensity
    * scoring: estimate the mean event value a UNIFORM-over-types target
    * policy would observe, from logs collected under the empirical
    * behavior policy — the core off-policy estimator (Horvitz–Thompson)
    * behind every "would the new sampling mix be better" question asked
    * of logged data. Per-event weight wᵢ = π(aᵢ)/p̂(aᵢ) = N/(K·n_a)
    * depends only on the event's TYPE, so the whole estimate collapses
    * onto the ≤K-row per-type table: naive mean, IPS mean (per-type
    * truncating micro terms, summed), and the effective sample size
    * K²/Σ(1/n_a) that says how much log the reweighting threw away. ONE
    * corpus scan; everything after is K-row arithmetic.
    */
  def ipsPolicyEval(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_a"), sum(col("cents")).as("s_a"))
    val k = perType.agg(count(lit(1)).as("k_types"), sum(col("n_a")).as("n"))
    perType.crossJoin(broadcast(k))
      .agg(first(col("n")).as("n"), first(col("k_types")).as("k_types"),
        expr("(1000000 * sum(s_a)) div first(n)").as("naive_u"),
        sum(expr("(1000000 * s_a) div (k_types * n_a)")).as("ips_u"),
        expr("CAST(round(1000e0 * first(k_types) * first(k_types)" +
          " / sum(1e0 / n_a)) AS BIGINT)").as("ess_milli"))
  }

  private val ipsPolicyEvalSql =
    """WITH t AS (
      |  SELECT event_type, count(*) AS n_a,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s_a
      |  FROM events GROUP BY event_type
      |), k AS (SELECT count(*) AS k_types, CAST(sum(n_a) AS BIGINT) AS n FROM t)
      |SELECT any_value(n) AS n, any_value(k_types) AS k_types,
      |  (1000000 * CAST(sum(s_a) AS BIGINT)) // any_value(n) AS naive_u,
      |  CAST(sum((1000000 * s_a) // (k_types * n_a)) AS BIGINT) AS ips_u,
      |  CAST(round(1000e0 * any_value(k_types) * any_value(k_types)
      |    / sum(1e0 / n_a)) AS BIGINT) AS ess_milli
      |FROM t CROSS JOIN k""".stripMargin

  // ---- cluster purity prune -----------------------------------------------

  /** Cluster-level pruning decision table (the MiniPile/SemDeDup recipe:
    * cluster the corpus, then DROP whole low-quality clusters rather than
    * scoring documents one by one): per k-means cluster, size, the
    * majority label and its purity in basis points, and the keep/drop
    * verdict at ≥ 25 % purity. Consumes the SAME memoized deterministic
    * Lloyd assignment as cluster_sample/semantic_dedup ([[graft.core
    * .Shared]] "kmeans_assignment"), so the expensive part is already
    * paid; everything here is one (cluster × label)-bounded count and a
    * ≤k-row argmax window.
    */
  def clusterPrune(spark: SparkSession, dir: String): DataFrame = {
    val km = LlmPipeline.kmeansCluster(spark, dir)
      .select(col("vec_id"), col("cluster"))
    val lab = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val cell = km.join(lab, "vec_id")
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("c").desc, col("label"))
    cell
      .withColumn("rk", row_number().over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("cluster"))))
      .where(col("rk") === 1)
      .select(col("cluster"), col("n"),
        col("label").as("top_label"),
        expr("(10000 * c) div n").as("purity_bp"),
        (expr("(10000 * c) div n") >= 2500).cast("long").as("kept"))
  }

  private val clusterPruneSql = {
    val km = graft.operators.KMeans.clusterSql(
      "embeddings", "vec_id", "embedding", 8, 3, 64)
    s"""WITH km AS (
       |${km.linesIterator.map("  " + _).mkString("\n")}
       |), cell AS (
       |  SELECT km.cluster, e.label, count(*) AS c
       |  FROM km JOIN embeddings e USING (vec_id)
       |  GROUP BY km.cluster, e.label
       |), r AS (
       |  SELECT cluster, label, c,
       |    row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label)
       |      AS rk,
       |    sum(c) OVER (PARTITION BY cluster) AS n
       |  FROM cell
       |)
       |SELECT cluster, CAST(n AS BIGINT) AS n, label AS top_label,
       |  CAST((10000 * c) // n AS BIGINT) AS purity_bp,
       |  CAST(CASE WHEN (10000 * c) // n >= 2500 THEN 1 ELSE 0 END AS BIGINT)
       |    AS kept
       |FROM r WHERE rk = 1""".stripMargin
  }

  // ---- curriculum shard assignment -------------------------------------------

  private val CurrShards = 8

  /** Difficulty-ordered curriculum shard assignment: each document gets an
    * integer difficulty (the Flesch–Kincaid censuses in truncating milli
    * units — words-per-sentence + syllables-per-word terms), the corpus is
    * globally ranked by (difficulty, doc_id), and rank mod [[CurrShards]]
    * deals documents round-robin into shards — so every shard sees the
    * same difficulty SPECTRUM while the within-shard order ascends (the
    * standard curriculum-with-coverage deal). The global rank is NOT a
    * single-reducer window: range-partition by (difficulty, doc_id),
    * per-partition local ranks, bounded base-offset table broadcast back
    * (the stratified_kfold / doc_offsets device). Readout attests
    * MEMBERSHIP per shard: count, id-sum, difficulty-sum and extremes.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val nonEmpty = (c: Column) => size(filter(c, t => t =!= "")).cast("long")
    val d = Tables.documents(spark, dir).select(
      col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("words"),
      greatest(nonEmpty(split(col("text"), "[^.!?]+")), lit(1L))
        .as("sentences"),
      nonEmpty(split(lower(col("text")), "[^aeiouy]+")).as("syllables"))
      .select(col("doc_id"),
        (expr("(390000 * words) div sentences") +
          expr("(11800000 * syllables) div greatest(words, 1)")).as("diff_m"))
    val parts = graft.core.Materialize(
      d.repartitionByRange(col("diff_m"), col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val base = parts.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .withColumn("base", coalesce(sum(col("c")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("base"))
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("diff_m"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("local", coalesce(count(lit(1)).over(wLocal), lit(0L)))
      .join(broadcast(base), "pid")
      .withColumn("shard", ((col("base") + col("local")) % CurrShards)
        .cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("ids_sum"),
        sum(col("diff_m")).as("diff_sum"),
        min(col("diff_m")).as("diff_min"), max(col("diff_m")).as("diff_max"))
  }

  private val curriculumOrderSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    len($w)::BIGINT AS words,
       |    greatest(len(list_filter(string_split_regex(text, '[^.!?]+'),
       |                             x -> x <> '')), 1)::BIGINT AS sentences,
       |    len(list_filter(string_split_regex(lower(text), '[^aeiouy]+'),
       |                    x -> x <> ''))::BIGINT AS syllables
       |  FROM documents
       |), s AS (
       |  SELECT doc_id,
       |    (390000 * words) // sentences
       |      + (11800000 * syllables) // greatest(words, 1) AS diff_m
       |  FROM d
       |), r AS (
       |  SELECT doc_id, diff_m,
       |    CAST((row_number() OVER (ORDER BY diff_m, doc_id) - 1)
       |      % $CurrShards AS INTEGER) AS shard
       |  FROM s
       |)
       |SELECT shard, count(*) AS n,
       |  CAST(sum(doc_id) AS BIGINT) AS ids_sum,
       |  CAST(sum(diff_m) AS BIGINT) AS diff_sum,
       |  CAST(min(diff_m) AS BIGINT) AS diff_min,
       |  CAST(max(diff_m) AS BIGINT) AS diff_max
       |FROM r GROUP BY shard""".stripMargin
  }

  // ---- int8 quantization error audit ------------------------------------------

  /** Embedding int8-quantization distortion audit: symmetric per-vector
    * int8 (scale = max |component|, code = round(127·x/scale) as the
    * EXACT integer `(254·q + sign(q)·scale) div (2·scale)` — round-half-
    * away-from-zero with no float in the codec), dequantize as
    * code·scale, and report the per-label cosine distortion between the
    * original and reconstructed vectors in micro units. This is the audit
    * that decides whether a 4× smaller serving index is safe — run BEFORE
    * swapping the ANN fleet to int8. All dots are exact integer
    * ([[VectorOps]] contract; deq components ≤ 127·10⁶ keep the 64-dim
    * norms under int64); one map-only scan + ≤|labels| rollup.
    */
  def quantErrorAudit(spark: SparkSession, dir: String): DataFrame = {
    val qv = VectorOps.quantize(col("embedding"))
    val d = Tables.embeddings(spark, dir)
      .select(col("label"), qv.as("qv"))
      .withColumn("scale",
        greatest(array_max(transform(col("qv"), x => abs(x))), lit(1L)))
      .withColumn("deq", expr(
        "transform(qv, x -> ((x * 254 + CAST(sign(x) AS BIGINT) * scale)" +
          " div (scale * 2)) * scale)"))
      .select(col("label"),
        (lit(1000000L) -
          expr("CAST(round(1000000e0 * " +
            "(CAST(dot_q(qv, deq) AS DOUBLE) / " +
            "(sqrt(CAST(dot_q(qv, qv) AS DOUBLE)) * " +
            "sqrt(CAST(dot_q(deq, deq) AS DOUBLE))))) AS BIGINT)"))
          .as("err_u"))
    d.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        expr("sum(err_u) div count(1)").as("mean_err_u"),
        max(col("err_u")).as("max_err_u"))
  }

  private val quantErrorAuditSql = {
    val qv = VectorOps.quantizeSql("embedding")
    val cos = VectorOps.cosineQSql("qv", "deq", 64)
    s"""WITH q AS (
       |  SELECT label, $qv AS qv FROM embeddings
       |), s AS (
       |  SELECT label, qv,
       |    greatest(list_max(list_transform(qv, x -> abs(x))), 1) AS scale
       |  FROM q
       |), z AS (
       |  SELECT label, qv,
       |    list_transform(qv, x ->
       |      ((x * 254 + sign(x)::BIGINT * scale) // (scale * 2)) * scale)
       |      AS deq
       |  FROM s
       |), e AS (
       |  SELECT label,
       |    1000000 - CAST(round(1000000e0 * ($cos)) AS BIGINT) AS err_u
       |  FROM z
       |)
       |SELECT label, count(*) AS n,
       |  CAST(sum(err_u) AS BIGINT) // count(*) AS mean_err_u,
       |  CAST(max(err_u) AS BIGINT) AS max_err_u
       |FROM e GROUP BY label""".stripMargin
  }

  // ---- cluster medoids ----------------------------------------------------------

  /** Medoid (most-central member) of every k-means cluster — the topic
    * EXEMPLAR a curation review reads instead of scrolling raw members,
    * and the representative a coreset/distillation pass keeps first. Per
    * cluster the medoid maximizes the summed within-cluster cosine
    * (micro-rounded per pair, exact integer sums; argmax tie-broken by
    * id) — computed over the SAME memoized Lloyd assignment as
    * cluster_prune/cluster_sample/semantic_dedup, with the pair volume
    * equi-join-bounded to Σnᵢ² (never n²; at deployment k scales with the
    * corpus to keep nᵢ bounded, the semantic_dedup contract). Readout per
    * cluster: medoid id, size, the medoid's mean similarity micro.
    */
  def clusterMedoids(spark: SparkSession, dir: String): DataFrame = {
    val km = LlmPipeline.kmeansCluster(spark, dir)
      .select(col("vec_id"), col("cluster"))
    val qv = Tables.embeddings(spark, dir).select(col("vec_id"),
      VectorOps.quantize(col("embedding")).as("qv"))
    val m = km.join(qv, "vec_id")
    val a = m.select(col("cluster"), col("vec_id").as("a"), col("qv").as("va"))
    val b = m.select(col("cluster"), col("vec_id").as("b"), col("qv").as("vb"))
    val sums = a.join(b, Seq("cluster"))
      .where(col("a") =!= col("b"))
      .select(col("cluster"), col("a"),
        expr("CAST(round(1000000e0 * (CAST(dot_q(va, vb) AS DOUBLE)" +
          " / (sqrt(CAST(dot_q(va, va) AS DOUBLE))" +
          " * sqrt(CAST(dot_q(vb, vb) AS DOUBLE))))) AS BIGINT)").as("c_u"))
      .groupBy(col("cluster"), col("a"))
      .agg(sum(col("c_u")).as("sim_sum"), count(lit(1)).as("n_others"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("sim_sum").desc, col("a"))
    sums.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("cluster"), col("a").as("medoid_id"),
        (col("n_others") + 1).as("n"),
        expr("sim_sum div n_others").as("mean_sim_u"))
  }

  private val clusterMedoidsSql = {
    val km = graft.operators.KMeans.clusterSql(
      "embeddings", "vec_id", "embedding", 8, 3, 64)
    val cos = VectorOps.cosineQSql("a.qv", "b.qv", 64)
    s"""WITH km AS MATERIALIZED (
       |${km.linesIterator.map("  " + _).mkString("\n")}
       |), m AS MATERIALIZED (
       |  SELECT km.vec_id, km.cluster,
       |    ${VectorOps.quantizeSql("e.embedding")} AS qv
       |  FROM km JOIN embeddings e USING (vec_id)
       |), s AS (
       |  SELECT a.cluster, a.vec_id AS a,
       |    CAST(sum(CAST(round(1000000e0 * ($cos)) AS BIGINT)) AS BIGINT)
       |      AS sim_sum,
       |    count(*) AS n_others
       |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
       |  GROUP BY a.cluster, a.vec_id
       |), r AS (
       |  SELECT cluster, a, sim_sum, n_others,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY sim_sum DESC, a) AS rk
       |  FROM s
       |)
       |SELECT cluster, a AS medoid_id,
       |  CAST(n_others + 1 AS BIGINT) AS n,
       |  sim_sum // n_others AS mean_sim_u
       |FROM r WHERE rk = 1""".stripMargin
  }

  // ---- rolling-origin (forward-chaining) CV splits ----------------------------

  /** Rolling-origin evaluation splits over the event stream — the
    * time-series answer to k-fold (training on the future of your test
    * window is the classic leakage): three origins at 40/60/80 % of the
    * corpus's own day range, train = everything before the origin, test =
    * the 5 days from it. Per origin the readout is the split census plus
    * the two numbers that decide whether the split is usable: how many
    * test-window users have train history (warm) and how many are cold —
    * a recommender eval with 90 % cold users is measuring the fallback,
    * not the model. Shape: one (user, day)-distinct frame joined to a
    * broadcast 3-row origin table derived from the corpus's own (min,
    * max) bounds; nothing here is calendar-pinned or data-quadratic.
    */
  def rollingOriginCv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("ts div 86400000000000").as("day"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // 3 rows, two broadcast consumers — materialized so each reference
    // does not re-run the full-scan min/max bounds aggregate
    val origins = graft.core.Materialize(
      bounds.select(explode(array(lit(40L), lit(60L), lit(80L)))
        .as("origin_pct"), col("d0"), col("d1"))
        .withColumn("t", expr("d0 + ((d1 - d0) * origin_pct) div 100"))
        .select(col("origin_pct"), col("t")))
    // event-level census per origin
    val census = ev.crossJoin(broadcast(origins))
      .withColumn("split",
        when(col("day") < col("t"), "train")
          .when(col("day") < col("t") + 5, "test"))
      .where(col("split").isNotNull)
      .groupBy(col("origin_pct"))
      .agg(sum((col("split") === "train").cast("long")).as("n_train"),
        sum((col("split") === "test").cast("long")).as("n_test"),
        sum(when(col("split") === "test", col("cents"))
          .otherwise(lit(0L))).as("test_cents"))
    // user-level warm/cold census per origin, from a (user, day) distinct
    // frame (bounded by users × days, never event-sized)
    val ud = ev.select(col("user_id"), col("day")).distinct()
    val users = ud.crossJoin(broadcast(origins))
      .groupBy(col("origin_pct"), col("user_id"))
      .agg(max((col("day") < col("t")).cast("long")).as("has_train"),
        max((col("day") >= col("t") && col("day") < col("t") + 5)
          .cast("long")).as("has_test"))
      .where(col("has_test") === 1)
      .groupBy(col("origin_pct"))
      .agg(sum(col("has_train")).as("warm_users"),
        sum(lit(1L) - col("has_train")).as("cold_users"))
    census.join(users, "origin_pct")
  }

  private val rollingOriginCvSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |o AS (
      |  SELECT origin_pct, d0 + ((d1 - d0) * origin_pct) // 100 AS t
      |  FROM b, (SELECT unnest([40, 60, 80]) AS origin_pct)
      |), census AS (
      |  SELECT origin_pct,
      |    CAST(sum(CASE WHEN day < t THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |    CAST(sum(CASE WHEN day >= t AND day < t + 5 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN day >= t AND day < t + 5 THEN cents ELSE 0 END)
      |      AS BIGINT) AS test_cents
      |  FROM ev CROSS JOIN o
      |  WHERE day < t + 5
      |  GROUP BY origin_pct
      |), ud AS (SELECT DISTINCT user_id, day FROM ev),
      |u AS (
      |  SELECT origin_pct, user_id,
      |    max(CASE WHEN day < t THEN 1 ELSE 0 END) AS has_train,
      |    max(CASE WHEN day >= t AND day < t + 5 THEN 1 ELSE 0 END) AS has_test
      |  FROM ud CROSS JOIN o
      |  GROUP BY origin_pct, user_id
      |), uu AS (
      |  SELECT origin_pct,
      |    CAST(sum(has_train) AS BIGINT) AS warm_users,
      |    CAST(sum(1 - has_train) AS BIGINT) AS cold_users
      |  FROM u WHERE has_test = 1 GROUP BY origin_pct
      |)
      |SELECT census.origin_pct, n_train, n_test, test_cents,
      |  warm_users, cold_users
      |FROM census JOIN uu USING (origin_pct)""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("psi_drift", psiDrift, Some(psiDriftSql)),
    QueryDef("stratified_kfold", stratifiedKfold, Some(stratifiedKfoldSql)),
    QueryDef("ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("label_noise_audit", labelNoiseAudit, Some(labelNoiseAuditSql)),
    QueryDef("bradley_terry", bradleyTerry, Some(bradleyTerrySql)),
    QueryDef("conformal_interval", conformalInterval,
      Some(conformalIntervalSql)),
    QueryDef("span_corruption", spanCorruption, Some(spanCorruptionSql)),
    QueryDef("multi_epoch_schedule", multiEpochSchedule,
      Some(multiEpochScheduleSql)),
    QueryDef("fleiss_kappa", fleissKappa, Some(fleissKappaSql)),
    QueryDef("leakage_audit", leakageAudit, Some(leakageAuditSql)),
    QueryDef("target_encode_oof", targetEncodeOof, Some(targetEncodeOofSql)),
    QueryDef("recency_weights", recencyWeights, Some(recencyWeightsSql)),
    QueryDef("brier_score", brierScore, Some(brierScoreSql)),
    QueryDef("ips_policy_eval", ipsPolicyEval, Some(ipsPolicyEvalSql)),
    QueryDef("cluster_prune", clusterPrune, Some(clusterPruneSql)),
    QueryDef("curriculum_order", curriculumOrder, Some(curriculumOrderSql)),
    QueryDef("quant_error_audit", quantErrorAudit, Some(quantErrorAuditSql)),
    QueryDef("rolling_origin_cv", rollingOriginCv, Some(rollingOriginCvSql)),
    QueryDef("cluster_medoids", clusterMedoids, Some(clusterMedoidsSql)),
  )
}
