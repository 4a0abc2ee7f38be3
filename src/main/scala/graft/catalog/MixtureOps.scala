package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns

/** Data-mixing and data-selection operators — the "which data, how much of
  * each" layer of a training-data pipeline: temperature-scaled language
  * mixtures, DSIR-style importance weights, per-source quality calibration,
  * boilerplate-template detection, and the Heaps-law vocabulary growth
  * curve a corpus datasheet plots.
  *
  * Conventions as everywhere in the catalog: pure column expressions
  * (whole-stage codegen, no UDFs), exact integer math for anything the
  * oracle hashes (`div`, permille/basis points, the `length(bin(x))`
  * floor-log₂ device), and a DuckDB twin per query.
  */
object MixtureOps extends QueryModule {

  // ---- temperature-scaled mixture -----------------------------------------

  /** Temperature-scaled language sampling rates (α = 1/2): w_l ∝ √n_l, the
    * standard multilingual-training device that up-samples low-resource
    * languages relative to proportional sampling (α=1) without going
    * uniform (α=0). √ is the one non-rational step; it stays attestable
    * because both engines take the correctly-rounded IEEE-754 sqrt of the
    * SAME exact integer n_l·10⁶ and floor it — for √(n·10⁶) < 2²⁶ (n up to
    * ~4.5·10⁹ docs) floor∘sqrt cannot straddle an integer boundary, so the
    * weights are bit-identical.
    *
    * Scale shape: one partial-aggregated count by language + a ≤|langs|-row
    * broadcast of the weight total — nothing else touches the corpus.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_q", floor(sqrt(col("n_docs") * 1000000L)).cast("long"))
    n.crossJoin(broadcast(n.agg(sum(col("weight_q")).as("w_total"))))
      .withColumn("rate_permille", expr("(1000 * weight_q) div w_total"))
      .withColumn("expected_docs", expr("(n_docs * rate_permille) div 1000"))
      .select("lang", "n_docs", "weight_q", "rate_permille", "expected_docs")
  }

  private val temperatureMixSql =
    """WITH n AS (
      |  SELECT lang, count(*)::BIGINT AS n_docs,
      |         CAST(floor(sqrt(count(*) * 1000000)) AS BIGINT) AS weight_q
      |  FROM documents GROUP BY lang
      |), t AS (SELECT CAST(sum(weight_q) AS BIGINT) AS w_total FROM n)
      |SELECT lang, n_docs, weight_q,
      |  CAST((1000 * weight_q) // w_total AS BIGINT) AS rate_permille,
      |  CAST((n_docs * ((1000 * weight_q) // w_total)) // 1000 AS BIGINT)
      |    AS expected_docs
      |FROM n CROSS JOIN t""".stripMargin

  // ---- DSIR importance weights --------------------------------------------

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-doc log-likelihood ratio of a
    * TARGET unigram distribution (here the English slice — the
    * high-resource proxy every DSIR deployment starts from) against the
    * RAW corpus distribution. Docs scoring high are "target-like" and get
    * up-sampled. Laplace-smoothed (+1 over V types) so raw-only terms
    * contribute a finite penalty; log₂ via the catalog's `length(bin(x))`
    * floor-log₂ device, so both engines sum identical integers:
    * bits(doc) = Σ_tokens [⌊log₂ (R+V)/(tf_r+1)⌋ − ⌊log₂ (T+V)/(tf_t+1)⌋].
    *
    * Scale shape: two vocabulary-sized count tables joined to the exploded
    * corpus by term (the [[TextAnalysis.tokenSurprisal]] shape) + one 1-row
    * totals broadcast; no driver action.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightFrame(Tables.documents(spark, dir), col("lang") === "en")

  /** Core of [[dsirWeights]] over any (doc_id, text) frame and target
    * predicate — factored so the spec can drive it with a corpus whose
    * target slice has a genuinely distinct vocabulary (the driver corpus
    * shares one vocabulary across languages with near-proportional
    * frequencies, so its DSIR signal is legitimately ≈0 — the integer
    * floor-log₂ weights round to zero there, which the catalog row
    * attests; discrimination is proven on the hand corpus instead).
    */
  def dsirWeightFrame(docs: DataFrame, isTarget: Column): DataFrame = {
    val ex = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(TextFns.tokens(col("text"))).as("term"))
    // raw and target counts in ONE conditional aggregate (they were two
    // separate term rollups + a vocabulary join — a whole extra corpus
    // tokenize pass); sum(when) ≡ the left-join + coalesce(tf_t, 0).
    // Vocabulary-sized and consumed twice (totals + scoring), so
    // materialized; the token-level frame is deliberately NOT checkpointed
    // (its bytes exceed the documents themselves — re-tokenizing the
    // per-doc scoring pass is the cheaper side of that trade at any scale)
    val counts = graft.core.Materialize(ex.groupBy("term")
      .agg(count(lit(1)).as("tf_r"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tf_t")))
    val totals = counts.agg(sum("tf_r").as("r_total"), sum("tf_t").as("t_total"),
      count(lit(1)).as("v"))
    val scored = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        ((length(bin(col("r_total") + col("v"))) - length(bin(col("tf_r") + 1))) -
          (length(bin(col("t_total") + col("v"))) - length(bin(col("tf_t") + 1))))
          .cast("long").as("bits"))
    ex.join(scored, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("weight_bits"))
      .withColumn("avg_weight_q",
        floor(col("weight_bits").cast("double") * 1000000 / col("n_tokens")))
  }

  private val dsirWeightsSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, lang, $w AS w FROM documents
       |), e AS (
       |  SELECT doc_id, lang, unnest(w) AS term FROM t
       |), raw AS (
       |  SELECT term, count(*)::BIGINT AS tf_r FROM e GROUP BY term
       |), tgt AS (
       |  SELECT term, count(*)::BIGINT AS tf_t FROM e WHERE lang = 'en'
       |  GROUP BY term
       |), c AS (
       |  SELECT raw.term, tf_r, coalesce(tf_t, 0)::BIGINT AS tf_t
       |  FROM raw LEFT JOIN tgt ON raw.term = tgt.term
       |), tot AS (
       |  SELECT CAST(sum(tf_r) AS BIGINT) AS r_total,
       |         CAST(sum(tf_t) AS BIGINT) AS t_total,
       |         count(*)::BIGINT AS v
       |  FROM c
       |), s AS (
       |  SELECT c.term,
       |    ((len(bin(r_total + v)) - len(bin(tf_r + 1))) -
       |     (len(bin(t_total + v)) - len(bin(tf_t + 1))))::BIGINT AS bits
       |  FROM c CROSS JOIN tot
       |)
       |SELECT e.doc_id, count(*) AS n_tokens,
       |  CAST(sum(bits) AS BIGINT) AS weight_bits,
       |  floor(sum(bits)::DOUBLE * 1000000 / count(*))::BIGINT AS avg_weight_q
       |FROM e JOIN s ON e.term = s.term
       |GROUP BY e.doc_id""".stripMargin
  }

  // ---- per-source quality calibration -------------------------------------

  /** Per-source percentile calibration of a quality metric (token count):
    * rank-normalize WITHIN each source so a "top decile" filter means top
    * decile of every feed, not a global cut biased toward verbose sources —
    * the debiasing step before any cross-source quality threshold.
    * pct‰ = 1000·(rank−1) div (n_src−1) in exact integer math (deterministic
    * (metric, doc_id) rank order); reported as per-(source, decile-band)
    * occupancy with the raw-metric band edges.
    *
    * Scale shape: one window pass partitioned by source (the corpus
    * shuffles once on the source key) + a bounded |sources|×10 rollup.
    */
  def sourceCalibrate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val ranked = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("n_tok"), col("doc_id"))))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("band",
        least(expr("((1000 * (rk - 1)) div greatest(n_src - 1, 1)) div 100"),
          lit(9L)))
    ranked.groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tok").as("min_tok"), max("n_tok").as("max_tok"))
  }

  private val sourceCalibrateSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH d AS (
       |  SELECT doc_id, source, len($w)::BIGINT AS n_tok FROM documents
       |), r AS (
       |  SELECT source, n_tok,
       |    row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY source) AS n_src
       |  FROM d
       |), p AS (
       |  SELECT source, n_tok,
       |    least(((1000 * (rk - 1)) // greatest(n_src - 1, 1)) // 100, 9) AS band
       |  FROM r
       |)
       |SELECT source, band, count(*) AS n_docs,
       |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
       |FROM p GROUP BY source, band""".stripMargin
  }

  // ---- boilerplate-template detection -------------------------------------

  /** Boilerplate-template detection by leading-prefix fingerprint: docs
    * sharing their first 8 tokens verbatim are flagged as instances of a
    * template (site headers, license preambles, scraper chrome) — the
    * cheap pre-pass a web-corpus pipeline runs BEFORE shingle-level dedup,
    * because a template family collapses under one equi-join key here but
    * costs a near-dup clique there. Reported per source (templated-doc and
    * distinct-template counts).
    *
    * Scale shape: one prefix-key aggregate + one join back on the prefix
    * (both shuffle on the prefix hash) + a ≤|sources| rollup; no
    * similarity machinery at all.
    */
  def prefixDup(spark: SparkSession, dir: String): DataFrame = {
    val pre = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", slice(col("toks"), 1, 8)).as("prefix"))
    val groups = pre.groupBy("prefix").agg(count(lit(1)).as("n_share"))
    pre.join(groups, "prefix")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_share") > 1, 1L).otherwise(0L)).as("n_templated"),
        countDistinct(when(col("n_share") > 1, col("prefix"))).as("n_templates"))
  }

  private val prefixDupSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH p AS (
       |  SELECT doc_id, source, array_to_string(($w)[1:8], ' ') AS prefix
       |  FROM documents
       |), g AS (
       |  SELECT prefix, count(*)::BIGINT AS n_share FROM p GROUP BY prefix
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN n_share > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_templated,
       |  count(DISTINCT CASE WHEN n_share > 1 THEN p.prefix END)::BIGINT
       |    AS n_templates
       |FROM p JOIN g ON p.prefix = g.prefix
       |GROUP BY source""".stripMargin
  }

  // ---- Heaps-law vocabulary growth ----------------------------------------

  /** Vocabulary growth curve (Heaps' law): new and cumulative vocabulary
    * types per ingestion-order decile — the datasheet plot that answers
    * "is the corpus still contributing new vocabulary, or has it
    * saturated". Deciles come from the doc_id RANGE (a 1-row max
    * broadcast), not a global rank sort — at 100 TB the same bucketing
    * falls out of parquet footer min/max stats; each term's first decile
    * is a vocabulary-sized min-aggregate. The only window runs over the
    * ≤10-row decile frame (the cumulative sums), which is driver-trivial.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(max(col("doc_id")).as("max_id"))
    val byDoc = docs.crossJoin(broadcast(mx))
      .select(col("doc_id"),
        expr("(10 * doc_id) div (max_id + 1)").as("decile"),
        TextFns.tokens(col("text")).as("toks"))
    val docAgg = byDoc.groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
    val newTypes = byDoc.select(col("decile"), explode(col("toks")).as("term"))
      .groupBy("term").agg(min("decile").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docAgg.join(newTypes, Seq("decile"), "left")
      .select(col("decile"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types", sum("new_types").over(w))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
  }

  private val vocabGrowthSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
       |d AS (
       |  SELECT doc_id, (10 * doc_id) // (max_id + 1) AS decile, $w AS w
       |  FROM documents CROSS JOIN mx
       |), da AS (
       |  SELECT decile, count(*) AS n_docs,
       |         CAST(sum(len(w)) AS BIGINT) AS n_tokens
       |  FROM d GROUP BY decile
       |), e AS (
       |  SELECT decile, unnest(w) AS term FROM d
       |), fs AS (
       |  SELECT term, min(decile) AS decile FROM e GROUP BY term
       |), nt AS (
       |  SELECT decile, count(*) AS new_types FROM fs GROUP BY decile
       |)
       |SELECT da.decile, n_docs, n_tokens,
       |  coalesce(nt.new_types, 0)::BIGINT AS new_types,
       |  CAST(sum(coalesce(nt.new_types, 0))
       |    OVER (ORDER BY da.decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS cum_types,
       |  CAST(sum(n_tokens)
       |    OVER (ORDER BY da.decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS cum_tokens
       |FROM da LEFT JOIN nt ON da.decile = nt.decile""".stripMargin
  }

  // ---- water-filling token-budget allocation -----------------------------------

  /** Water-filling allocation of a token budget across sources: every
    * source receives min(supply, L) tokens where the water level L is the
    * largest integer with Σ min(supplyₛ, L) ≤ budget — the
    * equal-treatment-up-to-supply allocation behind "cap every feed at
    * the same level, let small feeds keep everything" mixture policies
    * (the supply-capped complement of [[temperatureMix]]'s rate scaling
    * and [[TrainingOps]]' multi_epoch_schedule). The budget here is half
    * the corpus's own token mass (broadcast 1-row frame — calendar- and
    * scale-free). Finding L is the classic sorted-prefix scan, run
    * ENTIRELY on the ≤|sources|-row supply table: ascending-supply rank,
    * prefix sums, first row whose candidate level (remaining budget
    * spread over remaining sources, truncating div) fits under its own
    * supply. One corpus scan for supplies; everything after is
    * sources-bounded.
    */
  def waterfillBudget(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("supply"))
    val budget = sup.agg(expr("sum(supply) div 2").as("budget"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("supply"), col("source"))
    val ranked = sup.crossJoin(broadcast(budget))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prefix", coalesce(sum(col("supply")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("supply"), col("source"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .withColumn("cand", expr("(budget - prefix) div (n_src - rn + 1)"))
    // first valid row by rank via a null-skipping struct-min (min and
    // union+limit are both order-unsafe); no valid row ⇔ the budget
    // covers every supply, then level = max supply
    val lvl = ranked.agg(
        min(when(col("cand") <= col("supply"),
          struct(col("rn"), col("cand")))).as("s"),
        max(col("supply")).as("mx"))
      .select(coalesce(col("s.cand"), col("mx")).as("level"))
    ranked.crossJoin(broadcast(lvl))
      .select(col("source"), col("supply"),
        least(col("supply"), col("level")).as("alloc"),
        col("level"), col("budget"))
  }

  private[catalog] val waterfillBudgetSql = {
    val wtok = graft.functions.TextFns.tokensSql("text")
    s"""WITH sup AS (
       |  SELECT source, CAST(sum(len($wtok)) AS BIGINT) AS supply
       |  FROM documents GROUP BY source
       |), b AS (SELECT CAST(sum(supply) // 2 AS BIGINT) AS budget FROM sup),
       |r AS (
       |  SELECT source, supply, budget,
       |    row_number() OVER (ORDER BY supply, source) AS rn,
       |    coalesce(sum(supply) OVER (ORDER BY supply, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
       |    count(*) OVER () AS n_src
       |  FROM sup CROSS JOIN b
       |), c AS (
       |  SELECT *, (budget - prefix) // (n_src - rn + 1) AS cand FROM r
       |), lvl AS (
       |  SELECT coalesce(
       |    (SELECT cand FROM c WHERE cand <= supply ORDER BY rn LIMIT 1),
       |    (SELECT max(supply) FROM sup)) AS level
       |)
       |SELECT source, supply,
       |  CAST(least(supply, level) AS BIGINT) AS alloc,
       |  CAST(level AS BIGINT) AS level,
       |  budget
       |FROM c CROSS JOIN lvl""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("temperature_mix", temperatureMix, Some(temperatureMixSql)),
    QueryDef("waterfill_budget", waterfillBudget, Some(waterfillBudgetSql)),
    QueryDef("dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("source_calibrate", sourceCalibrate, Some(sourceCalibrateSql)),
    QueryDef("prefix_dup", prefixDup, Some(prefixDupSql)),
    QueryDef("vocab_growth", vocabGrowth, Some(vocabGrowthSql)),
  )
}
