package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns

/** Round-9 curation / table-maintenance operators: CDC change-log apply,
  * training-batch padding economics, code-vs-prose detection, hapax-rate
  * vocabulary QA, and tokenizer fertility — the data-engineering and
  * corpus-QA readouts a production training-data pipeline runs between
  * ingestion and packing.
  *
  * Conventions as everywhere in the catalog: pure column expressions
  * (whole-stage codegen, no UDFs), exact integer math for anything the
  * oracle hashes (`div`, cents, basis points via ×10000), and a DuckDB
  * twin per query.
  */
object CurationOps extends QueryModule {

  // ---- CDC apply ----------------------------------------------------------

  /** Change-data-capture apply: fold an ordered change log (insert/update/
    * delete ops with per-key sequence numbers) into a snapshot and report
    * the resulting table's per-status profile. THE table-maintenance
    * primitive behind every warehouse "merge the day's changes" job — and
    * the batch twin of a streaming upsert sink.
    *
    * The change log derives deterministically from the snapshot itself (the
    * corpus ships no separate log): keys ≡1 (mod 9) receive TWO updates
    * (seq 1 then seq 2 — latest-wins must pick seq 2's +222 price, so a
    * wrong sort order is a red row, not a tie), keys ≡4 (mod 9) a delete,
    * and keys ≡7 (mod 9) spawn a new key (+10⁹) insert.
    *
    * Scale shape: ONE window pass partitioned by key (latest-seq-wins is
    * `row_number` over seq DESC), no join at all — snapshot and log flow
    * from a single table scan ([[changeLegs]]) and shuffle once on the
    * key, exactly how a 100 TB MERGE shapes when the log is a meaningful
    * fraction of the table. (When the log is
    * tiny relative to the table, [[IoCatalog.upsertPartitioned]]'s
    * touched-partition rewrite is the right tool — these are the two ends
    * of the same maintenance spectrum.) Prices in exact integer cents
    * (`floor(p·100 + 0.5)` — identical IEEE in both engines).
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val all = changeLegs(cdcSnapshot(spark, dir), withSnapshot = true)
    val latest = all
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .where(col("rn") === 1 && col("op") =!= "D")
    latest.groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("sum_price_cents"))
  }

  /** The (k, status, price_cents) snapshot projection the three CDC-family
    * queries (cdc_apply / ivm_agg / snapshot_diff) all start from.
    */
  private[catalog] def cdcSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"))

  /** The deterministic CDC change log shared by cdc_apply / ivm_agg /
    * snapshot_diff, derived in ONE pass over the snapshot instead of one
    * scan per leg: each snapshot row emits its legs as a conditional array
    * of (k, status, price_cents, seq, op) structs that a single generator
    * explodes — the identical row multiset to the former four union
    * branches (same mod-9 filters, same arithmetic, same types), but the
    * table is read once. Four full-table scans per query is exactly the
    * "passes you don't need" shape at 100 TB (each union branch re-decoded
    * the whole parquet table); with `withSnapshot` the snapshot itself
    * rides along as the seq-0 insert leg, making cdc_apply's ENTIRE input
    * one scan (was five).
    */
  private[catalog] def changeLegs(snap: DataFrame,
      withSnapshot: Boolean): DataFrame = {
    def leg(k: Column, status: Column, cents: Column,
            seq: Long, op: String): Column =
      struct(k.as("k"), status.as("status"), cents.as("price_cents"),
        lit(seq).as("seq"), lit(op).as("op"))
    val m9 = pmod(col("k"), lit(9))
    val legs = Seq(
      when(m9 === 1,
        leg(col("k"), col("status"), col("price_cents") + 111, 1L, "U")),
      when(m9 === 1,
        leg(col("k"), col("status"), col("price_cents") + 222, 2L, "U")),
      when(m9 === 4,
        leg(col("k"), col("status"), col("price_cents"), 1L, "D")),
      when(m9 === 7,
        leg(col("k") + 1000000000L, lit("N"), col("price_cents") + 5,
          1L, "I")))
    val all =
      if (withSnapshot)
        leg(col("k"), col("status"), col("price_cents"), 0L, "I") +: legs
      else legs
    snap
      .select(explode(filter(array(all: _*), c => c.isNotNull)).as("c"))
      .select(col("c.k").as("k"), col("c.status").as("status"),
        col("c.price_cents").as("price_cents"), col("c.seq").as("seq"),
        col("c.op").as("op"))
  }

  private val cdcApplySql =
    s"""WITH snap AS (
       |  SELECT o_orderkey AS k, o_orderstatus AS status,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
       |         0::BIGINT AS seq, 'I' AS op
       |  FROM orders
       |), log AS (
       |  SELECT k, status, price_cents + 111 AS price_cents, 1::BIGINT AS seq, 'U' AS op
       |  FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents + 222, 2::BIGINT, 'U' FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents, 1::BIGINT, 'D' FROM snap WHERE k % 9 = 4
       |  UNION ALL
       |  SELECT k + 1000000000, 'N', price_cents + 5, 1::BIGINT, 'I'
       |  FROM snap WHERE k % 9 = 7
       |), merged AS (
       |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
       |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM log)
       |)
       |SELECT status, count(*) AS n_rows,
       |       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents
       |FROM merged WHERE rn = 1 AND op <> 'D'
       |GROUP BY status""".stripMargin

  // ---- padding economics --------------------------------------------------

  /** Maximum packed sequence length for [[padEfficiency]] — docs longer
    * than this truncate (their bucket is the cap itself, zero waste). */
  private val MaxSeqLen = 512L

  /** Training-batch padding economics: bucket documents by
    * next-power-of-two token length (the standard length-bucketing batch
    * strategy) and report each bucket's padded-slot waste in basis points.
    * This is the readout that decides between padding buckets and
    * [[LlmPipeline]]-style sequence packing — at 100 TB the waste column IS
    * the GPU bill. Map-only per doc (the power-of-two arithmetic is the
    * catalog's `length(bin(n))` floor-log₂ device), one bounded aggregate
    * (≤ log₂(cap) buckets).
    */
  def padEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val n = size(TextFns.tokens(col("text"))).cast("long")
    // next power of two via the floor-log₂ device: length(bin(n)) is
    // floor(log₂ n)+1 for n ≥ 1 (the Scala `shiftleft` helper only takes a
    // literal shift, so the column-shift goes through expr)
    val cap = least(
      when(expr("shiftleft(1L, length(bin(n_tok)) - 1)") === col("n_tok"),
        col("n_tok"))
        .otherwise(expr("shiftleft(1L, length(bin(n_tok)))")),
      lit(MaxSeqLen))
    Tables.documents(spark, dir)
      .select(n.as("n_tok"))
      .where(col("n_tok") >= 1)
      .withColumn("cap", cap)
      .withColumn("counted", least(col("n_tok"), lit(MaxSeqLen)))
      .groupBy(col("cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("counted")).as("sum_tokens"),
        sum(col("cap") - col("counted")).as("padded_slots"))
      .withColumn("waste_bp",
        expr("(10000 * padded_slots) div (cap * n_docs)"))
  }

  private val padEfficiencySql = {
    val w = TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT len($w)::BIGINT AS n_tok FROM documents
       |), b AS (
       |  SELECT n_tok,
       |    least(CASE WHEN (1::BIGINT << (len(bin(n_tok)) - 1)) = n_tok
       |               THEN n_tok
       |               ELSE (1::BIGINT << len(bin(n_tok))) END,
       |          $MaxSeqLen) AS cap,
       |    least(n_tok, $MaxSeqLen) AS counted
       |  FROM t WHERE n_tok >= 1
       |)
       |SELECT cap, count(*) AS n_docs,
       |  CAST(sum(counted) AS BIGINT) AS sum_tokens,
       |  CAST(sum(cap - counted) AS BIGINT) AS padded_slots,
       |  CAST((10000 * sum(cap - counted)) // (cap * count(*)) AS BIGINT) AS waste_bp
       |FROM b GROUP BY cap""".stripMargin
  }

  // ---- code-vs-prose detection --------------------------------------------

  /** Code-symbol character class (Java ∩ RE2 subset, the [[TextAnalysis]]
    * pii_scrub convention). Plain triple-quoted string: NO escape
    * processing, so the class reads identically in Spark and (via
    * interpolation) DuckDB.
    */
  private val SymbolClass = """[{}();=<>\[\]#]"""

  /** Code-vs-prose detection: per-document code-symbol density in basis
    * points, rolled up per language — the filter signal that keeps (or
    * routes) source code in a text corpus. Symbol counting is the
    * subtraction device `length(text) − length(regexp_replace(text, cls,
    * ''))` — one codegen'd regex pass, no explode, no UDF; the rollup is
    * one partial-aggregated groupBy over ≤|langs| groups. A doc is
    * "codey" at ≥ 3% symbol density (300 bp).
    */
  def codeDetect(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        length(col("text")).cast("long").as("chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), SymbolClass, "")))
          .cast("long").as("symbols"))
      .withColumn("symbol_bp",
        expr("(10000 * symbols) div greatest(chars, 1)"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("symbol_bp") >= 300, 1L).otherwise(0L)).as("n_codey"),
        expr("(10000 * sum(symbols)) div greatest(sum(chars), 1)")
          .as("corpus_symbol_bp"))

  private val codeDetectSql =
    s"""WITH d AS (
       |  SELECT lang, length(text)::BIGINT AS chars,
       |    (length(text) - length(regexp_replace(text, '$SymbolClass', '', 'g')))::BIGINT
       |      AS symbols
       |  FROM documents
       |), s AS (
       |  SELECT lang, chars, symbols,
       |    (10000 * symbols) // greatest(chars, 1) AS symbol_bp
       |  FROM d
       |)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN symbol_bp >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_codey,
       |  CAST((10000 * sum(symbols)) // greatest(sum(chars), 1) AS BIGINT)
       |    AS corpus_symbol_bp
       |FROM s GROUP BY lang""".stripMargin

  // ---- hapax rate ----------------------------------------------------------

  /** Hapax-legomena rate per language: the fraction of the vocabulary that
    * occurs exactly once (basis points). The classic corpus-health signal —
    * OCR noise, mojibake and boilerplate each move it in a known
    * direction, and a tokenizer-vocabulary build reads it directly (hapax
    * types never earn merges). Shape: one exploded token count
    * (vocabulary-bounded partial agg — the shuffle carries distinct
    * (lang, token) pairs, never occurrences), one ≤|langs|-row rollup.
    */
  def hapaxRate(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        explode(TextFns.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(col("n")).as("occurrences"))
      .withColumn("hapax_bp", expr("(10000 * hapax) div vocab"))

  private val hapaxRateSql = {
    val w = TextFns.tokensSql("lower(text)")
    s"""WITH c AS (
       |  SELECT lang, tok, count(*) AS n
       |  FROM (SELECT lang, unnest($w) AS tok FROM documents)
       |  GROUP BY lang, tok
       |)
       |SELECT lang, count(*) AS vocab,
       |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       |  CAST(sum(n) AS BIGINT) AS occurrences,
       |  CAST((10000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
       |    AS hapax_bp
       |FROM c GROUP BY lang""".stripMargin
  }

  // ---- tokenizer fertility -------------------------------------------------

  /** BPE-ish word-splitting pattern — [[TextAnalysis.tokenCount]]'s
    * convention, duplicated here because that val is private there and the
    * two queries must stay independently auditable.
    */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Tokenizer fertility per language: subword-tokens-per-word (milli) and
    * characters-per-subword-token (milli) — the numbers that decide
    * whether a tokenizer underserves a language (fertility ≫ 1000 means
    * every word shatters, inflating sequence length and cost for that
    * language). Complements [[TextAnalysis.tokenCount]] (volumes, by
    * source) with the per-language RATIOS. Map-only counting, one bounded
    * rollup.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("words"),
        sum(col("bpe")).as("subword_tokens"), sum(col("chars")).as("n_chars"))
      .withColumn("fertility_milli",
        expr("(1000 * subword_tokens) div greatest(words, 1)"))
      .withColumn("chars_per_token_milli",
        expr("(1000 * n_chars) div greatest(subword_tokens, 1)"))

  private val tokenizerFertilitySql = {
    val w = TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT lang, len($w)::BIGINT AS ws,
       |    len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS bpe,
       |    length(text)::BIGINT AS chars
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(ws) AS BIGINT) AS words,
       |  CAST(sum(bpe) AS BIGINT) AS subword_tokens,
       |  CAST(sum(chars) AS BIGINT) AS n_chars,
       |  CAST((1000 * sum(bpe)) // greatest(sum(ws), 1) AS BIGINT) AS fertility_milli,
       |  CAST((1000 * sum(chars)) // greatest(sum(bpe), 1) AS BIGINT)
       |    AS chars_per_token_milli
       |FROM t GROUP BY lang""".stripMargin
  }

  // ---- noisy count release -------------------------------------------------

  private[catalog] val NoiseBound = 5L
  private val NoiseSeed = 42

  /** Differential-privacy-SHAPED histogram release: per-event-type counts
    * with bounded additive noise and a non-negativity post-processing
    * clamp — the release pipeline every privacy-reviewed count report
    * runs (aggregate → perturb → clamp → publish, true counts never
    * leave). The noise here is DETERMINISTIC (seeded portable-hash uniform
    * on ±[[NoiseBound]]): real DP calibrates Laplace noise to ε and needs
    * true randomness, which an oracle-attested, bit-reproducible catalog
    * cannot carry — the distributed shape (map-side partial counts, a
    * ≤|types|-row perturbation, no second pass over data) is identical,
    * and swapping the hash for a sampled draw is a one-line change at
    * deployment. Scale: the only data-sized op is the partial-aggregated
    * count.
    */
  def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("true_n"))
      .select(col("event_type"),
        greatest(
          col("true_n") +
            pmod(graft.functions.PortableHash.h48(col("event_type"), NoiseSeed),
              lit(2 * NoiseBound + 1)) - NoiseBound,
          lit(0L)).as("noisy_n"),
        lit(NoiseBound).as("noise_bound"),
        // the no-privacy property travels WITH the release, not only in
        // this scaladoc: deterministic seeded-hash noise is recomputable
        // by anyone holding the seed, so nothing here is protective —
        // downstream consumers must read this marker before treating the
        // release as DP
        lit("NONE_DETERMINISTIC_NOISE").as("privacy"))

  private val dpNoisyCountsSql = {
    val h = graft.functions.PortableHash.h48Sql("event_type", NoiseSeed)
    s"""SELECT event_type,
       |  greatest(count(*) + ($h % ${2 * NoiseBound + 1}) - $NoiseBound, 0)::BIGINT
       |    AS noisy_n,
       |  $NoiseBound::BIGINT AS noise_bound,
       |  'NONE_DETERMINISTIC_NOISE' AS privacy
       |FROM events GROUP BY event_type""".stripMargin
  }

  // ---- incremental view maintenance -------------------------------------------

  /** Incremental maintenance of the per-status (count, Σcents) aggregate
    * under the SAME deterministic change log as [[cdcApply]] — the
    * warehouse pattern where the day's MERGE must also refresh the
    * downstream rollup WITHOUT re-aggregating the table: new_agg =
    * base_agg ⊎ delta_agg, where the delta derives from the log joined to
    * the base rows OF THE CHANGED KEYS ONLY (updates contribute new−old,
    * deletes −old, inserts +new). The base table is touched twice — once
    * for the one-off base aggregate, once as the join's PROBE side on a
    * log-sized key set — never re-aggregated; at 100 TB with a 0.1 % daily
    * log that is the difference between a minutes-long refresh and
    * re-scanning the lake. The oracle recomputes the aggregate from the
    * fully-merged state, so a green row PROVES the delta algebra equals
    * full recomputation.
    */
  def ivmAgg(spark: SparkSession, dir: String): DataFrame = {
    val snap = cdcSnapshot(spark, dir)
    val base = snap.groupBy(col("status"))
      .agg(count(lit(1)).as("bn"), sum(col("price_cents")).as("bc"))
    // the cdc_apply change log, minus the snapshot itself — one scan
    // ([[changeLegs]]), not one per leg
    val latestLog = changeLegs(snap, withSnapshot = false)
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .where(col("rn") === 1)
      .select(col("k"), col("status").as("new_status"),
        col("price_cents").as("new_cents"), col("op"))
    // old row only for changed keys — log-sized probe of the base table
    val old = snap.select(col("k"), col("status").as("old_status"),
      col("price_cents").as("old_cents"))
    val delta = latestLog.join(old, Seq("k"), "left")
      .select(
        when(col("op") === "D", col("old_status"))
          .otherwise(col("new_status")).as("status"),
        when(col("op") === "I", 1L)
          .when(col("op") === "D", -1L).otherwise(0L).as("dn"),
        when(col("op") === "I", col("new_cents"))
          .when(col("op") === "D", -col("old_cents"))
          .otherwise(col("new_cents") - col("old_cents")).as("dc"))
      .groupBy(col("status"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    base.join(delta, Seq("status"), "full_outer")
      .select(col("status"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("sum_price_cents"))
      .where(col("n_rows") > 0)
  }

  // oracle: FULL recomputation over the merged state — identical readout
  // to cdc_apply, which is the point: incremental must equal recompute
  private val ivmAggSql =
    s"""WITH snap AS (
       |  SELECT o_orderkey AS k, o_orderstatus AS status,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
       |         0::BIGINT AS seq, 'I' AS op
       |  FROM orders
       |), log AS (
       |  SELECT k, status, price_cents + 111 AS price_cents, 1::BIGINT AS seq, 'U' AS op
       |  FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents + 222, 2::BIGINT, 'U' FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents, 1::BIGINT, 'D' FROM snap WHERE k % 9 = 4
       |  UNION ALL
       |  SELECT k + 1000000000, 'N', price_cents + 5, 1::BIGINT, 'I'
       |  FROM snap WHERE k % 9 = 7
       |), merged AS (
       |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
       |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM log)
       |)
       |SELECT status, count(*) AS n_rows,
       |       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents
       |FROM merged WHERE rn = 1 AND op <> 'D'
       |GROUP BY status""".stripMargin

  // ---- snapshot diff --------------------------------------------------------------

  /** Table diff between the snapshot and its CDC-merged successor — the
    * per-status added/removed/changed/unchanged census a merge job
    * publishes for review BEFORE the swap (and the audit that catches a
    * bad change log before ivm_agg propagates it to rollups). Runs on the
    * SAME deterministic log as cdc_apply/ivm_agg: one log-sized window +
    * one log-keyed probe of the base table, never two full-table scans
    * diffed row-by-row (the 100 TB anti-pattern); unchanged counts derive
    * as base − touched, a subtraction on the ≤|status| rollup.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val snap = cdcSnapshot(spark, dir)
    // the shared change log in one scan ([[changeLegs]]), not one per leg
    val latest = changeLegs(snap, withSnapshot = false)
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .where(col("rn") === 1)
    val old = snap.select(col("k"), col("status").as("old_status"),
      col("price_cents").as("old_cents"))
    val touched = latest.join(old, Seq("k"), "left")
      .select(
        coalesce(col("old_status"), col("status")).as("status"),
        when(col("op") === "I", 1L).otherwise(0L).as("added"),
        when(col("op") === "D", 1L).otherwise(0L).as("removed"),
        when(col("op") === "U" &&
          col("price_cents") =!= col("old_cents"), 1L)
          .otherwise(0L).as("changed"))
      .groupBy(col("status"))
      .agg(sum(col("added")).as("n_added"),
        sum(col("removed")).as("n_removed"),
        sum(col("changed")).as("n_changed"))
    val base = snap.groupBy(col("status")).agg(count(lit(1)).as("n_base"))
    base.join(touched, Seq("status"), "full_outer")
      .select(col("status"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"),
        (coalesce(col("n_base"), lit(0L)) - coalesce(col("n_removed"), lit(0L))
          - coalesce(col("n_changed"), lit(0L))).as("n_unchanged"))
  }

  private val snapshotDiffSql =
    s"""WITH snap AS (
       |  SELECT o_orderkey AS k, o_orderstatus AS status,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
       |  FROM orders
       |), log AS (
       |  SELECT k, status, price_cents + 111 AS price_cents, 1::BIGINT AS seq, 'U' AS op
       |  FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents + 222, 2::BIGINT, 'U' FROM snap WHERE k % 9 = 1
       |  UNION ALL
       |  SELECT k, status, price_cents, 1::BIGINT, 'D' FROM snap WHERE k % 9 = 4
       |  UNION ALL
       |  SELECT k + 1000000000, 'N', price_cents + 5, 1::BIGINT, 'I'
       |  FROM snap WHERE k % 9 = 7
       |), latest AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
       |    FROM log) t WHERE rn = 1
       |), touched AS (
       |  SELECT coalesce(s.status, l.status) AS status,
       |    CAST(sum(CASE WHEN l.op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |    CAST(sum(CASE WHEN l.op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(sum(CASE WHEN l.op = 'U' AND l.price_cents <> s.price_cents
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
       |  FROM latest l LEFT JOIN snap s USING (k)
       |  GROUP BY coalesce(s.status, l.status)
       |), base AS (
       |  SELECT status, count(*) AS n_base FROM snap GROUP BY status
       |)
       |SELECT coalesce(base.status, touched.status) AS status,
       |  coalesce(n_added, 0) AS n_added,
       |  coalesce(n_removed, 0) AS n_removed,
       |  coalesce(n_changed, 0) AS n_changed,
       |  coalesce(n_base, 0) - coalesce(n_removed, 0) - coalesce(n_changed, 0)
       |    AS n_unchanged
       |FROM base FULL OUTER JOIN touched ON base.status = touched.status""".stripMargin

  // ---- out-of-order lateness census ---------------------------------------------

  /** Out-of-orderness census of the event stream — THE number that sizes a
    * streaming watermark: for each event, its lateness against the high
    * watermark at its arrival (running max event-time over arrival order,
    * arrival ≈ event_id), bucketed into on-time / ≤1 min / ≤1 h / ≤1 d /
    * later. A watermark narrower than the observed tail silently drops
    * those rows; wider holds state longer — this table IS that trade-off.
    * The running max is NOT a single global window: range-partition by
    * arrival, per-partition local running max, and a ≤|partitions|-row
    * prefix-max table broadcast back (the doc_offsets device with max for
    * sum).
    */
  def lateDataAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Materialize
    // the corpus ships no arrival order (event_id is perfectly
    // time-sorted — every event would be on_time), so arrival derives as
    // a DETERMINISTIC multi-source interleave: blocks of 100 events
    // arrive together, intra-block order by portable hash — the shape a
    // reader merging shard streams actually sees. The watermark plumbing
    // and the census are the artifact; production swaps in the log's true
    // arrival column.
    val ev = Tables.events(spark, dir).select(col("event_id"), col("ts"))
      .withColumn("blk", expr("event_id div 100"))
      .withColumn("h", graft.functions.PortableHash.h48(
        col("event_id").cast("string")) % 97)
    val parts = Materialize(
      ev.repartitionByRange(col("blk"), col("h"), col("event_id"))
        .withColumn("pid", spark_partition_id()))
    val base = parts.groupBy(col("pid")).agg(max(col("ts")).as("pmax"))
      .withColumn("prior", max(col("pmax")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid"), col("prior"))
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("blk"), col("h"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Spark's greatest() skips nulls, so hw is null only for the very
    // first arrival (no watermark yet → lateness 0 via the coalesce)
    val hw = greatest(max(col("ts")).over(wLocal), col("prior"))
    val lateNs = greatest(coalesce(hw - col("ts"), lit(0L)), lit(0L))
    parts.join(broadcast(base), "pid")
      .withColumn("late_ns", lateNs)
      .withColumn("bucket",
        when(col("late_ns") === 0, "on_time")
          .when(col("late_ns") <= 60L * 1000000000L, "within_1m")
          .when(col("late_ns") <= 3600L * 1000000000L, "within_1h")
          .when(col("late_ns") <= 86400L * 1000000000L, "within_1d")
          .otherwise("later"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(col("late_ns")).as("max_late_ns"))
  }

  private val lateDataAuditSql = {
    val h = graft.functions.PortableHash.h48Sql("event_id::VARCHAR")
    s"""WITH ev AS (
      |  SELECT event_id, epoch_ns(ts) AS ts, event_id // 100 AS blk,
      |    $h % 97 AS h
      |  FROM events
      |), l AS (
      |  SELECT greatest(coalesce(
      |      max(ts) OVER (ORDER BY blk, h, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts,
      |      0), 0) AS late_ns
      |  FROM ev
      |), b AS (
      |  SELECT CASE WHEN late_ns = 0 THEN 'on_time'
      |              WHEN late_ns <= 60 * 1000000000::BIGINT THEN 'within_1m'
      |              WHEN late_ns <= 3600 * 1000000000::BIGINT THEN 'within_1h'
      |              WHEN late_ns <= 86400 * 1000000000::BIGINT THEN 'within_1d'
      |              ELSE 'later' END AS bucket, late_ns
      |  FROM l
      |)
      |SELECT bucket, count(*) AS n,
      |  CAST(max(late_ns) AS BIGINT) AS max_late_ns
      |FROM b GROUP BY bucket""".stripMargin
  }

  // ---- rule-based filter census (Gopher-style) ------------------------------

  /** The ten-word English stopword profile shared with
    * [[TextAnalysis]]'s lang_id — re-declared here (private there) so the
    * rule census and the language model stay independently evolvable.
    */
  private val EnStops =
    Seq("the", "of", "and", "to", "in", "is", "it", "that", "for", "on")

  /** Per-doc Gopher-rule statistics — the shared map-only pass under both
    * the per-source rollup [[gopherRules]] and the staged admission filter
    * in [[Composites.curationFunnel]], so both consumers apply the SAME
    * rule constants to the SAME integer censuses. Emits one row per doc:
    * `(doc_id, source, n_tok, sum_len, symbols, n_alpha, n_stop,
    * content_key)`; the content key (the [[LlmPipeline.dedupExact]]
    * whitespace-normalized md5) rides along for funnel consumers and is
    * pruned by Catalyst wherever unused.
    */
  private[catalog] def gopherDocStats(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), col("text"), toks.as("w"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("w")).cast("long").as("n_tok"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[#…]", "")))
          .cast("long").as("symbols"),
        size(filter(col("w"), t => t.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha"),
        size(filter(TextFns.tokens(lower(col("text"))),
          t => EnStops.map(s => t === lit(s)).reduce(_ || _))).cast("long")
          .as("n_stop"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("content_key"))
  }

  /** The five Gopher rule predicates over a [[gopherDocStats]] row. */
  private[catalog] def gopherFailWords =
    col("n_tok") < 10 || col("n_tok") > 100000L
  private[catalog] def gopherFailLen =
    col("sum_len") < lit(3L) * col("n_tok") ||
      col("sum_len") > lit(10L) * col("n_tok")
  private[catalog] def gopherFailSym = lit(10L) * col("symbols") > col("n_tok")
  private[catalog] def gopherFailAlpha =
    lit(5L) * col("n_alpha") < lit(4L) * col("n_tok")
  private[catalog] def gopherFailStop = col("n_stop") < 2
  private[catalog] def gopherAdmit =
    !(gopherFailWords || gopherFailLen || gopherFailSym ||
      gopherFailAlpha || gopherFailStop)

  /** DuckDB twin of [[gopherDocStats]] (a complete SELECT over `table`). */
  private[catalog] def gopherDocStatsSql(table: String): String = {
    val w = TextFns.tokensSql("text")
    val wl = TextFns.tokensSql("lower(text)")
    val stops = EnStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT doc_id, source,
       |    len($w)::BIGINT AS n_tok,
       |    coalesce(list_sum(list_transform($w, x -> len(x))), 0)::BIGINT
       |      AS sum_len,
       |    (len(text) - len(regexp_replace(text, '[#…]', '', 'g')))::BIGINT
       |      AS symbols,
       |    len(list_filter($w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
       |      AS n_alpha,
       |    len(list_filter($wl, x -> list_contains($stops, x)))::BIGINT
       |      AS n_stop,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |      AS content_key
       |  FROM $table""".stripMargin
  }

  /** DuckDB twin of [[gopherAdmit]] over [[gopherDocStatsSql]] columns. */
  private[catalog] val gopherAdmitSql =
    "NOT ((n_tok < 10 OR n_tok > 100000) " +
      "OR (sum_len < 3 * n_tok OR sum_len > 10 * n_tok) " +
      "OR (10 * symbols > n_tok) " +
      "OR (5 * n_alpha < 4 * n_tok) " +
      "OR (n_stop < 2))"

  /** Rule-based quality-filter census per source, the Gopher/C4 document
    * filter family (Rae et al. 2021 §A1.1) re-expressed as INTEGER
    * cross-multiplied predicates so no ratio ever leaves exact math:
    * word count in [10, 100 000]; mean word length in [3, 10] chars
    * (3·n ≤ Σlen ≤ 10·n); symbol-to-word ratio ≤ 10 % (`#`/`…` census);
    * ≥ 80 % of words contain a letter; ≥ 2 English stopword occurrences.
    * The readout is the per-source FAIL count of each rule plus the
    * all-rules pass count — the datasheet row that says WHY a feed is
    * losing documents, where [[TextAnalysis.qualityScore]] only says how
    * much. Map-only per doc (one token array, shared subexpressions), one
    * ≤|sources|-row rollup.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val d = gopherDocStats(Tables.documents(spark, dir))
    val fWords = gopherFailWords
    val fLen = gopherFailLen
    val fSym = gopherFailSym
    val fAlpha = gopherFailAlpha
    val fStop = gopherFailStop
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(fWords.cast("long")).as("fail_words"),
        sum(fLen.cast("long")).as("fail_wordlen"),
        sum(fSym.cast("long")).as("fail_symbol"),
        sum(fAlpha.cast("long")).as("fail_alpha"),
        sum(fStop.cast("long")).as("fail_stop"),
        sum((!(fWords || fLen || fSym || fAlpha || fStop)).cast("long"))
          .as("n_pass"))
  }

  private val gopherRulesSql = {
    s"""WITH d AS (
       |  ${gopherDocStatsSql("documents")}
       |), f AS (
       |  SELECT source,
       |    (n_tok < 10 OR n_tok > 100000) AS f_words,
       |    (sum_len < 3 * n_tok OR sum_len > 10 * n_tok) AS f_len,
       |    (10 * symbols > n_tok) AS f_sym,
       |    (5 * n_alpha < 4 * n_tok) AS f_alpha,
       |    (n_stop < 2) AS f_stop
       |  FROM d
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN f_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
       |  CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
       |  CAST(sum(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol,
       |  CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
       |  CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
       |  CAST(sum(CASE WHEN NOT (f_words OR f_len OR f_sym OR f_alpha OR f_stop)
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM f GROUP BY source""".stripMargin
  }

  // ---- readability ----------------------------------------------------------

  /** Flesch–Kincaid grade level per language from three INTEGER run
    * censuses — words (whitespace tokens), sentences (maximal `[.!?]`
    * runs, floored at 1 per doc), syllables (maximal `[aeiouy]` runs in
    * the lowercased text, the standard cheap approximation) — combined
    * with the published constants only at the final micro-rounded step,
    * over LANG-LEVEL totals (so the one float expression runs on ≤|langs|
    * rows, not per doc). The curation use: readability stratifies a
    * pretraining mix the way quality bands do, and kids/legal/technical
    * feeds separate by two whole grades. Run counting is split-and-count
    * (`split(text, '[^class]+')` non-empties) — one codegen'd regex pass
    * per census, no explode.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val nonEmpty = (c: Column) => size(filter(c, t => t =!= "")).cast("long")
    val d = Tables.documents(spark, dir).select(
      col("lang"),
      size(TextFns.tokens(col("text"))).cast("long").as("words"),
      greatest(nonEmpty(split(col("text"), "[^.!?]+")), lit(1L))
        .as("sentences"),
      nonEmpty(split(lower(col("text")), "[^aeiouy]+")).as("syllables"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("sum_words"),
        sum(col("sentences")).as("sum_sentences"),
        sum(col("syllables")).as("sum_syllables"))
      .withColumn("fk_grade_u",
        expr("CAST(round(1e6 * (0.39e0 * sum_words / sum_sentences" +
          " + 11.8e0 * sum_syllables / sum_words - 15.59e0)) AS BIGINT)"))
  }

  private val readabilitySql = {
    val w = TextFns.tokensSql("text")
    s"""WITH d AS (
       |  SELECT lang,
       |    len($w)::BIGINT AS words,
       |    greatest(len(list_filter(string_split_regex(text, '[^.!?]+'),
       |                             x -> x <> '')), 1)::BIGINT AS sentences,
       |    len(list_filter(string_split_regex(lower(text), '[^aeiouy]+'),
       |                    x -> x <> ''))::BIGINT AS syllables
       |  FROM documents
       |), g AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(words) AS BIGINT) AS sum_words,
       |    CAST(sum(sentences) AS BIGINT) AS sum_sentences,
       |    CAST(sum(syllables) AS BIGINT) AS sum_syllables
       |  FROM d GROUP BY lang
       |)
       |SELECT lang, n_docs, sum_words, sum_sentences, sum_syllables,
       |  CAST(round(1e6 * (0.39e0 * sum_words / sum_sentences
       |    + 11.8e0 * sum_syllables / sum_words - 15.59e0)) AS BIGINT)
       |    AS fk_grade_u
       |FROM g""".stripMargin
  }

  // ---- McNemar paired-classifier test ---------------------------------------

  /** McNemar's test on two PAIRED document classifiers — the statistically
    * correct way to compare two filter heuristics evaluated on the SAME
    * corpus (independent-sample tests overstate significance on paired
    * predictions). Classifier A: "≥ 2 English stopword occurrences ⇒
    * English"; classifier B: "≥ 30 tokens ⇒ English"; truth: the corpus
    * `lang` tag. Only the DISCORDANT cells matter — b (A right, B wrong)
    * and c (A wrong, B right) — and the continuity-corrected statistic
    * (|b−c|−1)²/(b+c) is exact-integer until one micro-rounded division.
    * One map-only scan, one 1-row aggregate.
    */
  def mcnemarTest(spark: SparkSession, dir: String): DataFrame = {
    val nStop = size(filter(TextFns.tokens(lower(col("text"))),
      t => EnStops.map(s => t === lit(s)).reduce(_ || _)))
    val nTok = size(TextFns.tokens(col("text")))
    val d = Tables.documents(spark, dir).select(
      ((nStop >= 2) === (col("lang") === "en")).cast("long").as("a_ok"),
      ((nTok >= 30) === (col("lang") === "en")).cast("long").as("b_ok"))
    d.agg(count(lit(1)).as("n"),
      sum(col("a_ok") * (lit(1L) - col("b_ok"))).as("b_cell"),
      sum((lit(1L) - col("a_ok")) * col("b_ok")).as("c_cell"))
      .withColumn("chi2_u",
        expr("CAST(round(1e6 * (abs(b_cell - c_cell) - 1)" +
          " * (abs(b_cell - c_cell) - 1)" +
          " / greatest(b_cell + c_cell, 1)) AS BIGINT)"))
  }

  private val mcnemarTestSql = {
    val wl = TextFns.tokensSql("lower(text)")
    val w = TextFns.tokensSql("text")
    val stops = EnStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT
       |    CASE WHEN (len(list_filter($wl, x -> list_contains($stops, x))) >= 2)
       |              = (lang = 'en') THEN 1 ELSE 0 END AS a_ok,
       |    CASE WHEN (len($w) >= 30) = (lang = 'en') THEN 1 ELSE 0 END AS b_ok
       |  FROM documents
       |), g AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(a_ok * (1 - b_ok)) AS BIGINT) AS b_cell,
       |    CAST(sum((1 - a_ok) * b_ok) AS BIGINT) AS c_cell
       |  FROM d
       |)
       |SELECT n, b_cell, c_cell,
       |  CAST(round(1e6 * (abs(b_cell - c_cell) - 1) * (abs(b_cell - c_cell) - 1)
       |    / greatest(b_cell + c_cell, 1)) AS BIGINT) AS chi2_u
       |FROM g""".stripMargin
  }

  // ---- content-defined chunk dedup --------------------------------------------

  /** Boundary gate for [[contentChunkDedup]]: a token opens a new chunk
    * when its portable hash lands in 1/16 of the space — expected chunk
    * length 16 tokens, and the boundary decision depends ONLY on local
    * content, never on offsets.
    */
  private val ChunkMask = 16L
  private val ChunkSeed = 59

  /** Content-defined-chunking dedup rate per source — the STORAGE-dedup
    * recipe (LBFS/rsync lineage) next to the similarity recipes: chunk
    * boundaries are set by the CONTENT (portable hash of the token ∈
    * 1/[[ChunkMask]] of the space), so an insertion early in a document
    * shifts no boundary after the next gate token and the shared tail
    * still dedups — exactly what fixed 8-gram spans (span_dedup) and
    * whole-doc hashes (dedup_exact) cannot give. Pipeline: posexplode →
    * per-doc running boundary count (window per doc_id: reducer keys =
    * documents, bounded per-doc work) → chunk text via order-pinned
    * string_agg → md5 → per-source distinct/dup census. Everything is
    * token-linear; the chunk-hash rollup is the only shuffle that
    * matters.
    */
  def contentChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val chunks = toks
      .withColumn("gate",
        (graft.functions.PortableHash.h48(col("tok"), ChunkSeed)
          % ChunkMask === 0L).cast("long"))
      .withColumn("chunk", sum(col("gate")).over(wDoc))
      .groupBy(col("doc_id"), col("source"), col("chunk"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ")).as("h"))
    chunks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct"))
      .withColumn("dup_bp",
        expr("(10000 * (n_chunks - n_distinct)) div n_chunks"))
  }

  private val contentChunkDedupSql = {
    val w = TextFns.tokensSql("text")
    val h = graft.functions.PortableHash.h48Sql("tok", ChunkSeed)
    s"""WITH t AS (
       |  SELECT doc_id, source, $w AS toks FROM documents
       |), u AS (
       |  SELECT doc_id, source, unnest(toks) AS tok,
       |    generate_subscripts(toks, 1) AS pos
       |  FROM t
       |), g AS (
       |  SELECT doc_id, source, tok, pos,
       |    sum(CASE WHEN $h % $ChunkMask = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
       |  FROM u
       |), c AS (
       |  SELECT doc_id, source, chunk,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS h
       |  FROM g GROUP BY doc_id, source, chunk
       |)
       |SELECT source, count(*) AS n_chunks,
       |  count(DISTINCT h) AS n_distinct,
       |  (10000 * (count(*) - count(DISTINCT h))) // count(*) AS dup_bp
       |FROM c GROUP BY source""".stripMargin
  }

  // ---- mojibake / encoding-damage scan -----------------------------------------

  /** Encoding-damage census per source: occurrences of the Unicode
    * replacement character (U+FFFD — a decoder already gave up) and the
    * two classic UTF-8-read-as-Latin-1 mojibake signatures (`Ã`-prefixed
    * vowels, `â€`-prefixed punctuation). Counting is the codegen'd
    * subtraction device `(len(text) − len(replace(text, m, ''))) ÷
    * len(m)` — three literal replaces, no regex, no explode; one
    * ≤|sources| rollup. The readout every ingest gate runs before
    * trusting a feed's declared encoding.
    */
  def mojibakeScan(spark: SparkSession, dir: String): DataFrame = {
    def occ(m: String) =
      ((length(col("text")) -
        length(call_function("replace", col("text"), lit(m), lit(""))))
        .cast("long") / lit(m.length.toLong)).cast("long")
    Tables.documents(spark, dir)
      .select(col("source"),
        occ("�").as("n_fffd"),
        occ("Ã").as("n_a_tilde"),
        occ("â€").as("n_smart_punct"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_fffd")).as("fffd_occ"),
        sum(col("n_a_tilde")).as("a_tilde_occ"),
        sum(col("n_smart_punct")).as("smart_punct_occ"),
        sum(((col("n_fffd") + col("n_a_tilde") + col("n_smart_punct")) > 0)
          .cast("long")).as("n_damaged"))
  }

  private val mojibakeScanSql =
    s"""WITH d AS (
       |  SELECT source,
       |    (len(text) - len(replace(text, chr(65533), ''))) AS n_fffd,
       |    (len(text) - len(replace(text, chr(195), ''))) AS n_a_tilde,
       |    (len(text) - len(replace(text, chr(226) || chr(8364), ''))) // 2
       |      AS n_smart_punct
       |  FROM documents
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_fffd) AS BIGINT) AS fffd_occ,
       |  CAST(sum(n_a_tilde) AS BIGINT) AS a_tilde_occ,
       |  CAST(sum(n_smart_punct) AS BIGINT) AS smart_punct_occ,
       |  CAST(sum(CASE WHEN n_fffd + n_a_tilde + n_smart_punct > 0
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged
       |FROM d GROUP BY source""".stripMargin

  // ---- cross-source duplicate overlap matrix ------------------------------------

  /** Source-pair overlap matrix over shared BOILERPLATE TEMPLATES: for
    * every pair of sources, how many distinct normalized leading-8-token
    * prefixes (the [[MixtureOps]] prefix_dup fingerprint) appear in both —
    * the provenance readout that finds mirror/syndication feeds BEFORE
    * similarity dedup spends compute on them (its diagonal-free
    * complement dedup_rate_by_source only says how much of each source is
    * duplicated, not WITH WHOM). Shape: prefix key per doc (map-only), a
    * DISTINCT (key, source) frame, then a self-join ON THE KEY — the
    * per-key fan-out is ≤|sources|², a constant, so the join output is
    * bounded by distinct-key count × sources², never corpus-quadratic.
    */
  def sourceOverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val prefix = md5(array_join(
      slice(TextFns.tokens(lower(col("text"))), 1, 8), " "))
    val hs = Tables.documents(spark, dir)
      .select(prefix.as("h"), col("source"))
      .distinct()
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  private val sourceOverlapMatrixSql = {
    val w = TextFns.tokensSql("lower(text)")
    s"""WITH hs AS (
       |  SELECT DISTINCT md5(array_to_string(($w)[1:8], ' ')) AS h, source
       |  FROM documents
       |)
       |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
       |GROUP BY a.source, b.source""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("cdc_apply", cdcApply, Some(cdcApplySql)),
    QueryDef("pad_efficiency", padEfficiency, Some(padEfficiencySql)),
    QueryDef("code_detect", codeDetect, Some(codeDetectSql)),
    QueryDef("hapax_rate", hapaxRate, Some(hapaxRateSql)),
    QueryDef("tokenizer_fertility", tokenizerFertility, Some(tokenizerFertilitySql)),
    QueryDef("dp_noisy_counts", dpNoisyCounts, Some(dpNoisyCountsSql)),
    QueryDef("gopher_rules", gopherRules, Some(gopherRulesSql)),
    QueryDef("readability", readability, Some(readabilitySql)),
    QueryDef("mcnemar_test", mcnemarTest, Some(mcnemarTestSql)),
    QueryDef("content_chunk_dedup", contentChunkDedup,
      Some(contentChunkDedupSql)),
    QueryDef("mojibake_scan", mojibakeScan, Some(mojibakeScanSql)),
    QueryDef("source_overlap_matrix", sourceOverlapMatrix,
      Some(sourceOverlapMatrixSql)),
    QueryDef("ivm_agg", ivmAgg, Some(ivmAggSql)),
    QueryDef("late_data_audit", lateDataAudit, Some(lateDataAuditSql)),
    QueryDef("snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
  )
}
