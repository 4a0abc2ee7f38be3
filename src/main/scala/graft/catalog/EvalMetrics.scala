package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.VectorOps

/** Model- and signal-evaluation readouts — the metrics a curation team
  * runs before trusting a quality gate with 100 TB of corpus: exact ROC
  * AUC (tie-corrected rank-sum), a confusion-matrix readout with
  * precision/recall/F1, a calibration curve, chi-squared token/label
  * association (feature selection for the classifier), inter-rater
  * agreement (Cohen's kappa between two independent keep gates), and
  * lagged autocorrelation of the daily revenue series.
  *
  * Everything follows the repo's exact-integer attestation discipline:
  * counts aggregate as BIGINTs, products with 100 TB headroom lift to
  * decimal(38,0) (Spark) / HUGEINT (DuckDB), and every reported ratio is
  * ONE truncating integer division (`div` / `//` — both truncate toward
  * zero), so the DuckDB oracle replays bit-for-bit; no float statistics
  * anywhere.
  *
  * The graded model is [[TextAnalysis.classifierScore]] (the hashed
  * linear quality gate); ground truth for the binary metrics is
  * `lang = 'en'` — a real weak-supervision readout ("does the score
  * separate English?") with a well-balanced positive rate on this corpus.
  *
  * Reference analog: the reference has no evaluation library — this is
  * additive capability in the same spirit as its aggregate framework
  * (`src/mapred/.../lib/aggregate/ValueAggregatorJob.java`): fixed
  * per-record functions folded by commutative aggregates.
  */
object EvalMetrics extends QueryModule {

  private val dec = "decimal(38,0)"

  /** (score, pos) per document — the shared scan every binary metric
    * starts from; map-only, no shuffle of its own.
    */
  private def scored(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      TextAnalysis.classifierScore.as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))

  private val scoredSql =
    s"""SELECT ${TextAnalysis.classifierScoreSql} AS score,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM documents""".stripMargin

  // ---- confusion matrix / precision / recall / F1 -------------------------
  /** Binary confusion of the quality gate (keep = score > 0) against the
    * `lang = 'en'` ground truth, with precision/recall/F1 in integer
    * basis points. ONE map-only scan folded by one global aggregate —
    * 4 counters cross the wire regardless of corpus size; the ratios are
    * integer divisions over those counters (10⁴-scaled products stay
    * under 2^63 to ~10^14 docs).
    */
  def evalConfusion(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pos") === 1 && col("score") > 0, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pos") === 0 && col("score") > 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pos") === 1 && col("score") <= 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("pos") === 0 && col("score") <= 0, 1L).otherwise(0L)).as("tn"))
      .select(col("n_docs"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, 0L)
          .otherwise(expr("(10000 * tp) div (tp + fp)")).as("precision_bp"),
        when(col("tp") + col("fn") === 0, 0L)
          .otherwise(expr("(10000 * tp) div (tp + fn)")).as("recall_bp"),
        when(expr("2 * tp + fp + fn") === 0, 0L)
          .otherwise(expr("(20000 * tp) div (2 * tp + fp + fn)")).as("f1_bp"))

  private val evalConfusionSql =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(CASE WHEN pos = 1 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN pos = 0 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN pos = 1 AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN pos = 0 AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM s
       |)
       |SELECT n_docs, tp, fp, fn, tn,
       |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (10000 * tp) // (tp + fp) END AS BIGINT) AS precision_bp,
       |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (10000 * tp) // (tp + fn) END AS BIGINT) AS recall_bp,
       |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (20000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_bp
       |FROM c""".stripMargin

  // ---- exact ROC AUC (tie-corrected rank-sum) -----------------------------
  /** Exact ROC AUC of the score against `lang = 'en'`, computed the
    * scale-right way: aggregate to the per-score histogram (n_pos, n_neg)
    * — ONE shuffle, |distinct scores| rows, data-bounded not
    * corpus-bounded — then a running negative-count window over that
    * compact table. AUC = (C + T/2) / (P·N) with C = concordant pairs
    * (pos score > neg score) and T = ties; both from the histogram, never
    * from pair enumeration. Reported doubled (`auc_num2x = 2C + T`,
    * `auc_den2x = 2·P·N`) so the tie half stays integer, plus one
    * truncated `auc_bp`. Pair-count products lift to decimal(38,0) —
    * P·N overflows int64 past ~3·10^9 docs — and the output casts back
    * to BIGINT (exact to ~9·10^5 billion-doc corpora; the decimal output
    * is the documented lift beyond). The single-partition window is over
    * the score histogram only (bounded by the score range, ~10^4 rows),
    * the same compact-domain justification as `skyline_parts`.
    */
  def aucRank(spark: SparkSession, dir: String): DataFrame = {
    val hist = scored(spark, dir)
      .groupBy(col("score"))
      .agg(sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("p"), sum(col("nn")).as("n"),
        sum(col("np").cast(dec) * col("cneg")).as("c"),
        sum(col("np").cast(dec) * col("nn")).as("t"))
      .select(
        col("p").as("n_pos"), col("n").as("n_neg"),
        expr("CAST(2 * c + t AS BIGINT)").as("auc_num2x"),
        expr(s"CAST(2 * CAST(p AS $dec) * n AS BIGINT)").as("auc_den2x"),
        expr(s"""CASE WHEN p = 0 OR n = 0 THEN 0L
                |ELSE (10000 * (2 * c + t)) div (2 * CAST(p AS $dec) * n)
                |END""".stripMargin).as("auc_bp"))
  }

  private val aucRankSql =
    s"""WITH s AS ($scoredSql),
       |h AS (
       |  SELECT score, CAST(sum(pos) AS BIGINT) AS np,
       |    CAST(count(*) - sum(pos) AS BIGINT) AS nn
       |  FROM s GROUP BY score
       |), r AS (
       |  SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
       |  FROM h
       |), a AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n,
       |    sum(np::HUGEINT * cneg) AS c, sum(np::HUGEINT * nn) AS t
       |  FROM r
       |)
       |SELECT p AS n_pos, n AS n_neg,
       |  CAST(2 * c + t AS BIGINT) AS auc_num2x,
       |  CAST(2 * p::HUGEINT * n AS BIGINT) AS auc_den2x,
       |  CAST(CASE WHEN p = 0 OR n = 0 THEN 0
       |       ELSE (10000 * (2 * c + t)) // (2 * p::HUGEINT * n) END AS BIGINT) AS auc_bp
       |FROM a""".stripMargin

  // ---- calibration curve --------------------------------------------------
  /** Width of one calibration bin in score units. */
  private val CalBinWidth = 500L

  /** Calibration curve of the quality gate: fixed-width score bins
    * (`score div 500` — truncation toward zero in BOTH engines, so the
    * binning is identical) with observed positive rate and mean score per
    * bin. Fixed-width bins instead of ntile deciles on purpose: deciles
    * need a global rank (a total-order sort of every doc), fixed bins are
    * MAP-ONLY + one |bins|-row aggregate — the 100 TB shape. A monotone
    * pos_rate_bp over bins = the score is calibrated rank-wise.
    */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .groupBy(expr(s"score div $CalBinWidth").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        sum(col("score")).as("ssum"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("(10000 * n_pos) div n_docs").as("pos_rate_bp"),
        expr("(1000 * ssum) div n_docs").as("mean_score_milli"))

  private val calibrationBinsSql =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT CAST(score // $CalBinWidth AS BIGINT) AS bin,
       |    count(*) AS n_docs, CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(sum(score) AS BIGINT) AS ssum
       |  FROM s GROUP BY 1
       |)
       |SELECT bin, n_docs, n_pos,
       |  CAST((10000 * n_pos) // n_docs AS BIGINT) AS pos_rate_bp,
       |  CAST((1000 * ssum) // n_docs AS BIGINT) AS mean_score_milli
       |FROM b""".stripMargin

  // ---- chi-squared token/label association --------------------------------
  /** How many top-chi² tokens to report. */
  private val Chi2TopK = 20

  /** Chi-squared association of token presence with `lang = 'en'` — the
    * classic feature-selection score (which tokens should the quality
    * classifier actually look at). Per token, the 2×2 presence table
    * (a = pos docs containing it, b = neg docs containing it, c/d the
    * complements from broadcast totals) gives
    * χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)), reported ×1000
    * truncated. Shape: distinct-token explode → ONE shuffle on the token
    * key with map-side combine; totals are a broadcast 1-row frame; the
    * top-k is orderBy+limit → TakeOrdered (per-partition heaps, no global
    * sort). (ad − bc)² · n overflows int64 past ~10^5 docs, so the ratio
    * computes in decimal(38,0)/HUGEINT — exact to ~10^8 docs, with the
    * same decimal-output lift as [[aucRank]] beyond. Ties order by token
    * — the cut is deterministic cross-engine.
    */
  def chi2Tokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
      array_distinct(graft.functions.TextFns.tokens(lower(col("text")))).as("toks"))
    val tot = docs.agg(sum(col("pos")).as("tp_all"),
      (count(lit(1)) - sum(col("pos"))).as("tn_all"))
    val perTok = docs
      .select(col("pos"), explode(col("toks")).as("token"))
      .groupBy(col("token"))
      .agg(sum(col("pos")).as("a"), (count(lit(1)) - sum(col("pos"))).as("b"))
    perTok.crossJoin(broadcast(tot))
      .withColumn("c", col("tp_all") - col("a"))
      .withColumn("d", col("tn_all") - col("b"))
      .withColumn("chi2_milli", expr(
        s"""CASE WHEN (a + b) * (c + d) = 0 OR tp_all = 0 OR tn_all = 0 THEN 0L
           |ELSE (1000 * CAST(tp_all + tn_all AS $dec)
           |      * (CAST(a AS $dec) * d - CAST(b AS $dec) * c)
           |      * (CAST(a AS $dec) * d - CAST(b AS $dec) * c))
           |     div (CAST(a + b AS $dec) * (c + d) * tp_all * tn_all)
           |END""".stripMargin))
      .orderBy(col("chi2_milli").desc, col("token"))
      .limit(Chi2TopK)
      .select(col("token"), col("a").as("df_pos"), col("b").as("df_neg"),
        col("chi2_milli"))
  }

  private val chi2TokensSql = {
    val toks = graft.functions.TextFns.tokensSql("lower(text)")
    s"""WITH d AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
       |    list_distinct($toks) AS toks
       |  FROM documents
       |), tot AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS tp_all,
       |    CAST(count(*) - sum(pos) AS BIGINT) AS tn_all
       |  FROM d
       |), t AS (
       |  SELECT unnest(toks) AS token, pos FROM d
       |), pt AS (
       |  SELECT token, CAST(sum(pos) AS BIGINT) AS a,
       |    CAST(count(*) - sum(pos) AS BIGINT) AS b
       |  FROM t GROUP BY token
       |), x AS (
       |  SELECT token, a, b, tp_all - a AS c, tn_all - b AS d2,
       |    tp_all, tn_all
       |  FROM pt CROSS JOIN tot
       |)
       |SELECT token, a AS df_pos, b AS df_neg,
       |  CAST(CASE WHEN (a+b) * (c+d2) * tp_all * tn_all = 0 THEN 0
       |       ELSE (1000 * (tp_all + tn_all)
       |             * (a::HUGEINT * d2 - b::HUGEINT * c)
       |             * (a::HUGEINT * d2 - b::HUGEINT * c))
       |            // ((a+b)::HUGEINT * (c+d2) * tp_all * tn_all) END
       |       AS BIGINT) AS chi2_milli
       |FROM x
       |ORDER BY chi2_milli DESC, token
       |LIMIT $Chi2TopK""".stripMargin
  }

  // ---- Cohen's kappa ------------------------------------------------------
  /** Length threshold of the second (independent) keep gate. */
  private val KappaLenGate = 300L

  /** Inter-rater agreement between two independent keep gates — the
    * hashed-classifier gate (score > 0) and a plain length gate
    * (n_chars ≥ 300) — as Cohen's kappa in basis points. κ measures
    * agreement BEYOND chance: κ = (p_o − p_e)/(1 − p_e), computed here
    * fully cross-multiplied — κ_bp = 10⁴·(n·(a+d) − pe) div (n² − pe)
    * with pe = (a+b)(a+c) + (c+d)(b+d) — so nothing is ever a float.
    * n² overflows int64 past ~3·10^9 docs → decimal(38,0)/HUGEINT, same
    * lift as [[aucRank]]. ONE map-only scan + one 4-counter aggregate.
    */
  def cohenKappa(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select((TextAnalysis.classifierScore > 0).as("ka"),
        (col("n_chars") >= KappaLenGate).as("kb"))
      .agg(
        sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("d"))
      .select(col("a").as("both_keep"), col("b").as("only_score"),
        col("c").as("only_length"), col("d").as("both_drop"),
        (col("a") + col("b") + col("c") + col("d")).as("n_docs"),
        expr(
          s"""CASE WHEN CAST(a + b + c + d AS $dec) * (a + b + c + d)
             |       - (CAST(a + b AS $dec) * (a + c) + CAST(c + d AS $dec) * (b + d)) = 0
             |THEN 0L
             |ELSE (10000 * (CAST(a + b + c + d AS $dec) * (a + d)
             |       - (CAST(a + b AS $dec) * (a + c) + CAST(c + d AS $dec) * (b + d))))
             |     div (CAST(a + b + c + d AS $dec) * (a + b + c + d)
             |       - (CAST(a + b AS $dec) * (a + c) + CAST(c + d AS $dec) * (b + d)))
             |END""".stripMargin).as("kappa_bp"))

  private val cohenKappaSql =
    s"""WITH g AS (
       |  SELECT (${TextAnalysis.classifierScoreSql}) > 0 AS ka,
       |    n_chars >= $KappaLenGate AS kb
       |  FROM documents
       |), c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM g
       |)
       |SELECT a AS both_keep, b AS only_score, c AS only_length,
       |  d AS both_drop, a + b + c + d AS n_docs,
       |  CAST(CASE WHEN (a+b+c+d)::HUGEINT * (a+b+c+d)
       |              - ((a+b)::HUGEINT * (a+c) + (c+d)::HUGEINT * (b+d)) = 0
       |       THEN 0
       |       ELSE (10000 * ((a+b+c+d)::HUGEINT * (a+d)
       |              - ((a+b)::HUGEINT * (a+c) + (c+d)::HUGEINT * (b+d))))
       |            // ((a+b+c+d)::HUGEINT * (a+b+c+d)
       |              - ((a+b)::HUGEINT * (a+c) + (c+d)::HUGEINT * (b+d))) END
       |       AS BIGINT) AS kappa_bp
       |FROM c""".stripMargin

  // ---- autocorrelation of the daily revenue series ------------------------
  /** Largest lag reported. */
  private val AcfMaxLag = 7

  /** Lag-1..7 autocorrelation of daily order revenue — the seasonality
    * readout behind `seasonal_forecast`'s day-of-week model (a lag-7
    * peak IS the weekly cycle). Exact integers throughout: the series is
    * per-day cent sums (one shuffle, |days| rows), the mean is cleared by
    * n-scaling — r_k = Σ(n·x_t − S)(n·x_{t+k} − S) / Σ(n·x_t − S)² over
    * the pairs the lag leaves — and the products run in decimal(38,0)/
    * HUGEINT ((n·x − S)² passes int64 already at ~10³ days of ~10⁶-cent
    * daily volume). Lags come from ONE 7-lead window pass over the
    * compact daily table (single-partition over |days| rows — the
    * skyline_parts compact-domain justification), folded by one
    * aggregate; `stack` unpivots the 7 readouts to rows. Truncating
    * division keeps the signed milli-ACF identical cross-engine.
    */
  def acfDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
    val w = Window.orderBy(col("day"))
    val withLeads = (1 to AcfMaxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"x$k", lead(col("x"), k).over(w))
    }
    val st = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val dev = (c: org.apache.spark.sql.Column) =>
      c.cast(dec) * col("n") - col("s")
    val aggs: Seq[org.apache.spark.sql.Column] =
      sum(dev(col("x")) * dev(col("x"))).as("den") +:
        (1 to AcfMaxLag).map(k =>
          sum(when(col(s"x$k").isNotNull, dev(col("x")) * dev(col(s"x$k")))
            .otherwise(lit(0).cast(dec))).as(s"num$k"))
    val acfCols = (1 to AcfMaxLag).map(k =>
      s"CAST($k AS BIGINT), CASE WHEN den = 0 THEN 0L ELSE (1000 * num$k) div den END")
    withLeads.crossJoin(broadcast(st))
      .agg(count(lit(1)).as("n_days"), aggs: _*)
      .selectExpr("n_days",
        s"stack($AcfMaxLag, ${acfCols.mkString(", ")}) AS (lag, acf_milli)")
      .select(col("lag"), col("n_days"), col("acf_milli"))
  }

  private val acfDailySql = {
    val lagRows = (1 to AcfMaxLag).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS lag, st.n AS n_days,
         |  CAST(CASE WHEN m.den = 0 THEN 0
         |       ELSE (1000 * m.num$k) // m.den END AS BIGINT) AS acf_milli
         |FROM m CROSS JOIN st"""
    }.mkString("\nUNION ALL\n")
    val numCols = (1 to AcfMaxLag).map(k =>
      s"""sum(CASE WHEN x$k IS NULL THEN 0
         |      ELSE (x::HUGEINT * n - s) * (x$k::HUGEINT * n - s) END) AS num$k""")
      .mkString(",\n    ")
    val leadCols = (1 to AcfMaxLag).map(k =>
      s"lead(x, $k) OVER (ORDER BY day) AS x$k").mkString(",\n    ")
    s"""WITH daily AS (
       |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders GROUP BY 1
       |), st AS (
       |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily
       |), led AS (
       |  SELECT day, x,
       |    $leadCols
       |  FROM daily
       |), m AS (
       |  SELECT
       |    sum((x::HUGEINT * n - s) * (x::HUGEINT * n - s)) AS den,
       |    $numCols
       |  FROM led CROSS JOIN st
       |)
       |$lagRows""".stripMargin
  }

  // ---- cross-correlation of two daily series ------------------------------
  private val CcfMaxLag = 3

  /** Lag −3..+3 cross-correlation between daily event VOLUME and daily
    * event VALUE (cent sums) — the lead-lag readout [[acfDaily]] can't
    * give: does activity lead spend (positive-lag peak), trail it, or
    * move with it (lag-0 peak)? Exact-integer Pearson per lag: both
    * series center on the TRUNCATED global mean (`Σ div n` — an integer
    * shift, so deviations stay small integers; the exact mean enters via
    * the n-scaled num/den formula which a constant shift leaves
    * invariant), per-lag sums restrict to the rows that lag leaves valid,
    * and the correlation reports through the [[RankStats]] signed-√
    * device: one truncating division to `10⁶·num²/(dx·dy)` in
    * decimal(38,0)/HUGEINT, then sign·floor(√·) over an integer ≤ 10⁶
    * (IEEE sqrt, bit-identical cross-engine). num² bounds exactness at
    * √(dx·dy) ≤ ~10¹⁶ — beyond, stage the division (the documented
    * [[RankStats.spearmanCorr]] lift). The 7-lag window pass runs over
    * the compact daily table; totals broadcast as a 1-row frame.
    *
    * ROW-offset lag semantics: lead/lag over ORDER BY day pairs rows k
    * POSITIONS apart, which equals k CALENDAR days only while the daily
    * series is gapless (true for this corpus: every day has events; both
    * engines agree by construction). On gapped data, densify the day
    * axis first (zero-fill the missing days, or join on explicit
    * `b.day = a.day + k` arithmetic) before reading the lags as calendar
    * offsets.
    */
  def ccfDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("xr"), sum(col("cents")).as("yr"))
    val sh = daily.agg(count(lit(1)).as("n"),
      expr("sum(xr) div count(1)").as("bx"),
      expr("sum(yr) div count(1)").as("bv"))
    val w = Window.orderBy(col("day"))
    val nm = (k: Int) => if (k < 0) s"m${-k}" else s"p$k"
    val lags = (-CcfMaxLag to CcfMaxLag).toSeq
    val withY = lags.foldLeft(daily.crossJoin(broadcast(sh))) { (df, k) =>
      val shifted = if (k >= 0) lead(col("yr"), k).over(w)
      else lag(col("yr"), -k).over(w)
      df.withColumn(s"yc_${nm(k)}", shifted - col("bv"))
    }.withColumn("xc", col("xr") - col("bx"))
    val aggs = lags.flatMap { k =>
      val y = col(s"yc_${nm(k)}")
      val ok = y.isNotNull
      Seq(
        sum(when(ok, 1L).otherwise(0L)).as(s"n_${nm(k)}"),
        sum(when(ok, col("xc")).otherwise(0L)).as(s"sx_${nm(k)}"),
        sum(when(ok, y).otherwise(0L)).as(s"sy_${nm(k)}"),
        sum(when(ok, col("xc").cast(dec) * col("xc"))
          .otherwise(lit(0).cast(dec))).as(s"sxx_${nm(k)}"),
        sum(when(ok, y.cast(dec) * y).otherwise(lit(0).cast(dec)))
          .as(s"syy_${nm(k)}"),
        sum(when(ok, col("xc").cast(dec) * y).otherwise(lit(0).cast(dec)))
          .as(s"sxy_${nm(k)}"))
    }
    val entries = lags.map { k =>
      val m = nm(k)
      val num = s"(CAST(n_$m AS $dec) * sxy_$m - CAST(sx_$m AS $dec) * sy_$m)"
      val dx = s"(CAST(n_$m AS $dec) * sxx_$m - CAST(sx_$m AS $dec) * sx_$m)"
      val dy = s"(CAST(n_$m AS $dec) * syy_$m - CAST(sy_$m AS $dec) * sy_$m)"
      s"""CAST($k AS BIGINT), CAST(n_$m AS BIGINT),
         |CASE WHEN $dx * $dy = 0 THEN 0L
         |ELSE CAST(sign($num) AS BIGINT)
         |  * CAST(floor(sqrt(CAST((1000000 * $num * $num) div ($dx * $dy)
         |                          AS DOUBLE))) AS BIGINT)
         |END""".stripMargin
    }
    withY.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${lags.size}, ${entries.mkString(", ")}) AS (lag, n_pairs, ccf_milli)")
  }

  private val ccfDailySql = {
    val nm = (k: Int) => if (k < 0) s"m${-k}" else s"p$k"
    val lags = (-CcfMaxLag to CcfMaxLag).toSeq
    val leadCols = lags.map { k =>
      val f = if (k >= 0) s"lead(yr, $k)" else s"lag(yr, ${-k})"
      s"$f OVER (ORDER BY day) - bv AS yc_${nm(k)}"
    }.mkString(",\n    ")
    val sumCols = lags.map { k =>
      val m = nm(k)
      s"""count(yc_$m) AS n_$m,
         |    CAST(sum(CASE WHEN yc_$m IS NULL THEN 0 ELSE xc END) AS BIGINT) AS sx_$m,
         |    CAST(sum(coalesce(yc_$m, 0)) AS BIGINT) AS sy_$m,
         |    sum(CASE WHEN yc_$m IS NULL THEN 0 ELSE xc::HUGEINT * xc END) AS sxx_$m,
         |    sum(coalesce(yc_$m::HUGEINT * yc_$m, 0)) AS syy_$m,
         |    sum(coalesce(xc::HUGEINT * yc_$m, 0)) AS sxy_$m"""
    }.mkString(",\n    ")
    val rows = lags.map { k =>
      val m = nm(k)
      val num = s"(n_$m::HUGEINT * sxy_$m - sx_$m::HUGEINT * sy_$m)"
      val dx = s"(n_$m::HUGEINT * sxx_$m - sx_$m::HUGEINT * sx_$m)"
      val dy = s"(n_$m::HUGEINT * syy_$m - sy_$m::HUGEINT * sy_$m)"
      s"""SELECT CAST($k AS BIGINT) AS lag, CAST(n_$m AS BIGINT) AS n_pairs,
         |  CAST(CASE WHEN $dx * $dy = 0 THEN 0
         |       ELSE CAST(sign($num) AS BIGINT)
         |         * CAST(floor(sqrt(CAST((1000000 * $num * $num) // ($dx * $dy)
         |                                 AS DOUBLE))) AS BIGINT)
         |       END AS BIGINT) AS ccf_milli
         |FROM a"""
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS xr,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yr
       |  FROM events GROUP BY 1
       |), sh AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(xr) // count(*) AS BIGINT) AS bx,
       |    CAST(sum(yr) // count(*) AS BIGINT) AS bv
       |  FROM daily
       |), led AS (
       |  SELECT xr - bx AS xc,
       |    $leadCols
       |  FROM daily CROSS JOIN sh
       |), a AS (
       |  SELECT
       |    $sumCols
       |  FROM led
       |)
       |$rows""".stripMargin
  }

  // ---- NDCG of the BM25 ranking -------------------------------------------
  private val NdcgK = 10
  private val NdcgBudget = 8L

  /** Integer discount table d_i = floor(10⁶ / log2(i + 1)) for ranks
    * 1..k. Computed ONCE here and interpolated as literals into both the
    * Spark expression and the DuckDB oracle — so no engine ever evaluates
    * a logarithm at query time and the two sides agree by construction
    * (the [[graft.operators.Bm25]] no-`ln` determinism rule applied to
    * the evaluation layer).
    */
  private val NdcgDiscount: Seq[Long] =
    (1 to NdcgK).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** NDCG@10 of the BM25 ranking — the retrieval-quality readout for
    * `bm25_topk`'s engine: how close each query's returned ORDER is to
    * its ideal order. Graded relevance is deterministic by construction
    * (rel = |query terms ∩ doc's distinct terms|, 0..5), gain = 2^rel − 1,
    * discounts from [[NdcgDiscount]]; DCG and the per-query ideal
    * (gain-sorted) DCG are exact integer sums, NDCG one truncating
    * division. Scale shape: ranking and index come from the STORED BM25
    * index ([[graft.sources.Bm25Store]] — the prepare step pays the
    * corpus pass; serving is a term-pruned read);
    * relevance grading probes that index with a BROADCAST of the
    * |queries|·k ranked pairs, so the corpus-sized side never reshuffles;
    * everything after the probe operates on ≤ |queries|·k rows. The query
    * batch is a FIXED ~[[NdcgBudget]]-query audit sample
    * ([[graft.operators.VectorOps.auditSample]]), NOT a `% constant`
    * workload: this is an audit readout, and a constant-mod batch grows
    * with the corpus (first measured exponent 1.00 — the whole 71 s sf1
    * cost was the growing probe side, the same trap ann_recall_audit and
    * mrr_eval were cured of). Ideal
    * ordering ties are harmless: equal gains contribute the same Σ
    * gain·disc whatever their relative order.
    */
  def ndcgEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // ≤ budget·5 rows with THREE consumers (serve, grade pairs, pruned
    // postings) — materialized so each reference reads the frame instead
    // of re-running the sampled tokenize
    val queries = graft.core.Materialize(
      VectorOps.auditSample(docs, "doc_id", NdcgBudget)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(slice(
            graft.functions.TextFns.tokens(col("text")), 1, 5))).as("term")))
    // served from the STORED index ([[graft.sources.Bm25Store]]): the
    // fixed-budget audit batch is exactly the shape the term-pruned read
    // is for — ≤ NdcgBudget·5 distinct terms reach the row-group-pruned
    // postings scan at ANY corpus scale
    // ≤ budget·k rows, two consumers (grade pairs + the graded rollup) —
    // each reference would re-serve from the stored index
    val ranked = graft.core.Materialize(graft.sources.Bm25Store
      .serve(spark, dir, queries, NdcgK, maxScore = Some(false))
      .select(col("query_id"), col("doc_id"), col("rank")))
    // grade relevance: probe the (term-pruned) stored postings with the
    // (small) ranked pairs × query terms — the pairs' terms are all query
    // terms, so the pruned frame covers every possible match
    val pairs = ranked.join(queries, "query_id")
      .select(col("query_id"), col("doc_id"), col("rank"), col("term"))
    val rel = graft.sources.Bm25Store.prunedPostings(spark, dir, queries)
      .select(col("doc_id"), col("term"))
      .join(broadcast(pairs), Seq("doc_id", "term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("rel"))
    val discCase = (rk: String) =>
      s"CASE $rk ${NdcgDiscount.zipWithIndex.map { case (d, i) =>
        s"WHEN ${i + 1} THEN ${d}L" }.mkString(" ")} END"
    val graded = ranked.join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("gain", expr("shiftleft(1L, CAST(coalesce(rel, 0) AS INT)) - 1"))
      .withColumn("irank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("gain").desc, col("doc_id"))))
    graded
      .groupBy(col("query_id"))
      .agg(sum(col("gain")).as("total_gain"),
        sum(expr(s"gain * ${discCase("rank")}")).as("dcg"),
        sum(expr(s"gain * ${discCase("irank")}")).as("idcg"))
      .select(col("query_id"), col("total_gain"), col("dcg"), col("idcg"),
        expr("CASE WHEN idcg = 0 THEN 0L ELSE (10000 * dcg) div idcg END")
          .as("ndcg_bp"))
  }

  private val ndcgEvalSql = {
    val ndcgModSql = VectorOps.auditSampleModSql("documents", NdcgBudget)
    val rankedSql = graft.operators.Bm25.topKSql("documents", ndcgModSql, NdcgK)
    val discCase = (rk: String) =>
      s"CASE $rk ${NdcgDiscount.zipWithIndex.map { case (d, i) =>
        s"WHEN ${i + 1} THEN ${d}::BIGINT" }.mkString(" ")} END"
    val toks = graft.functions.TextFns.tokensSql("text")
    s"""WITH ranked AS (
       |$rankedSql
       |), qt AS (
       |  SELECT doc_id AS query_id, unnest(list_distinct(($toks)[1:5])) AS term
       |  FROM documents WHERE doc_id % ($ndcgModSql) = 0
       |), dt AS (
       |  SELECT doc_id, unnest(list_distinct($toks)) AS term FROM documents
       |), rel AS (
       |  SELECT r.query_id, r.doc_id, count(dt.term) AS rel
       |  FROM ranked r JOIN qt ON qt.query_id = r.query_id
       |  JOIN dt ON dt.doc_id = r.doc_id AND dt.term = qt.term
       |  GROUP BY r.query_id, r.doc_id
       |), graded AS (
       |  SELECT r.query_id, r.doc_id, r.rank,
       |    CAST((1::BIGINT << CAST(coalesce(rel.rel, 0) AS INTEGER)) - 1 AS BIGINT) AS gain
       |  FROM ranked r LEFT JOIN rel USING (query_id, doc_id)
       |), ideal AS (
       |  SELECT query_id, doc_id, rank, gain,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY gain DESC, doc_id) AS INTEGER) AS irank
       |  FROM graded
       |)
       |SELECT query_id, CAST(sum(gain) AS BIGINT) AS total_gain,
       |  CAST(sum(gain * ${discCase("rank")}) AS BIGINT) AS dcg,
       |  CAST(sum(gain * ${discCase("irank")}) AS BIGINT) AS idcg,
       |  CAST(CASE WHEN sum(gain * ${discCase("irank")}) = 0 THEN 0
       |       ELSE (10000 * sum(gain * ${discCase("rank")}))
       |            // sum(gain * ${discCase("irank")}) END AS BIGINT) AS ndcg_bp
       |FROM ideal
       |GROUP BY query_id""".stripMargin
  }

  // ---- Gini concentration of customer revenue -----------------------------
  /** Gini coefficient of per-customer revenue — the corpus-concentration
    * readout (the same arithmetic grades domain concentration in a
    * training mixture: a 0.9-Gini source list means a handful of domains
    * dominate). Rank formula, fully cross-multiplied:
    * gini_bp = 10⁴·(2·Σi·xᵢ − (n+1)·S) div (n·S) with i the ascending
    * revenue rank — exact integers end-to-end, products in
    * decimal(38,0)/HUGEINT (n·S passes int64 near 10^9 customers of 10^9
    * cents). Shape: per-customer sums are ONE partial-aggregated shuffle;
    * the rank is the distributed prefix-sum device
    * ([[graft.operators.PrefixRank]], round 13) — range-partitioned on
    * (x, custkey), each slice ranked locally, no single-partition
    * exchange anywhere in the plan. Tied
    * revenues make Σi·xᵢ order-free (equal x across a rank block sums to
    * x·Σi however the block is ordered), so cross-engine ranks need no
    * tiebreak contract.
    */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    // ascending revenue rank via the distributed prefix-sum device
    // (round 13): the former bare Window.orderBy ranked the whole
    // per-customer frame in ONE task — PrefixRank range-partitions on
    // (x, custkey) and ranks each slice locally
    graft.operators.PrefixRank
      .withRowNumber(per, "i", col("x"), col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("i").cast(dec) * col("x")).as("six"))
      .select(col("n").as("n_customers"), col("s").as("total_cents"),
        expr(s"""CASE WHEN CAST(n AS $dec) * s = 0 THEN 0L
                |ELSE (10000 * (2 * six - CAST(n + 1 AS $dec) * s))
                |     div (CAST(n AS $dec) * s)
                |END""".stripMargin).as("gini_bp"))
  }

  private val giniConcentrationSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
      |  FROM per
      |), a AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
      |    sum(i::HUGEINT * x) AS six
      |  FROM r
      |)
      |SELECT n AS n_customers, s AS total_cents,
      |  CAST(CASE WHEN n::HUGEINT * s = 0 THEN 0
      |       ELSE (10000 * (2 * six - (n + 1)::HUGEINT * s)) // (n::HUGEINT * s)
      |       END AS BIGINT) AS gini_bp
      |FROM a""".stripMargin

  // ---- Herfindahl-Hirschman concentration ----------------------------------
  /** Herfindahl-Hirschman index of the document SOURCE mixture — the
    * antitrust-style concentration number a mixture owner reads next to
    * [[giniConcentration]]'s inequality curve (HHI weighs the BIGGEST
    * shares quadratically; Gini weighs the whole distribution): Σ share²,
    * scaled to 10⁸ so the classic 0.15/0.25 thresholds land at
    * 1.5·10⁷/2.5·10⁷. Fully cross-multiplied — hhi = 10⁸·Σx² div S² in
    * decimal(38,0)/HUGEINT (Σx² passes int64 at ~3·10⁹ docs in one
    * source) — plus the dominant share in basis points. ONE
    * partial-aggregated groupBy bounded by |sources|, then a 1-row fold;
    * nothing rank-based, so no window at all.
    */
  def hhiConcentration(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("x"))
      .agg(count(lit(1)).as("n_sources"), sum(col("x")).as("s"),
        sum(col("x").cast(dec) * col("x")).as("ssq"), max(col("x")).as("mx"))
      .select(col("n_sources"),
        expr(s"CAST((100000000 * ssq) div (CAST(s AS $dec) * s) AS BIGINT)")
          .as("hhi_e8"),
        expr("(10000 * mx) div s").as("top_share_bp"))

  private val hhiConcentrationSql =
    """WITH g AS (
      |  SELECT source, count(*) AS x FROM documents GROUP BY source
      |), a AS (
      |  SELECT count(*) AS n_sources, CAST(sum(x) AS BIGINT) AS s,
      |    sum(x::HUGEINT * x) AS ssq, CAST(max(x) AS BIGINT) AS mx
      |  FROM g
      |)
      |SELECT n_sources,
      |  CAST((100000000 * ssq) // (s::HUGEINT * s) AS BIGINT) AS hhi_e8,
      |  CAST((10000 * mx) // s AS BIGINT) AS top_share_bp
      |FROM a""".stripMargin

  // ---- Poisson-bootstrap confidence interval ------------------------------
  private[catalog] val BootstrapB = 32

  /** Poisson(1) inverse-CDF thresholds scaled to 10⁶ — cum_k =
    * floor(10⁶·P(X ≤ k)) for k = 0..8 (mass beyond 9 is < 10⁻⁶, below
    * the grid). Computed once here and interpolated as literals into
    * both engines, the [[NdcgDiscount]] device: no engine evaluates
    * exp/factorial at query time.
    */
  private val PoissonCdfMicro: Seq[Long] = {
    var p = math.exp(-1.0)
    var cum = 0.0
    (0 to 8).map { k =>
      if (k > 0) p = p / k
      cum += p
      math.floor(cum * 1e6).toLong
    }
  }

  private[catalog] def poissonCase(u: String): String =
    s"CASE ${PoissonCdfMicro.zipWithIndex.map { case (c, k) =>
      s"WHEN $u < $c THEN ${k}L" }.mkString(" ")} ELSE 9L END"

  private[catalog] def poissonCaseSql(u: String): String =
    s"CASE ${PoissonCdfMicro.zipWithIndex.map { case (c, k) =>
      s"WHEN $u < $c THEN $k" }.mkString(" ")} ELSE 9 END"

  // ---- perm-family replicate draw (the corpus-sized fan-out path) --------
  // [[bootstrapCi]] fans every order out B=32 ways; drawing each replicate's
  // uniform from h48("b:key") costs 32 md5 evaluations PER ROW — the
  // dominant cost at sf1 (15 M orders × 32). The MinHashLsh device applies
  // verbatim (operators/MinHashLsh.scala: "ONE md5 per row and N codegen
  // multiply-adds, measured ~2× on the whole pipeline"): one md5-derived
  // h32 per row, then u_b = (A_b·h32 + B_b) mod P per replicate — pure
  // codegen arithmetic, exact in any 64-bit engine (A < 2^31, h32 < 2^32 ⟹
  // A·h32 + B < 2^63). The Poisson inverse-CDF thresholds are scaled to P
  // (finer grid than the 10⁶ one, so the draw is BETTER-resolved than the
  // string-hash scheme it replaces). eval_protocol_pipeline keeps the
  // string-hash draw: its fan-out is over the small quota-sampled eval set,
  // where 32 md5s cost nothing.
  private[catalog] val BootP: Long = 2147483647L // 2^31 − 1, MinHashLsh.P
  private def permConst(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }
  private[catalog] val BootPermA: IndexedSeq[Long] =
    (0 until BootstrapB).map(b => (permConst(s"boot:a:$b") % (1L << 31)) | 1L)
  private[catalog] val BootPermB: IndexedSeq[Long] =
    (0 until BootstrapB).map(b => permConst(s"boot:b:$b") % BootP)

  /** floor(P · P(X ≤ k)) for X ~ Poisson(1), k = 0..8 — [[PoissonCdfMicro]]
    * on the perm-family grid.
    */
  private[catalog] val PoissonCdfP: Seq[Long] = {
    var p = math.exp(-1.0)
    var cum = 0.0
    (0 to 8).map { k =>
      if (k > 0) p = p / k
      cum += p
      math.floor(cum * BootP.toDouble).toLong
    }
  }

  /** Poisson(1) weight from a uniform draw u ∈ [0, P) — one nested
    * when/otherwise chain, all codegen. (An earlier shape inlined the
    * whole perm family as an exploded 32-struct array literal — one giant
    * generated expression per row that ran 3× SLOWER than the md5 scheme
    * it replaced; the sequence-explode + element_at-on-literal-array form
    * keeps the per-row expression tree tiny.)
    */
  private[catalog] def poissonW(u: Column): Column =
    PoissonCdfP.zipWithIndex.foldRight(lit(9L)) { case ((c, k), acc) =>
      when(u < c, k.toLong).otherwise(acc)
    }

  /** DuckDB twin of [[poissonW]] with (a, bb) coming from a VALUES-joined
    * perm table.
    */
  private[catalog] def poissonWSql(h32: String, a: String, bb: String): String =
    s"CASE ${PoissonCdfP.zipWithIndex.map { case (c, k) =>
      s"WHEN ($a * $h32 + $bb) % $BootP < $c THEN $k" }.mkString(" ")} ELSE 9 END"

  /** 90% confidence interval on the mean order value by POISSON bootstrap
    * — the resampling scheme that actually works distributed (Chamandy et
    * al., "Estimating Uncertainty for Massive Data Streams", Google
    * 2012): instead of drawing n rows with replacement (which needs
    * global coordination), each row enters replicate b with weight
    * ~Poisson(1), drawn deterministically from ONE portable md5-derived
    * base hash per order pushed through the [[BootPermA]]/[[BootPermB]]
    * perm family and the literal inverse-CDF table [[PoissonCdfP]] —
    * 1 md5 + B codegen multiply-adds per row instead of B md5
    * evaluations (the MinHashLsh device; at sf1 the fan-out is 15 M × 32
    * rows, so the hash count IS the query's CPU).
    * Shape: a B-way row fan-out (flat map, no shuffle) folded by ONE
    * partial-aggregated groupBy(b) — the shuffle carries B·partitions
    * rows no matter the corpus size — then rank-picks of the 2nd/31st
    * replicate means (the exact discrete-percentile device over B = 32
    * rows). Seeded hash weights make the "resample" bit-identical in
    * both engines, so even the CI bounds hash-attest. Weighted sums lift
    * to decimal(38,0)/HUGEINT; every mean is one truncating division.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val rep = base
      .withColumn("h32", shiftrightunsigned(graft.functions.PortableHash
        .h48(col("o_orderkey").cast("string")), 16))
      .select(col("cents"), col("h32"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .withColumn("u",
        (element_at(typedLit(BootPermA), col("b") + 1) * col("h32")
          + element_at(typedLit(BootPermB), col("b") + 1)) % BootP)
      .select(col("cents"), col("b"), poissonW(col("u")).as("w"))
    val means = rep.groupBy(col("b"))
      .agg(sum(col("w")).as("nw"),
        sum((col("w") * col("cents")).cast(dec)).as("sw"))
      .select(col("b"),
        expr(s"CASE WHEN nw = 0 THEN 0L ELSE (1000 * sw) div CAST(nw AS $dec) END")
          .as("mean_milli"))
    val loRank = math.ceil(0.05 * BootstrapB).toLong
    val hiRank = math.ceil(0.95 * BootstrapB).toLong
    val ci = means
      .withColumn("r", row_number().over(
        Window.orderBy(col("mean_milli"), col("b"))))
      .agg(
        max(when(col("r") === loRank, col("mean_milli"))).as("ci_lo_milli"),
        max(when(col("r") === hiRank, col("mean_milli"))).as("ci_hi_milli"),
        count(lit(1)).as("n_replicates"))
    base
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents").cast(dec)).as("sc"))
      .select(col("n_orders"),
        expr(s"(1000 * sc) div CAST(n_orders AS $dec)").as("mean_milli"))
      .crossJoin(broadcast(ci))
  }

  private val bootstrapCiSql = {
    val h = graft.functions.PortableHash.h48Sql("CAST(o_orderkey AS VARCHAR)")
    val perms = (0 until BootstrapB)
      .map(b => s"($b, ${BootPermA(b)}, ${BootPermB(b)})").mkString(", ")
    s"""WITH base AS (
       |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    $h // 65536 AS h32
       |  FROM orders
       |), wt AS (
       |  SELECT p.b, cents, ${poissonWSql("h32", "p.a", "p.bb")} AS w
       |  FROM base CROSS JOIN (VALUES $perms) p(b, a, bb)
       |), m AS (
       |  SELECT b, CAST(sum(w) AS BIGINT) AS nw, sum(w::HUGEINT * cents) AS sw
       |  FROM wt GROUP BY b
       |), means AS (
       |  SELECT b, CAST(CASE WHEN nw = 0 THEN 0
       |    ELSE (1000 * sw) // nw END AS BIGINT) AS mean_milli
       |  FROM m
       |), r AS (
       |  SELECT b, mean_milli,
       |    row_number() OVER (ORDER BY mean_milli, b) AS r
       |  FROM means
       |), ci AS (
       |  SELECT
       |    max(CASE WHEN r = ${math.ceil(0.05 * BootstrapB).toLong} THEN mean_milli END) AS ci_lo_milli,
       |    max(CASE WHEN r = ${math.ceil(0.95 * BootstrapB).toLong} THEN mean_milli END) AS ci_hi_milli,
       |    count(*) AS n_replicates
       |  FROM r
       |), pt AS (
       |  SELECT count(*) AS n_orders,
       |    CAST((1000 * sum(cents::HUGEINT)) // count(*) AS BIGINT) AS mean_milli
       |  FROM base
       |)
       |SELECT pt.n_orders, pt.mean_milli, ci.ci_lo_milli, ci.ci_hi_milli,
       |  ci.n_replicates
       |FROM pt CROSS JOIN ci""".stripMargin
  }

  // ---- two-sample categorical drift (chi-squared) -------------------------
  private val DriftYearA = 1995
  private val DriftYearB = 1996

  /** Two-sample chi-squared drift test: did the order-priority MIXTURE
    * shift between two years? The 2×5 contingency table comes from ONE
    * partial-aggregated pass over the two slices; the statistic is the
    * textbook Σ(o − e)²/e with e = row·col/n, cross-multiplied so each
    * cell is EXACT integers up to its one truncating division —
    * cell_milli = 1000·(o·n − r·c)² div (n·r·c) — and the per-cell
    * truncation order is fixed (sum of identically-truncated cells), so
    * both engines produce the same integer statistic. This is the
    * categorical complement of `anova_groups` (means) and `token_drift`
    * (per-token ranking): one number answering "reweight or not" with
    * df = (2−1)(cells−1) for the caller's threshold table.
    */
  def chi2Drift(spark: SparkSession, dir: String): DataFrame = {
    val sliced = Tables.orders(spark, dir)
      .select(year(col("o_orderdate").cast("timestamp")).as("yr"),
        col("o_orderpriority").as("prio"))
      .where(col("yr") === DriftYearA || col("yr") === DriftYearB)
      .select(when(col("yr") === DriftYearA, 1L).otherwise(0L).as("in_a"),
        col("prio"))
    val cells = sliced.groupBy(col("prio"))
      .agg(sum(col("in_a")).as("oa"),
        (count(lit(1)) - sum(col("in_a"))).as("ob"))
    val tot = cells.agg(sum(col("oa")).as("ra"), sum(col("ob")).as("rb"))
    cells.crossJoin(broadcast(tot))
      .select(col("prio"), col("oa"), col("ob"), col("ra"), col("rb"),
        (col("oa") + col("ob")).as("cj"))
      .select(
        expr(s"""(1000 * (CAST(oa AS $dec) * (ra + rb) - CAST(ra AS $dec) * cj)
                |      * (CAST(oa AS $dec) * (ra + rb) - CAST(ra AS $dec) * cj))
                |div (CAST(ra + rb AS $dec) * ra * cj)""".stripMargin).as("ca"),
        expr(s"""(1000 * (CAST(ob AS $dec) * (ra + rb) - CAST(rb AS $dec) * cj)
                |      * (CAST(ob AS $dec) * (ra + rb) - CAST(rb AS $dec) * cj))
                |div (CAST(ra + rb AS $dec) * rb * cj)""".stripMargin).as("cb"),
        col("ra"), col("rb"))
      .agg(max(col("ra")).as("n_a"), max(col("rb")).as("n_b"),
        count(lit(1)).as("n_cells"),
        sum(col("ca") + col("cb")).as("chi2_milli"))
      .select(col("n_a"), col("n_b"), col("n_cells"),
        (col("n_cells") - 1).as("df"), col("chi2_milli"))
  }

  private val chi2DriftSql =
    s"""WITH s AS (
       |  SELECT CASE WHEN year(o_orderdate) = $DriftYearA THEN 1 ELSE 0 END AS in_a,
       |    o_orderpriority AS prio
       |  FROM orders
       |  WHERE year(o_orderdate) IN ($DriftYearA, $DriftYearB)
       |), cells AS (
       |  SELECT prio, CAST(sum(in_a) AS BIGINT) AS oa,
       |    CAST(count(*) - sum(in_a) AS BIGINT) AS ob
       |  FROM s GROUP BY prio
       |), tot AS (
       |  SELECT CAST(sum(oa) AS BIGINT) AS ra, CAST(sum(ob) AS BIGINT) AS rb
       |  FROM cells
       |), x AS (
       |  SELECT oa, ob, ra, rb, oa + ob AS cj,
       |    (1000 * (oa::HUGEINT * (ra + rb) - ra::HUGEINT * (oa + ob))
       |          * (oa::HUGEINT * (ra + rb) - ra::HUGEINT * (oa + ob)))
       |      // ((ra + rb)::HUGEINT * ra * (oa + ob)) AS ca,
       |    (1000 * (ob::HUGEINT * (ra + rb) - rb::HUGEINT * (oa + ob))
       |          * (ob::HUGEINT * (ra + rb) - rb::HUGEINT * (oa + ob)))
       |      // ((ra + rb)::HUGEINT * rb * (oa + ob)) AS cb
       |  FROM cells CROSS JOIN tot
       |)
       |SELECT max(ra) AS n_a, max(rb) AS n_b, count(*) AS n_cells,
       |  count(*) - 1 AS df, CAST(sum(ca + cb) AS BIGINT) AS chi2_milli
       |FROM x""".stripMargin

  // ---- cumulative lift table ------------------------------------------------

  /** Cumulative lift table for the stopword-count English scorer: rank the
    * 11 score cells best-first, and per cutoff report how much better the
    * kept slice's positive rate is than the corpus base rate
    * (lift·1000 = (cum_pos·N) ÷ (cum_n·P), exact integer cross-multiply).
    * The lift curve is THE triage readout for a quality gate — "if we can
    * only afford to keep 30 %, how enriched is it" — and is deliberately
    * computed on the SCORE-CELL rollup, not per document: the corpus
    * collapses to ≤ 11 rows before any window runs, so the cumulative
    * pass is constant-size at every scale factor.
    */
  def liftTable(spark: SparkSession, dir: String): DataFrame = {
    val nStop = size(filter(
      graft.functions.TextFns.tokens(lower(col("text"))),
      t => Seq("the", "of", "and", "to", "in", "is", "it", "that", "for",
        "on").map(s => t === lit(s)).reduce(_ || _)))
    val cells = Tables.documents(spark, dir)
      .select(least(nStop, lit(10)).cast("long").as("score"),
        (col("lang") === "en").cast("long").as("y"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = cells.agg(sum(col("n")).as("nn"), sum(col("pos")).as("pp"))
    cells
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("score"), col("n"), col("pos"), col("cum_n"), col("cum_pos"),
        expr("(1000 * CAST(cum_pos AS DECIMAL(38,0)) * nn)" +
          " div (CAST(cum_n AS DECIMAL(38,0)) * pp)").as("lift_milli"))
  }

  private val liftTableSql = {
    val wl = graft.functions.TextFns.tokensSql("lower(text)")
    val stops = Seq("the", "of", "and", "to", "in", "is", "it", "that",
      "for", "on").map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT least(len(list_filter($wl, x -> list_contains($stops, x))),
       |           10)::BIGINT AS score,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents
       |), cells AS (
       |  SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
       |  FROM d GROUP BY score
       |), c AS (
       |  SELECT score, n, pos,
       |    sum(n) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
       |    sum(pos) OVER (ORDER BY score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
       |  FROM cells
       |), tot AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM cells)
       |SELECT score, n, pos,
       |  CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
       |  CAST((1000 * cum_pos * nn) // (cum_n * pp) AS BIGINT) AS lift_milli
       |FROM c CROSS JOIN tot""".stripMargin
  }

  // ---- mean reciprocal rank ------------------------------------------------------

  private val MrrK = 10
  private val MrrBudget = 100L

  /** Mean reciprocal rank of the embedding retrieval against label
    * relevance: per audit query (fixed ~[[MrrBudget]]-query batch — the
    * auditSample device), the rank of the FIRST same-label neighbor in
    * the exact top-[[MrrK]], reciprocal in micro (0 when no relevant
    * neighbor ranks) — the first-hit metric that completes the IR-eval
    * family next to ndcg_eval (graded gains) and avg_precision_k (all
    * hits). Same brute-force integer-cosine contract; the candidate pass
    * swaps to ANN at scale.
    */
  def mrrEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val labels = emb.select(col("vec_id"), col("label"))
    // materialized (≤ budget·k rows): two consumers (first-hit rollup +
    // query census) would each re-run the queries×corpus brute-force leg
    val topk = graft.core.Materialize(
      graft.operators.VectorOps.bruteForceTopK(emb,
        graft.operators.VectorOps.auditSample(emb, "vec_id", MrrBudget),
        "vec_id", "embedding", MrrK))
    val firstHit = topk
      .join(labels.toDF("vec_id", "q_label"),
        col("vec_id") === col("query_id"))
      .join(labels.toDF("cand_vid", "c_label"),
        col("cand_vid") === col("cand_id"))
      .where(col("q_label") === col("c_label"))
      .groupBy(col("query_id")).agg(min(col("rank")).as("first_rank"))
    val queries = topk.select(col("query_id")).distinct()
    queries.join(firstHit, Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(col("first_rank").isNotNull.cast("long")).as("n_with_hit"),
        sum(coalesce(expr("1000000 div first_rank"), lit(0L))).as("rr_sum"))
      .withColumn("mrr_micro", expr("rr_sum div n_queries"))
  }

  private val mrrEvalSql = {
    import graft.operators.VectorOps
    val cos = VectorOps.cosineQSql("q.qq", "v.qv", 64)
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, label, ${VectorOps.quantizeSql("embedding")} AS qv
       |  FROM embeddings
       |), q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, label AS q_label, qv AS qq FROM v
       |  WHERE vec_id % ${VectorOps.auditSampleModSql("embeddings", MrrBudget)} = 0
       |), tk AS MATERIALIZED (
       |  SELECT query_id, q_label, cand_id, c_label, rank FROM (
       |    SELECT q.query_id, q.q_label, v.vec_id AS cand_id,
       |      v.label AS c_label,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round($cos, 6) DESC, v.vec_id) AS rank
       |    FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id) t
       |  WHERE rank <= $MrrK
       |), fh AS (
       |  SELECT query_id, min(rank) AS first_rank FROM tk
       |  WHERE q_label = c_label GROUP BY query_id
       |), qs AS (SELECT DISTINCT query_id FROM tk)
       |SELECT count(*) AS n_queries,
       |  CAST(sum(CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_with_hit,
       |  CAST(sum(coalesce(1000000 // first_rank, 0)) AS BIGINT) AS rr_sum,
       |  CAST(sum(coalesce(1000000 // first_rank, 0)) AS BIGINT)
       |    // count(*) AS mrr_micro
       |FROM qs LEFT JOIN fh USING (query_id)""".stripMargin
  }

  // ---- pass@k estimator ---------------------------------------------------------

  /** Unbiased pass@k estimator (Chen et al. 2021, the Codex paper):
    * per task with n attempts and c successes, pass@k = 1 − C(n−c,k)/C(n,k),
    * averaged over tasks — the estimator every sampled-attempts eval
    * (code generation, tool use, agentic rollouts) reports instead of the
    * biased "any success in the first k" count. Tasks here are users,
    * attempts their events, success a ≥150-value purchase. The binomial
    * ratio collapses to Π_{i<k}(n−c−i)/(n−i), computed as two EXACT
    * integer products per (task, k) — a zero factor (n−c < k) makes the
    * failure term vanish exactly as the combinatorics demand, so no edge
    * CASE exists — then one micro-rounded truncating division. int64
    * holds the k=5 products to ~2 500 attempts/task; lift to decimal
    * beyond. One corpus scan → per-task rollup → 3 k-rows.
    */
  def passAtK(spark: SparkSession, dir: String): DataFrame = {
    val tasks = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase" && col("value") >= 150.0)
          .cast("long")).as("c"))
    tasks
      .crossJoin(broadcast(spark.range(1).select(
        explode(array(lit(1L), lit(3L), lit(5L))).as("k"))))
      .where(col("n") >= col("k"))
      .withColumn("num", expr(
        "aggregate(sequence(0L, k - 1), 1L, (acc, i) -> acc * (n - c - i))"))
      .withColumn("den", expr(
        "aggregate(sequence(0L, k - 1), 1L, (acc, i) -> acc * (n - i))"))
      .withColumn("pass_u", expr("1000000 - (1000000 * num) div den"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tasks"),
        expr("sum(pass_u) div count(1)").as("mean_pass_u"))
  }

  private val passAtKSql =
    """WITH tasks AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND value >= 150e0
      |             THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM events GROUP BY user_id
      |), tk AS (
      |  SELECT user_id, n, c, k
      |  FROM tasks, (SELECT unnest([1, 3, 5]) AS k)
      |  WHERE n >= k
      |), pr AS (
      |  SELECT user_id, k,
      |    1000000 - (1000000 *
      |      list_reduce(list_transform(range(k), i -> n - c - i),
      |                  (acc, x) -> acc * x))
      |      // list_reduce(list_transform(range(k), i -> n - i),
      |                     (acc, x) -> acc * x) AS pass_u
      |  FROM tk
      |)
      |SELECT k, count(*) AS n_tasks,
      |  CAST(sum(pass_u) AS BIGINT) // count(*) AS mean_pass_u
      |FROM pr GROUP BY k""".stripMargin

  // ---- MASE forecast-skill readout -------------------------------------------

  /** Mean-absolute-scaled-error readout for the weekly-seasonal naive
    * forecaster on daily revenue: MAE of the lag-7 forecast scaled by MAE
    * of the lag-1 naive (Hyndman & Koehler 2006). MASE < 1000 (milli)
    * means weekly seasonality genuinely predicts — the go/no-go for the
    * seasonal_forecast operator's model family. Everything after the
    * daily rollup is CALENDAR-bounded: the two lag series are windows on
    * the ≤|days| frame, absolute-error sums are exact cents, and the
    * final ratio is one integer cross-multiply.
    */
  def maseEval(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("y1", lag(col("y"), 1).over(w))
      .withColumn("y7", lag(col("y"), 7).over(w))
      .agg(
        sum(when(col("y7").isNotNull, abs(col("y") - col("y7")))).as("sae7"),
        count(when(col("y7").isNotNull, 1)).as("n7"),
        sum(when(col("y1").isNotNull, abs(col("y") - col("y1")))).as("sae1"),
        count(when(col("y1").isNotNull, 1)).as("n1"))
      .withColumn("mase_milli",
        expr("(1000 * CAST(sae7 AS DECIMAL(38,0)) * n1)" +
          " div (CAST(sae1 AS DECIMAL(38,0)) * n7)"))
  }

  private val maseEvalSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1
      |), l AS (
      |  SELECT y, lag(y, 1) OVER (ORDER BY day) AS y1,
      |    lag(y, 7) OVER (ORDER BY day) AS y7
      |  FROM daily
      |), m AS (
      |  SELECT CAST(sum(CASE WHEN y7 IS NOT NULL THEN abs(y - y7) END) AS BIGINT)
      |      AS sae7,
      |    count(CASE WHEN y7 IS NOT NULL THEN 1 END) AS n7,
      |    CAST(sum(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) END) AS BIGINT)
      |      AS sae1,
      |    count(CASE WHEN y1 IS NOT NULL THEN 1 END) AS n1
      |  FROM l
      |)
      |SELECT sae7, n7, sae1, n1,
      |  CAST((1000 * CAST(sae7 AS HUGEINT) * n1)
      |    // (CAST(sae1 AS HUGEINT) * n7) AS BIGINT) AS mase_milli
      |FROM m""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("eval_confusion", evalConfusion, Some(evalConfusionSql)),
    QueryDef("auc_rank", aucRank, Some(aucRankSql)),
    QueryDef("calibration_bins", calibrationBins, Some(calibrationBinsSql)),
    QueryDef("chi2_tokens", chi2Tokens, Some(chi2TokensSql)),
    QueryDef("cohen_kappa", cohenKappa, Some(cohenKappaSql)),
    QueryDef("acf_daily", acfDaily, Some(acfDailySql)),
    QueryDef("ccf_daily", ccfDaily, Some(ccfDailySql)),
    QueryDef("ndcg_eval", ndcgEval, Some(ndcgEvalSql)),
    QueryDef("gini_concentration", giniConcentration, Some(giniConcentrationSql)),
    QueryDef("hhi_concentration", hhiConcentration, Some(hhiConcentrationSql)),
    QueryDef("bootstrap_ci", bootstrapCi, Some(bootstrapCiSql)),
    QueryDef("chi2_drift", chi2Drift, Some(chi2DriftSql)),
    QueryDef("lift_table", liftTable, Some(liftTableSql)),
    QueryDef("mase_eval", maseEval, Some(maseEvalSql)),
    QueryDef("pass_at_k", passAtK, Some(passAtKSql)),
    QueryDef("mrr_eval", mrrEval, Some(mrrEvalSql)),
  )
}
