package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Rank-based statistical tests and ranking-quality readouts — the
  * distribution-free complement to [[EvalMetrics]]' parametric metrics:
  * two-sample Kolmogorov-Smirnov (did the VALUE distribution shift, not
  * just its mean), Mann-Whitney U with the rank-biserial effect size (a
  * median-shift test immune to the heavy tails that break t-tests on
  * revenue data), Spearman rank correlation (monotone association between
  * customer frequency and spend), and average precision at k (the ranking
  * metric that grades the quality gate as a RETRIEVAL system, pairing
  * `auc_rank`'s threshold-free view with a top-of-list view).
  *
  * All four are exact-rational by construction — rank statistics are
  * integer arithmetic over counts, so the repo's attestation discipline
  * (BIGINT counts, decimal(38,0)/HUGEINT product lifts, ONE truncating
  * `div`/`//` per reported ratio) applies with no transcendental anywhere
  * except Spearman's final `floor(sqrt(x))` over an integer x ≤ 10⁶,
  * where IEEE-754 correctly-rounded sqrt is bit-identical cross-engine.
  *
  * Scale shape shared by the test trio: the distributed pass aggregates
  * the corpus to a VALUE HISTOGRAM (or per-group frame) — one shuffle,
  * output bounded by the value domain, never the row count — and the
  * rank walk is a window over that compact table (the `auc_rank` /
  * `skyline_parts` compact-domain justification; the documented 100 TB
  * swap-in is the range-partitioned prefix sum of `doc_offsets`).
  *
  * Reference analog: none — the reference has no statistics library;
  * additive capability in the spirit of its aggregate framework.
  */
object RankStats extends QueryModule {

  private val dec = "decimal(38,0)"

  // ---- two slices shared by the two-sample tests ---------------------------
  private val YearA = 1995
  private val YearB = 1996

  /** Per-cents-value histogram of the two order-revenue slices: one
    * partial-aggregated shuffle, |distinct cents| rows out.
    */
  private def twoSampleHist(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate").cast("timestamp")).as("yr"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .where(col("yr") === YearA || col("yr") === YearB)
      .groupBy(col("cents"))
      .agg(sum(when(col("yr") === YearA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("yr") === YearB, 1L).otherwise(0L)).as("cb"))

  private val twoSampleHistSql =
    s"""SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    CAST(sum(CASE WHEN year(o_orderdate) = $YearA THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN year(o_orderdate) = $YearB THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM orders
       |  WHERE year(o_orderdate) IN ($YearA, $YearB)
       |  GROUP BY 1""".stripMargin

  // ---- two-sample Kolmogorov-Smirnov ---------------------------------------
  /** Two-sample KS statistic between the 1995 and 1996 order-value
    * distributions: D = sup |F_A(x) − F_B(x)|, the whole-shape drift test
    * that catches variance/tail changes `chi2_drift`'s category mixture
    * and `anova_groups`' means both miss. Cross-multiplied to stay exact:
    * the reported numerator is max |cumA·n_B − cumB·n_A| over the value
    * histogram's running counts, and D in basis points is that maximum's
    * one truncating division by n_A·n_B. Products lift to
    * decimal(38,0)/HUGEINT (cum·n passes int64 near 3·10⁹ rows per
    * slice). The running-count window is over the compact cents
    * histogram; totals broadcast as a 1-row frame.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val h = twoSampleHist(spark, dir)
    val tot = h.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("cuma").cast(dec) * col("nb")
          - col("cumb").cast(dec) * col("na"))).as("dn"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(dn AS BIGINT)").as("d_num"),
        expr(s"CAST((10000 * dn) div (CAST(n_a AS $dec) * n_b) AS BIGINT)")
          .as("ks_bp"))
  }

  private val ksTestSql =
    s"""WITH h AS (
       |$twoSampleHistSql
       |), t AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
       |  FROM h
       |), c AS (
       |  SELECT
       |    sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cuma,
       |    sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumb
       |  FROM h
       |)
       |SELECT t.na AS n_a, t.nb AS n_b,
       |  CAST(max(abs(cuma::HUGEINT * nb - cumb::HUGEINT * na)) AS BIGINT) AS d_num,
       |  CAST((10000 * max(abs(cuma::HUGEINT * nb - cumb::HUGEINT * na)))
       |       // (na::HUGEINT * nb) AS BIGINT) AS ks_bp
       |FROM c CROSS JOIN t
       |GROUP BY t.na, t.nb""".stripMargin

  // ---- Mann-Whitney U / rank-biserial --------------------------------------
  /** Mann-Whitney U between the same two slices — "is 1996 revenue
    * stochastically larger than 1995" without any normality assumption.
    * From the histogram: U_A = Σ_v ca(v)·(#B below v) + ½·ca(v)·cb(v);
    * reported DOUBLED (`u2 = 2·U_A`) so the tie half stays integer — the
    * `auc_rank` device (AUC and U are the same statistic on different
    * labels). The effect size is the rank-biserial correlation
    * r = 2U/(n_A·n_B) − 1, one signed truncating division in milli units
    * (truncation toward zero in both engines). Products in
    * decimal(38,0)/HUGEINT; the exclusive running count comes from the
    * same compact-histogram window as [[ksTest]].
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val h = twoSampleHist(spark, dir)
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cumb", coalesce(sum(col("cb")).over(w), lit(0L)))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("ca").cast(dec) * (col("cumb") * 2 + col("cb"))).as("u2r"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        expr("CAST(u2r AS BIGINT)").as("u2"),
        expr(s"""CASE WHEN CAST(na AS $dec) * nb = 0 THEN 0L
                |ELSE (1000 * (u2r - CAST(na AS $dec) * nb))
                |     div (CAST(na AS $dec) * nb)
                |END""".stripMargin).as("rb_milli"))
  }

  private val mannWhitneySql =
    s"""WITH h AS (
       |$twoSampleHistSql
       |), c AS (
       |  SELECT ca, cb,
       |    coalesce(sum(cb) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
       |  FROM h
       |), a AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
       |    sum(ca::HUGEINT * (cumb * 2 + cb)) AS u2r
       |  FROM c
       |)
       |SELECT na AS n_a, nb AS n_b, CAST(u2r AS BIGINT) AS u2,
       |  CAST(CASE WHEN na::HUGEINT * nb = 0 THEN 0
       |       ELSE (1000 * (u2r - na::HUGEINT * nb)) // (na::HUGEINT * nb)
       |       END AS BIGINT) AS rb_milli
       |FROM a""".stripMargin

  // ---- Spearman rank correlation -------------------------------------------
  /** Spearman correlation between per-customer order FREQUENCY and
    * lifetime SPEND — does ordering more imply spending more, measured
    * monotonically (Pearson on ranks), immune to the revenue tail. Tied
    * ranks use the standard mid-rank, kept integer by DOUBLING:
    * 2·midrank = 2·rank_min + ties − 1, and since Σ(2·midrank) is exactly
    * n(n+1), centering by the integer mean (n+1) zeroes the cross terms —
    * ρ = Σc_x·c_y / √(Σc_x²·Σc_y²) with every sum an exact integer. The
    * report avoids the square root until the last step: `rho2_micro` =
    * 10⁶·num²/(den_x·den_y) is one truncating division in decimal(38,0)/
    * HUGEINT, and `rho_milli` = sign·floor(√rho2_micro) — an IEEE sqrt
    * over an integer ≤ 10⁶, correctly rounded identically in both
    * engines. num² ≤ n⁶ bounds exactness at ~2·10⁶ customers;
    * beyond, stage the division (documented lift, same class as
    * `auc_rank`'s decimal output). Ranks are computed with the
    * distributed prefix-sum device ([[graft.operators.PrefixRank]]) —
    * no single-partition window anywhere in the plan.
    */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: the frame feeds the x-rank pass and the total
    // count (the y-rank pass chains off the x result), so without the
    // checkpoint the orders groupBy would run twice
    val per = graft.core.Materialize(Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y")))
    val tot = per.agg(count(lit(1)).as("n"))
    // doubled mid-ranks via the distributed prefix-sum device (round 13):
    // a bare Window.orderBy would rank the whole per-customer frame in ONE
    // task — PrefixRank range-partitions on the value and ranks each slice
    // locally, so the plan holds at 100× the customer count
    graft.operators.PrefixRank.withRank2(
        graft.operators.PrefixRank.withRank2(per, "x", "rx2"), "y", "ry2")
      .crossJoin(broadcast(tot))
      .select((col("rx2") - (col("n") + 1)).cast(dec).as("cx"),
        (col("ry2") - (col("n") + 1)).cast(dec).as("cy"),
        col("n"))
      .agg(max(col("n")).as("n_customers"),
        sum(col("cx") * col("cy")).as("num"),
        sum(col("cx") * col("cx")).as("dx"),
        sum(col("cy") * col("cy")).as("dy"))
      .select(col("n_customers"),
        expr(s"""CASE WHEN dx * dy = 0 THEN 0L
                |ELSE CAST((1000000 * num * num) div (dx * dy) AS BIGINT)
                |END""".stripMargin).as("rho2_micro"),
        expr(s"""CASE WHEN dx * dy = 0 THEN 0L
                |ELSE CAST(sign(num) AS BIGINT)
                |     * CAST(floor(sqrt(CAST((1000000 * num * num) div (dx * dy)
                |                             AS DOUBLE))) AS BIGINT)
                |END""".stripMargin).as("rho_milli"))
  }

  private val spearmanCorrSql =
    """WITH per AS (
      |  SELECT o_custkey, count(*) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1
      |), t AS (
      |  SELECT count(*) AS n FROM per
      |), r AS (
      |  SELECT
      |    CAST(rank() OVER (ORDER BY x) * 2
      |      + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx2,
      |    CAST(rank() OVER (ORDER BY y) * 2
      |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry2
      |  FROM per
      |), c AS (
      |  SELECT (rx2 - (n + 1))::HUGEINT AS cx, (ry2 - (n + 1))::HUGEINT AS cy, n
      |  FROM r CROSS JOIN t
      |), a AS (
      |  SELECT max(n) AS n_customers, sum(cx * cy) AS num,
      |    sum(cx * cx) AS dx, sum(cy * cy) AS dy
      |  FROM c
      |)
      |SELECT CAST(n_customers AS BIGINT) AS n_customers,
      |  CAST(CASE WHEN dx * dy = 0 THEN 0
      |       ELSE (1000000 * num * num) // (dx * dy) END AS BIGINT) AS rho2_micro,
      |  CAST(CASE WHEN dx * dy = 0 THEN 0
      |       ELSE CAST(sign(num) AS BIGINT)
      |            * CAST(floor(sqrt(CAST((1000000 * num * num) // (dx * dy)
      |                                    AS DOUBLE))) AS BIGINT)
      |       END AS BIGINT) AS rho_milli
      |FROM a""".stripMargin

  // ---- average precision at k ----------------------------------------------
  private val ApK = 100

  /** Average precision of the quality gate's top-100 — the top-of-list
    * twin to `auc_rank` (AUC weighs every threshold equally; AP weighs
    * the head, which is what a "route the best docs to annotation" gate
    * actually serves). Ties are broken (score DESC, doc_id ASC) so the
    * ranking is a total order both engines agree on by construction. The
    * per-rank term 10⁶·tp_k div k truncates identically cross-engine and
    * the terms sum in a fixed per-rank order, so AP@k attests exactly;
    * the normalizer is min(P, k) with P the corpus-wide positive count
    * (broadcast 1-row frame). Scale shape: the top-k is orderBy+limit →
    * TakeOrdered (per-partition heaps, bounded merge — never a global
    * sort); the rank window then runs over k = 100 rows.
    */
  def avgPrecisionK(spark: SparkSession, dir: String): DataFrame = {
    val sc = Tables.documents(spark, dir).select(
      TextAnalysis.classifierScore.as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
      col("doc_id"))
    val ptot = sc.agg(sum(col("pos")).as("np"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    sc.orderBy(col("score").desc, col("doc_id")).limit(ApK)
      .withColumn("k", row_number().over(w))
      .withColumn("tp", sum(col("pos")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(ptot))
      .agg(max(col("np")).as("n_pos_total"),
        sum(col("pos")).as("n_pos_topk"),
        sum(when(col("pos") === 1, expr("(1000000 * tp) div k"))
          .otherwise(0L)).as("apsum"))
      .select(lit(ApK.toLong).as("k_cut"), col("n_pos_total"),
        col("n_pos_topk"),
        expr(s"""CASE WHEN least(n_pos_total, ${ApK}L) = 0 THEN 0L
                |ELSE apsum div least(n_pos_total, ${ApK}L)
                |END""".stripMargin).as("ap_micro"))
  }

  private val avgPrecisionKSql =
    s"""WITH s AS (
       |  SELECT ${TextAnalysis.classifierScoreSql} AS score,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, doc_id
       |  FROM documents
       |), p AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS np FROM s
       |), top AS (
       |  SELECT score, pos, doc_id FROM s
       |  ORDER BY score DESC, doc_id LIMIT $ApK
       |), r AS (
       |  SELECT pos,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS k,
       |    CAST(sum(pos) OVER (ORDER BY score DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp
       |  FROM top
       |)
       |SELECT CAST($ApK AS BIGINT) AS k_cut, p.np AS n_pos_total,
       |  CAST(sum(r.pos) AS BIGINT) AS n_pos_topk,
       |  CAST(CASE WHEN least(p.np, $ApK) = 0 THEN 0
       |       ELSE sum(CASE WHEN r.pos = 1 THEN (1000000 * r.tp) // r.k
       |                ELSE 0 END) // least(p.np, $ApK)
       |       END AS BIGINT) AS ap_micro
       |FROM r CROSS JOIN p
       |GROUP BY p.np""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("ks_test", ksTest, Some(ksTestSql)),
    QueryDef("mann_whitney", mannWhitney, Some(mannWhitneySql)),
    QueryDef("spearman_corr", spearmanCorr, Some(spearmanCorrSql)),
    QueryDef("avg_precision_k", avgPrecisionK, Some(avgPrecisionKSql)),
  )
}
