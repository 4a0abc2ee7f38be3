package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram ("binned") quantiles: rank statistics with bounded shuffle and
  * a FIXED, documented error — the scale path beside an exact
  * `percentile`/`ORDER BY` rank (which must globally sort, or at least
  * shuffle every distinct value).
  *
  * The input value is quantized to integer `binWidth` buckets (floor — the
  * same IEEE double op in every engine, so the bucketing is portable);
  * the only data-sized operation is the `groupBy(bin).count()` histogram,
  * whose shuffle carries at most one row per OCCUPIED bin with map-side
  * partial aggregation doing the heavy lifting. Everything downstream —
  * the cumulative sum and the rank probe — runs on the O(#bins) histogram,
  * not the data: the global window over bins is a bounded frame by
  * construction (value range / binWidth), which is why the single-partition
  * window is acceptable here and nowhere else.
  *
  * The answer is DETERMINISTIC integer math: the reported quantile is the
  * lower edge of the first bin whose cumulative count reaches ⌈p·N/100⌉ —
  * within one binWidth of the exact order statistic (spec-pinned), and
  * bit-identical to a SQL oracle running the same cumulative-histogram
  * computation, making the sketch attestable like [[KmvSketch]] (not just
  * error-bound-spec'd like a t-digest would be).
  *
  * Reference analog: nothing — the aggregate framework has Min/Max/Sum and
  * a capped exact ValueHistogram (reference src/core/org/apache/hadoop/
  * mapred/lib/aggregate/ValueHistogram.java:40), no rank statistics.
  */
object Quantiles {

  /** @param values   one numeric column `v` (integer-valued after ×100 —
    *                 callers pass cents or another integer-quantized unit)
    * @param binWidth histogram bucket width in the same integer unit
    * @param pcts     requested percentiles, 1..100
    * @return `pct`, `value` — value is the lower edge of the bin that
    *         reaches rank ⌈pct·N/100⌉ (≤ binWidth below the exact order
    *         statistic).
    */
  def binned(values: DataFrame, binWidth: Long, pcts: Seq[Int]): DataFrame = {
    require(binWidth > 0 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val spark = values.sparkSession
    import spark.implicits._

    val hist = values
      .select(expr(s"v div $binWidth").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    // bounded frames: one row per occupied bin
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.orderBy("bin").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val p = pcts.toDF("pct")
    // first bin whose cumulative count reaches the pct rank; broadcast the
    // (tiny) pct frame over the (bounded) histogram
    cum.join(broadcast(p), col("cum") * 100 >= col("pct").cast("long") * col("n"))
      .groupBy("pct")
      .agg((min(col("bin")) * binWidth).as("value"))
  }

  /** Grouped variant of [[binned]]: one histogram per key, windows
    * PARTITIONED by the key (no global window anywhere — each group's
    * cumulative frame is bounded by ITS occupied bins, and groups
    * parallelize across the cluster). The shuffle carries one row per
    * (key, occupied bin): at 100 TB this is the per-tenant / per-slice
    * latency-percentile shape — the exact grouped rank (`mad_outliers`'s
    * windows, `percentiles_exact`) re-sorts every group's rows instead.
    *
    * @param values columns `k` (group key) and `v` (integer-quantized)
    * @return `k`, `pct`, `value` — same rank rule as [[binned]], per key
    */
  def binnedByKey(values: DataFrame, binWidth: Long, pcts: Seq[Int]): DataFrame = {
    require(binWidth > 0 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val spark = values.sparkSession
    import spark.implicits._

    val hist = values
      .select(col("k"), expr(s"v div $binWidth").as("bin"))
      .groupBy("k", "bin").agg(count(lit(1)).as("c"))
    val byK = Window.partitionBy("k").orderBy("bin")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        byK.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy("k").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val p = pcts.toDF("pct")
    cum.join(broadcast(p), col("cum") * 100 >= col("pct").cast("long") * col("n"))
      .groupBy("k", "pct")
      .agg((min(col("bin")) * binWidth).as("value"))
  }
}
