package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number()`/`rank()` over a GLOBAL
  * order without the single-partition window a bare `Window.orderBy`
  * plans (one task ranks the whole frame; at 100× scale that is tens of
  * millions of rows through one reducer).
  *
  * The device is the range-partitioned prefix sum of
  * [[graft.catalog.TextAnalysis]].docOffsets, generalized: range-partition
  * on the sort key → every partition ranks ONLY its slice (a local
  * window) → add the partition's base offset, computed from the
  * per-partition row counts through a window over `pid` — a frame bounded
  * by the partition COUNT (32 locally, a few thousand on a real cluster),
  * never by the data. The frame is materialized once so the partition ids
  * seen by the base-offset aggregate and the main pass come from the same
  * physical partitioning (range sampling is otherwise re-drawn per
  * action).
  *
  * Reference analog: TotalOrderPartitioner + per-reducer local sort is
  * exactly how the reference produces globally sorted/ranked output
  * (reference src/mapred/org/apache/hadoop/mapred/lib/
  * TotalOrderPartitioner.java) — no reducer ever sees the whole key space.
  */
object PrefixRank {

  private def parted(df: DataFrame, sortCols: Seq[Column])
      : (DataFrame, DataFrame) = {
    val parts = graft.core.Materialize(
      df.repartitionByRange(sortCols: _*)
        .withColumn("__pr_pid", spark_partition_id()))
    val base = parts.groupBy(col("__pr_pid"))
      .agg(count(lit(1)).as("__pr_cnt"))
      .withColumn("__pr_base",
        coalesce(sum(col("__pr_cnt")).over(
          Window.orderBy(col("__pr_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pr_pid"), col("__pr_base"))
    (parts, base)
  }

  /** `row_number() OVER (ORDER BY sortCols)` as a LongType column `out`.
    * `sortCols` must be a total order (include a tiebreaker key) for the
    * numbering to be deterministic — same contract as the window it
    * replaces.
    */
  def withRowNumber(df: DataFrame, out: String, sortCols: Column*)
      : DataFrame = {
    val (parts, base) = parted(df, sortCols)
    parts.join(broadcast(base), "__pr_pid")
      .withColumn(out,
        col("__pr_base") + row_number().over(
          Window.partitionBy(col("__pr_pid")).orderBy(sortCols: _*))
          .cast("long"))
      .drop("__pr_pid", "__pr_base")
  }

  /** The doubled mid-rank `2·rank_min + ties − 1` over one value column
    * (the integer-exact tied-rank device of the Spearman recipe) as a
    * LongType column `out`. Ties are safe to rank locally: the range
    * partitioner assigns a partition by comparing the VALUE against the
    * sampled bounds, so equal values always land in the same partition —
    * `rank()` within (pid) IS the global rank_min after the base offset,
    * and the tie count within (pid, value) IS the global tie count.
    */
  def withRank2(df: DataFrame, value: String, out: String): DataFrame = {
    val (parts, base) = parted(df, Seq(col(value)))
    parts.join(broadcast(base), "__pr_pid")
      .withColumn(out,
        (col("__pr_base") + rank().over(
          Window.partitionBy(col("__pr_pid")).orderBy(col(value)))
          .cast("long")) * 2
          + count(lit(1)).over(
            Window.partitionBy(col("__pr_pid"), col(value)))
          - 1)
      .drop("__pr_pid", "__pr_base")
  }
}
