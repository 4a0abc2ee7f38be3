package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Total-order sort + global ranking, the Spark-native equivalent of the
  * reference's TotalOrderPartitioner + InputSampler pipeline
  * (reference: mapred/lib/TotalOrderPartitioner.java:41-112,
  * mapred/lib/InputSampler.java:311-343): sample keys → range split points →
  * each partition holds a contiguous key range, sorted within.
  *
  * `repartitionByRange` IS that operator (Spark's RangePartitioner does the
  * reservoir sampling), so the only work left is assigning contiguous global
  * ranks without funnelling all rows through a single-partition window:
  * `zipWithIndex` runs one lightweight count job for the per-partition
  * offsets (the same two-pass trick the reference's terasort validator uses)
  * and then stamps ranks partition-locally. Scales linearly with partitions.
  */
object TotalOrderSort {

  /** Rows of `df` sorted by `sortCols` with a 1-based contiguous global rank
    * column appended. Ties must be broken by the caller's sort columns for a
    * deterministic rank (pass a unique key as the last column).
    */
  def rank(df: DataFrame, sortCols: Seq[Column], rankCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val out = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, out)
  }

  /** Plain total-order sort (terasort shape): globally ordered output,
    * range-partitioned so downstream writers emit globally sorted files.
    */
  def sort(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
}
