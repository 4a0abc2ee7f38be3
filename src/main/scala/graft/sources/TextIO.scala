package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented text I/O:
  *
  *  - plain lines (reference: mapred/TextInputFormat.java +
  *    LineRecordReader.java — lines keyed by byte offset; Spark's
  *    `spark.read.text` is the same scan, offsets available via
  *    `monotonically_increasing_id`-free designs since row identity rarely
  *    matters; `TextOutputFormat.java` with a configurable separator);
  *  - key/value lines split at the FIRST separator occurrence
  *    (reference: mapred/KeyValueLineRecordReader.java:59,87 — key = bytes
  *    before the first tab, value = rest; a line with no separator becomes
  *    (line, "")).
  *
  * Text scans are splittable by line exactly like the reference's
  * block-aligned splits; Spark plans file partitions from
  * `spark.sql.files.maxPartitionBytes`, so a 100 TB text corpus scans with
  * the same parallelism characteristics as a parquet one (minus column
  * pruning, which text cannot give).
  */
object TextIO {

  /** Write a DataFrame as `key<sep>value` text lines (TextOutputFormat). */
  def writeKv(df: DataFrame, keyCol: String, valueCol: String, sep: String,
              path: String): Unit =
    df.select(concat_ws(sep, col(keyCol), col(valueCol)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read text lines. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** First-separator key/value split of a line column
    * (KeyValueLineRecordReader semantics).
    */
  def kvSplit(line: Column, sep: String): (Column, Column) = {
    val parts = split(line, java.util.regex.Pattern.quote(sep), 2)
    // try_element_at: a line with no separator has a 1-element array, and
    // plain element_at THROWS on the missing index under ANSI semantics
    (element_at(parts, 1).as("k"),
      coalesce(try_element_at(parts, lit(2)), lit("")).as("v"))
  }

  /** Read `key<sep>value` lines (missing separator → value = ""). */
  def readKv(spark: SparkSession, path: String, sep: String): DataFrame = {
    val (k, v) = kvSplit(col("value"), sep)
    readLines(spark, path).select(k, v)
  }
}
