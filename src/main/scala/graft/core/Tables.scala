package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver corpus (TESTDATA.md): TPC-H-ish star schema plus
  * `events` (ns-timestamp log), `documents` (text corpus) and `embeddings`
  * (64-dim float vectors).
  *
  * All loads are plain parquet scans — column pruning and predicate pushdown
  * stay with Catalyst (verify with `.explain`: `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is normalized here to a LongType epoch-nanos column no
    * matter how the corpus was written, so every caller does plain integer
    * time math (`ts div 1000` = µs) and the DuckDB-side equivalence is
    * always `epoch_ns(ts)`:
    *   - parquet TIMESTAMP(NANOS) arrives as epoch-nanos LongType already
    *     (`spark.sql.legacy.parquet.nanosAsLong=true` in [[GraftSession]]);
    *   - parquet TIMESTAMP(MICROS) arrives as a timestamp column (NTZ or
    *     LTZ depending on `isAdjustedToUTC`) and is converted via
    *     `unix_micros * 1000` — exact, since µs-granular values have no
    *     sub-µs part to lose. The NTZ→TZ cast is value-identical because
    *     [[GraftSession]] pins the session timezone to UTC.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // contract: an INT64 ts column IS epoch-nanos. That is what
      // nanosAsLong produces from TIMESTAMP(NANOS), and no other int64
      // encoding reaches this branch from the driver corpus. A plain
      // un-annotated int64 storing epoch-micros would silently pass 1000×
      // off — so TablesSpec pins the magnitude (2020..2040 when read as
      // nanos), which catches any unit drift at test time, not in results.
      case LongType => raw
      case _ =>
        raw.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
}
