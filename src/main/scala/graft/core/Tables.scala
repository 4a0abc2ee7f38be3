package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.ts` is parquet TIMESTAMP(NANOS) → LongType epoch-nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[GraftSession]]).
    * Callers do time math on the nanos long; DuckDB-side equivalence is
    * `epoch_ns(ts)`.
    */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
}
