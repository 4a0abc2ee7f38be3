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

  /** Scan-width floor for the local corpus — the single-row-group
    * correction. The driver writes each table as ONE parquet file with ONE
    * row group, and a row group is the unit of scan parallelism: no
    * `maxPartitionBytes` setting can split it, so every scan-stage
    * pipeline (tokenize, shingle, hash fan-out — where most of the
    * catalog's per-row CPU lives) ran on ONE of the 32 local cores. At
    * production scale a 100 TB table arrives as thousands of row groups
    * and scans are naturally wide — this correction reproduces that
    * layout locally: a one-time per-corpus relayout into `defaultParallelism`
    * files (served through [[graft.sources.FrameStore]], so it is keyed by
    * corpus fingerprint and can never serve a stale or foreign corpus),
    * after which every scan parallelizes with ZERO per-query shuffle.
    * Measured on the round-12 bench (sf0.1): bootstrap_ci 3.0 → 0.6 s,
    * textrank/char_entropy-class text pipelines 2-4×.
    *
    * Gates: tables under [[WidenMinBytes]] stay as-is (broadcast dims — a
    * 32-file region table is pure scheduling overhead), and sources that
    * already ship ≥ width/2 files skip the copy (measured by LISTING, not
    * assumed — the ScaleUp sf1 corpus turns out to coalesce to 1–2 files
    * per table, so it is widened too). `GRAFT_WIDEN=0` disables the
    * device for A/B measurement.
    */
  private val WidenMinBytes = 500000L
  private val widenEnabled = sys.env.getOrElse("GRAFT_WIDEN", "1") != "0"

  private def listParquet(path: java.io.File): Seq[java.io.File] =
    if (path.isDirectory)
      path.listFiles().toSeq.filter(f => f.getName.endsWith(".parquet"))
    else Seq(path)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val width = spark.sparkContext.defaultParallelism
    val files = listParquet(new java.io.File(path))
    val bytes = files.map(_.length).sum
    if (!widenEnabled || bytes < WidenMinBytes || files.size >= width / 2)
      spark.read.parquet(path)
    else {
      // Range-repartition on the table's natural leading key (l_orderkey,
      // doc_id, ...) and sort within partitions — NOT round-robin: the
      // driver's files arrive clustered on that key, and a round-robin
      // relayout destroys the clustering that key-grouped consumers lean
      // on (measured: the lineitem→co-purchase-edge groupBy behind
      // bfs_hops/graph_diameter ran ~60% slower on a round-robin relayout
      // because map-side combine saw every partition carrying the whole
      // key space). Range+sort reproduces the clustered many-row-group
      // layout a production corpus actually has, and keeps per-file
      // min/max stats on the key usable for pushdown pruning.
      val raw = spark.read.parquet(path)
      val key = col(raw.columns.head)
      // sourceTable is the LISTING PATH under sfDir ("documents.parquet",
      // the Bm25Store/incStoredFrames convention), not the bare table name:
      // round 12 passed `name`, corpusFingerprint hashed an empty listing,
      // and every corpus produced the same constant fingerprint — a corpus
      // regenerated in place would have kept serving the stale widened copy
      graft.sources.FrameStore.frame(
          spark, sfDir, s"wide_$name", 3, s"$name.parquet")(
        raw.repartitionByRange(width, key).sortWithinPartitions(key))
    }
  }

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
