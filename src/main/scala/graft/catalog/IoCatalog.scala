package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Scratch, Tables}
import graft.sources.{JdbcIO, MapFileIO, MultiSink, SequenceFileIO, TextIO, TFileIO}

/** The non-parquet I/O surface, proven by write→read-back round trips:
  * every query here WRITES through a sink, READS the result back through
  * the matching source, and the oracle recomputes the same answer straight
  * from the parquet corpus — green means the round trip preserved the data
  * byte-for-byte.
  */
object IoCatalog extends QueryModule {

  // ---- text lines round trip (TextInputFormat/TextOutputFormat) -----------
  /** documents → `doc_id\tn_chars` text lines → read back → parse. */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("text_roundtrip", dir)
    TextIO.writeKv(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", "\t", path)
    TextIO.readKv(spark, path, "\t")
      .select(col("k").cast("long").as("doc_id"),
        col("v").cast("long").as("n_chars"))
  }

  private val textRoundtripSql =
    "SELECT doc_id, n_chars FROM documents"

  // ---- KV-text first-separator semantics (KeyValueLineRecordReader) -------
  /** Values CONTAIN the separator — proves the split is at the first
    * occurrence only (reference: mapred/KeyValueLineRecordReader.java:87).
    */
  def kvTextSeparator(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("kv_text_separator", dir)
    val lines = Tables.documents(spark, dir)
      .select(col("source"),
        concat_ws("\t", col("lang"), col("doc_id")).as("payload"))
    TextIO.writeKv(lines, "source", "payload", "\t", path)
    TextIO.readKv(spark, path, "\t")
  }

  private val kvTextSeparatorSql =
    "SELECT source AS k, lang || chr(9) || doc_id AS v FROM documents"

  // ---- SequenceFile round trip --------------------------------------------
  /** (doc_id, text) through the reference's own binary container format. */
  def seqfileRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("seqfile_roundtrip", dir)
    SequenceFileIO.write(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), path)
    SequenceFileIO.read(spark, path)
      .select(col("key").as("doc_id"), length(col("value")).as("n_chars"))
  }

  private val seqfileRoundtripSql =
    "SELECT doc_id, len(text) AS n_chars FROM documents"

  // ---- SequenceFile.Sorter analog (io/SequenceFile.java:2211) -------------
  /** Deliberately key-shuffled (UNSORTED) sequence files in →
    * [[graft.sources.SeqFileSorter]] sort/merge → read the output back in
    * PHYSICAL on-disk order with global positions stamped. The oracle's
    * `row_number() OVER (ORDER BY key)` matches only if the bytes on disk
    * are globally sorted — rank, key and value all hash-compared. Keys are
    * the UNIQUE o_orderkey (the Sorter's merge order among equal keys is
    * unspecified, so a tied key would make the rank nondeterministic).
    */
  def seqfileSort(spark: SparkSession, dir: String): DataFrame = {
    val in = Scratch.dir("seqfile_sort_in", dir)
    val out = Scratch.dir("seqfile_sort", dir)
    SequenceFileIO.write(
      Tables.orders(spark, dir)
        .select(col("o_orderkey").as("key"),
          concat(col("o_orderstatus"), lit("|"), col("o_orderpriority")).as("value"))
        .repartition(8),
      in)
    graft.sources.SeqFileSorter.sort(spark, in, out)
    graft.sources.SeqFileSorter.readOrdered(spark, out)
  }

  private val seqfileSortSql =
    """SELECT CAST(row_number() OVER (ORDER BY key) AS BIGINT) AS rn, key, value
      |FROM (SELECT o_orderkey AS key,
      |             o_orderstatus || '|' || o_orderpriority AS value FROM orders)""".stripMargin

  // ---- GenericWritable tagged-union values (io/GenericWritable.java:56) ----
  /** One SequenceFile whose values MIX types — even doc_ids carry an
    * IntWritable (char count), odd ones a Text (language) — behind the
    * reference's compact 1-byte-ordinal union framing
    * ([[graft.sources.GenericWritableIO.UnionValue]]). Read back as the
    * tagged struct `(key, tag, int_val, str_val)`; the oracle rebuilds the
    * same union by CASE, so a wrong ordinal, a swapped arm, or a decode on
    * the wrong branch is a red row. The ObjectWritable (class-name-framed)
    * twin of the same wire trip is pinned in the spec.
    */
  def genericWritableUnion(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("generic_writable_union", dir)
    graft.sources.GenericWritableIO.writeUnion(
      Tables.documents(spark, dir).select(
        col("doc_id").as("key"),
        when(col("doc_id") % 2 === 0, lit("int")).otherwise(lit("text")).as("tag"),
        when(col("doc_id") % 2 === 0, col("n_chars")).as("int_val"),
        when(col("doc_id") % 2 =!= 0, col("lang")).as("str_val")),
      path)
    graft.sources.GenericWritableIO.readUnion(spark, path)
  }

  private val genericWritableUnionSql =
    """SELECT doc_id AS key,
      |       CASE WHEN doc_id % 2 = 0 THEN 'int' ELSE 'text' END AS tag,
      |       CASE WHEN doc_id % 2 = 0 THEN n_chars END AS int_val,
      |       CASE WHEN doc_id % 2 <> 0 THEN lang END AS str_val
      |FROM documents""".stripMargin

  // ---- SetFile round trip (io/SetFile.java:27) -----------------------------
  /** High-quantity part keys → on-disk SetFile parts (sorted key set) →
    * distributed read-back. Membership `Reader.seek` probes are pinned in
    * IoSpec; the oracle recomputes the set from parquet.
    */
  def setfileRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("setfile_roundtrip", dir)
    graft.sources.SetArrayFileIO.writeSet(
      Tables.lineitem(spark, dir).where(col("l_quantity") >= 45)
        .select(col("l_partkey")), path)
    graft.sources.SetArrayFileIO.readSet(spark, path, "part_id")
  }

  private val setfileRoundtripSql =
    "SELECT DISTINCT l_partkey AS part_id FROM lineitem WHERE l_quantity >= 45"

  // ---- ArrayFile positional lookup (io/ArrayFile.java:29) ------------------
  /** Part names in p_partkey order → one on-disk ArrayFile (dense 0..n-1
    * keys) → positional `Reader.get(n)` on every 97th index. The oracle
    * derives the same positions with row_number, so a single off-by-one in
    * the writer's key stamping or the reader's seek is a red row.
    */
  def arrayfileLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Scratch.dir("arrayfile_lookup", dir) + "/parts.array"
    graft.sources.SetArrayFileIO.writeArray(
      Tables.part(spark, dir).select(col("p_partkey"), col("p_name")),
      "p_partkey", "p_name", path)
    val n = Tables.part(spark, dir).count()
    graft.sources.SetArrayFileIO.getArray(spark, path, 0L.until(n, 97L))
      .toDF("idx", "p_name")
  }

  private val arrayfileLookupSql =
    """WITH t AS (SELECT CAST(row_number() OVER (ORDER BY p_partkey) - 1 AS BIGINT) AS idx,
      |                  p_name FROM part)
      |SELECT idx, p_name FROM t WHERE idx % 97 = 0""".stripMargin

  // ---- partitioned upsert (corpus refresh) --------------------------------
  /** MERGE-by-partition-rewrite — the corpus-refresh shape a plain-parquet
    * lake actually runs (no txn log, so upsert = rewrite the partitions the
    * batch touches, leave the rest byte-identical):
    *
    *  1. seed: documents partitioned by `source` (20 partitions);
    *  2. update batch: edits in src3/src7 (n_chars + 1000 for doc_id % 4)
    *     plus inserts into src3 (doc_id + 10M for doc_id % 10);
    *  3. merge: semi-join the table to the batch's TOUCHED sources (a
    *     broadcast of ≤|sources| rows — untouched partitions never enter
    *     the plan), anti-join out superseded doc_ids, union the batch,
    *     eagerly materialize (the read path must be fully consumed before
    *     dynamic overwrite starts deleting its input files), and
    *     dynamic-overwrite — only src3/src7 are rewritten, the other 18
    *     keep their files (pinned in UpsertSpec by file listing).
    *
    * At 100 TB the rewrite cost is O(touched partitions), not O(table) —
    * the same `(partition ownership + dynamic overwrite)` contract as the
    * streaming [[graft.streaming.StreamingOps.routeBatch]] sink. The
    * oracle replays the merge relationally (anti-join + union), so a
    * dropped insert, a surviving superseded row, or a clobbered untouched
    * partition is a red row.
    */
  def upsertPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("upsert_partitioned", dir)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // seed once (complete = _SUCCESS present): re-seeding every run would
    // rewrite ALL partitions and hide exactly the property this op exists
    // for. The merge below is IDEMPOTENT — the batch derives from the
    // source table, and every batch doc_id is anti-joined out before the
    // union — so re-running against an already-merged table converges.
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      base.write.mode("overwrite").partitionBy("source").parquet(path)
      // first-attempt seed write, attributed (the shared_builds
      // convention) — later attempts merge against the seeded table
      graft.core.Shared.noteBuild("seed:upsert_partitioned")
    }
    // gate on the row index WITHIN the source (doc_id div 20): the corpus
    // assigns doc_id ≡ source-index (mod 20), so a raw doc_id % k gate
    // would silently select all-or-nothing per source
    val updates = base
      .filter(col("source").isin("src3", "src7") &&
        expr("(doc_id div 20) % 4") === 0)
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(base.filter(col("source") === "src3" &&
          expr("(doc_id div 20) % 10") === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("source"), col("n_chars")))
    val touched = updates.select(col("source")).distinct()
    val table = spark.read.parquet(path)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val merged = graft.core.Materialize(
      table.join(broadcast(touched), Seq("source"), "left_semi")
        .join(updates.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
        .unionByName(updates))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
  }

  private val upsertPartitionedSql =
    """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
      |upd AS (
      |  SELECT doc_id, source, n_chars + 1000 AS n_chars FROM base
      |  WHERE source IN ('src3','src7') AND (doc_id // 20) % 4 = 0
      |  UNION ALL
      |  SELECT doc_id + 10000000, source, n_chars FROM base
      |  WHERE source = 'src3' AND (doc_id // 20) % 10 = 0
      |),
      |merged AS (
      |  SELECT b.* FROM base b
      |  LEFT JOIN (SELECT DISTINCT doc_id FROM upd) u ON b.doc_id = u.doc_id
      |  WHERE u.doc_id IS NULL
      |  UNION ALL SELECT * FROM upd
      |)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM merged GROUP BY source""".stripMargin

  // ---- incremental aggregate maintenance ----------------------------------
  /** MERGE-refresh of a STORED aggregate — the materialized-view
    * maintenance shape beside [[upsertPartitioned]]'s row-level merge: a
    * per-source summary (count / sum / max) over the base corpus is
    * persisted to parquet, and when the delta batch arrives the refresh is
    * `stored ∪ partial-agg(delta) → re-aggregate` — cost O(delta + keys),
    * NEVER a rescan of the base. This works because count/sum/max are
    * commutative monoids — the same algebra that lets Catalyst partial-
    * aggregate map-side is applied across TIME; avg is deliberately
    * derived from (sum, count) at read-out, since avg itself does not
    * merge. At 100 TB the stored-summary + delta-merge refresh is the
    * difference between a nightly full scan and a seconds-long update.
    * The oracle recomputes from the full corpus — merged partials must
    * equal the scratch-free recompute exactly.
    */
  def deltaAgg(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("delta_agg", dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    def partial(df: DataFrame): DataFrame = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        max(col("n_chars")).as("max_chars"))
    // "yesterday's" stored summary: the base slice, aggregated + persisted
    partial(docs.where(expr("doc_id % 5 != 0")))
      .write.mode("overwrite").parquet(path)
    // refresh: stored partials ∪ delta partials, merged per key
    spark.read.parquet(path)
      .unionByName(partial(docs.where(expr("doc_id % 5 = 0"))))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("chars")).as("chars"),
        max(col("max_chars")).as("max_chars"))
      .withColumn("avg_chars", expr("chars div n_docs"))
  }

  private val deltaAggSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) // count(*) AS BIGINT) AS avg_chars
      |FROM documents GROUP BY source""".stripMargin

  // ---- z-order (Morton) clustered layout ----------------------------------
  /** Multi-dimensional clustering ([[graft.operators.ZOrder]]): lineitem
    * laid out by the Morton code of (l_partkey, l_suppkey) — both dims
    * scaled to 8-bit ranks first so the interleave yields square tiles
    * (unscaled, the wider key's high bits dominate and the layout
    * degenerates to single-column sort). The table is range-partitioned +
    * sorted by the curve value, which is then DROPPED — the layout is the
    * product. The read-back box query answers from parquet min/max
    * pushdown over a small fraction of files; ZOrderSpec proves the
    * skipping (a suppkey-only band touches ~¼ of z-ordered files vs ALL
    * partkey-sorted ones). The oracle computes the same box aggregate
    * straight from the unclustered corpus — layout must never change
    * results.
    */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("zorder_cluster", dir)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    // stats pass for the rank scaling — 4 longs to the driver; at scale
    // these come from parquet footer min/max, not a data scan
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    li.withColumn("z", graft.operators.ZOrder.morton(
        graft.operators.ZOrder.scaleTo256(col("l_partkey"), b.getLong(0), b.getLong(1)),
        graft.operators.ZOrder.scaleTo256(col("l_suppkey"), b.getLong(2), b.getLong(3))))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .filter(col("l_partkey").between(400, 599) && col("l_suppkey").between(20, 39))
      .groupBy((col("l_partkey") % 8).as("pk_band"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
  }

  private val zorderClusterSql =
    """SELECT l_partkey % 8 AS pk_band, count(*) AS n,
      |  CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_partkey BETWEEN 400 AND 599 AND l_suppkey BETWEEN 20 AND 39
      |GROUP BY 1""".stripMargin

  // ---- Hilbert-curve clustered layout -------------------------------------
  /** [[zorderCluster]]'s locality-superior twin
    * ([[graft.operators.HilbertCurve]]): same rank-scale → curve-sort →
    * drop pipeline, but the continuous Hilbert index replaces the Morton
    * interleave — every curve step moves one cell, so file curve-ranges
    * tile into more compact boxes and a 2-D box predicate overlaps fewer
    * row-groups (HilbertSpec measures the layouts head-to-head). The curve
    * value is pure unrolled column arithmetic (8 when/xor rounds,
    * codegen'd, no UDF, no lookup join). The oracle answers the box from
    * the unclustered corpus — layout must never change results.
    */
  def hilbertCluster(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("hilbert_cluster", dir)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    graft.operators.HilbertCurve.withIndex(li, 8,
        graft.operators.ZOrder.scaleTo256(col("l_partkey"), b.getLong(0), b.getLong(1)),
        graft.operators.ZOrder.scaleTo256(col("l_suppkey"), b.getLong(2), b.getLong(3)),
        "h")
      .repartitionByRange(16, col("h"))
      .sortWithinPartitions("h")
      .drop("h")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .filter(col("l_partkey").between(800, 999) && col("l_suppkey").between(60, 79))
      .groupBy((col("l_suppkey") % 8).as("sk_band"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
  }

  private val hilbertClusterSql =
    """SELECT l_suppkey % 8 AS sk_band, count(*) AS n,
      |  CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_partkey BETWEEN 800 AND 999 AND l_suppkey BETWEEN 60 AND 79
      |GROUP BY 1""".stripMargin

  // ---- partitioned layout + partition pruning -----------------------------
  /** Hive-style partitioned parquet layout (`partitionBy(day_bucket)`) and
    * the read that justifies it: a day-range filter that must resolve at
    * PLANNING time against directory names — pruned partitions are never
    * opened, which at 100 TB is the difference between scanning 3 days and
    * scanning 3 years. PlanSpec pins the `PartitionFilters` placement; the
    * oracle recomputes from the unpartitioned table.
    */
  def partitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("partition_prune", dir)
    val dayUs = 86400L * 1000 * 1000
    Tables.events(spark, dir)
      .withColumn("day_bucket", expr(s"(ts div 1000) div ${dayUs}L"))
      .withColumn("ts_us", expr("ts div 1000"))
      .select("event_id", "ts_us", "event_type", "value", "day_bucket")
      .write.mode("overwrite").partitionBy("day_bucket").parquet(path)
    // partition-column inference types small ints as int32 — cast back to
    // long AFTER the pruning filter so the oracle's BIGINT schema matches
    spark.read.parquet(path)
      .where(col("day_bucket") >= 19725 && col("day_bucket") <= 19727)
      .groupBy(col("day_bucket").cast("long").as("day_bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))
  }

  private val partitionPruneSql =
    """SELECT epoch_us(ts) // 86400000000 AS day_bucket, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events
      |WHERE epoch_us(ts) // 86400000000 BETWEEN 19725 AND 19727
      |GROUP BY 1, 2""".stripMargin

  // ---- Hadoop Archive (HAR) round trip ------------------------------------
  /** Small-files packing through a real on-disk HAR ([[graft.sources.HarIO]]
    * writes the version-3 layout; the STOCK Hadoop `HarFileSystem` serves
    * the `har://` read). One archived file per selected doc; the read is a
    * distributed text scan whose splits come from the archive index.
    */
  def harRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("har_roundtrip", dir) + "/docs.har"
    graft.sources.HarIO.write(
      Tables.documents(spark, dir).where(col("doc_id") % 25 === 0)
        .select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("name"),
          col("text")),
      "name", "text", path, numParts = 4)
    graft.sources.HarIO.readText(spark, path)
      .select(
        regexp_extract(col("name"), "doc_(\\d+)\\.txt", 1)
          .cast("long").as("doc_id"),
        length(col("content")).as("n_chars"))
  }

  private val harRoundtripSql =
    "SELECT doc_id, len(text) AS n_chars FROM documents WHERE doc_id % 25 = 0"

  // ---- binary SequenceFile round trip (SequenceFileAsBinary*Format) -------
  /** Opaque binary payloads through the container: key = UTF-8 bytes of the
    * doc id, value = raw text bytes; read back and verified by decoding —
    * proves the format carries arbitrary bytes uncorrupted.
    */
  def seqfileBinaryRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("seqfile_binary_roundtrip", dir)
    SequenceFileIO.writeBinary(
      Tables.documents(spark, dir).select(
        encode(col("doc_id").cast("string"), "UTF-8").as("k"),
        encode(col("text"), "UTF-8").as("v")), path)
    SequenceFileIO.readBinary(spark, path)
      .select(decode(col("key"), "UTF-8").cast("long").as("doc_id"),
        length(col("value")).as("n_bytes"))
  }

  private val seqfileBinaryRoundtripSql =
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents"

  // ---- BLOCK-compressed SequenceFile round trip ---------------------------
  /** (doc_id, text) through a BLOCK-compressed SequenceFile (reference:
    * io/SequenceFile.java:211 CompressionType.BLOCK): the query self-checks
    * the on-disk header really says BLOCK before reading back through the
    * transparent decompressing scan.
    */
  def seqfileBlockCompressed(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("seqfile_block_compressed", dir)
    SequenceFileIO.writeBlockCompressed(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), path)
    val ct = SequenceFileIO.compressionType(spark, path)
    require(ct == org.apache.hadoop.io.SequenceFile.CompressionType.BLOCK,
      s"expected BLOCK compression on disk, found $ct")
    SequenceFileIO.read(spark, path)
      .select(col("key").as("doc_id"), length(col("value")).as("n_chars"))
  }

  private val seqfileBlockCompressedSql =
    "SELECT doc_id, len(text) AS n_chars FROM documents"

  // ---- DefaultCodec (zlib) RECORD-compressed round trip -------------------
  /** (doc_id, text) through a RECORD-compressed SequenceFile with the
    * reference's default zlib codec (reference:
    * io/compress/DefaultCodec.java — the codec every job gets unless it
    * overrides mapred.output.compression.codec). Completes the codec trio:
    * gzip (compressed_roundtrip), bzip2 (bzip2_roundtrip), zlib here. The
    * query self-checks the header really says RECORD + DefaultCodec before
    * the transparent decompressing read-back.
    */
  def seqfileDefaultCodec(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("seqfile_default_codec", dir)
    SequenceFileIO.writeCompressed(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), path,
      org.apache.hadoop.io.SequenceFile.CompressionType.RECORD)
    val ct = SequenceFileIO.compressionType(spark, path)
    val codec = SequenceFileIO.compressionCodecName(spark, path)
    require(ct == org.apache.hadoop.io.SequenceFile.CompressionType.RECORD &&
        codec == "DefaultCodec",
      s"expected RECORD/DefaultCodec on disk, found $ct/$codec")
    SequenceFileIO.read(spark, path)
      .select(col("key").as("doc_id"), length(col("value")).as("n_chars"))
  }

  private val seqfileDefaultCodecSql =
    "SELECT doc_id, len(text) AS n_chars FROM documents"

  // ---- BZip2 text round trip (splittable compression) ---------------------
  /** One bzip2 text file round-tripped (reference:
    * io/compress/BZip2Codec.java — the one SPLITTABLE codec; gzip reads are
    * single-task per file). The oracle compare proves decompression lost
    * nothing; CompressionSpec proves multiple tasks can decode disjoint
    * ranges of one .bz2 file (the splittability that matters at 100 TB).
    */
  def bzip2Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("bzip2_roundtrip", dir)
    Tables.documents(spark, dir)
      .select(concat_ws("\t", col("doc_id"), col("source")).as("value"))
      .coalesce(1)
      .write.mode("overwrite").option("compression", "bzip2").text(path)
    TextIO.readKv(spark, path, "\t")
      .select(col("k").cast("long").as("doc_id"), col("v").as("source"))
  }

  private val bzip2RoundtripSql =
    "SELECT doc_id, source FROM documents"

  // ---- MapFile on-disk format round trip ----------------------------------
  private val MapFileKeys = Seq(7L, 42L, 101L)

  /** Real MapFile directories (reference: io/MapFile.java data+index pair,
    * mapred/MapFileOutputFormat.java one per partition): write customer
    * through [[MapFileIO.write]], self-check the distributed data-file scan
    * returns every row, then answer the query via index-seek point lookups
    * ([[MapFileIO.get]]) — the getEntry() surface.
    */
  def mapfileFormatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Scratch.dir("mapfile_format_roundtrip", dir)
    val src = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    MapFileIO.write(src, path)
    val (back, total) = (MapFileIO.read(spark, path).count(), src.count())
    require(back == total, s"MapFile scan returned $back of $total rows")
    MapFileIO.get(spark, path, MapFileKeys).toDF("c_custkey", "c_name")
  }

  private val mapfileFormatRoundtripSql =
    s"""SELECT c_custkey, c_name FROM customer
       |WHERE c_custkey IN (${MapFileKeys.mkString(", ")})""".stripMargin

  // ---- TFile on-disk format round trip ------------------------------------
  /** Real sorted gzip TFiles (reference: io/file/tfile/TFile.java): write
    * customer through [[TFileIO.write]], self-check the distributed scan
    * returns every row, then answer via block-index seeks
    * ([[TFileIO.get]] / createScannerByKey).
    */
  def tfileRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Scratch.dir("tfile_roundtrip", dir)
    val src = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    TFileIO.write(src, path)
    val (back, total) = (TFileIO.read(spark, path).count(), src.count())
    require(back == total, s"TFile scan returned $back of $total rows")
    TFileIO.get(spark, path, MapFileKeys).toDF("c_custkey", "c_name")
  }

  private val tfileRoundtripSql =
    s"""SELECT c_custkey, c_name FROM customer
       |WHERE c_custkey IN (${MapFileKeys.mkString(", ")})""".stripMargin

  // ---- many-small-files scan (multifilewc / CombineFileInputFormat) -------
  /** Wordcount over a directory of MANY small text files: the write fans
    * out to 40 part files, the read-back scan packs them into few
    * partitions (`spark.sql.files.openCostInBytes` accounting — the
    * CombineFileInputFormat behavior, built in). Green proves the packed
    * scan loses no records (reference: examples/MultiFileWordCount.java).
    */
  def multifileWordcount(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("multifile_wordcount", dir)
    Tables.documents(spark, dir).select(col("text"))
      .repartition(40)
      .write.mode("overwrite").text(path)
    graft.operators.TextMappers.wordCount(spark.read.text(path), "value")
  }

  private val multifileWordcountSql =
    s"""SELECT word, count(*) AS cnt
       |FROM (SELECT unnest(${graft.functions.TextFns.tokensSql("text")}) AS word
       |      FROM documents)
       |GROUP BY word""".stripMargin

  // ---- CSV sink round trip (TextOutputFormat csv flavor) ------------------
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("csv_roundtrip", dir)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .write.mode("overwrite").option("header", "true").csv(path)
    spark.read.option("header", "true").csv(path)
      .select(col("o_orderstatus"), col("cnt").cast("long"),
        col("total").cast("double"))
  }

  private val csvRoundtripSql =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // ---- parquet schema evolution (mergeSchema read) ------------------------
  /** Schema-evolution read: two parquet drops written under DIFFERENT
    * schemas (the second adds `lang`) load as ONE frame via
    * `mergeSchema=true`, with the pre-evolution rows surfacing the new
    * column as null — the "old shards keep working after the pipeline
    * adds a field" contract every long-lived corpus needs. The merged
    * scan stays distributed (schema reconciliation is footer-only, not a
    * data pass); the oracle recomputes the same aggregate from the source
    * table with the evolution boundary expressed as a CASE.
    */
  def schemaMergeRead(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("schema_merge", dir)
    val docs = Tables.documents(spark, dir)
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$path/v1")
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .write.mode("overwrite").parquet(s"$path/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
      .groupBy(coalesce(col("lang"), lit("<pre-evolution>")).as("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  private val schemaMergeReadSql =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN '<pre-evolution>' ELSE lang END
      |    AS lang,
      |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY 1""".stripMargin

  // ---- malformed-record CSV ingestion (PERMISSIVE + corrupt column) -------
  /** Dirty-ingest handling: a CSV drop where every 10th doc's line is
    * malformed (non-numeric field + extra column) read in PERMISSIVE mode
    * with a `_corrupt_record` column — the SkipBadRecords counterpart for
    * the INGESTION edge (reference: mapred/SkipBadRecords.java handles
    * crashes mid-map; this handles rows that never parse). Quarantined
    * rows are counted, clean rows aggregate — nothing is silently
    * dropped. The corruption rule is deterministic (doc_id % 10), so the
    * oracle recomputes both populations from the source table without
    * touching the file.
    */
  def csvMalformed(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("csv_malformed", dir)
    Tables.documents(spark, dir)
      .select(when(col("doc_id") % 10 === 0,
          concat_ws(",", col("doc_id"), lit("not_a_number,extra")))
        .otherwise(concat_ws(",", col("doc_id"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(path)
    spark.read
      .schema("doc_id LONG, n_chars LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_chars"))).as("chars_good"))
  }

  private val csvMalformedSql =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_corrupt,
      |  CAST(sum(CASE WHEN doc_id % 10 <> 0 THEN n_chars END) AS BIGINT)
      |    AS chars_good
      |FROM documents""".stripMargin

  // ---- MultipleOutputFormat physical routed write -------------------------
  /** lineitem routed by return flag via partitionBy; the read-back frame
    * aggregates per route directory — green proves the on-disk routing.
    */
  def multipleOutputsWrite(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("multiple_outputs_write", dir)
    val routed = MultiSink.writeRouted(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"),
        col("l_returnflag")),
      "l_returnflag", path)
    routed.groupBy(col("l_returnflag").as("route"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))
  }

  private val multipleOutputsWriteSql =
    """SELECT l_returnflag AS route, count(*) AS cnt,
      |  round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---- compressed text round trip (io/compress codecs) --------------------
  /** Gzip-compressed line sink + transparent decompressing scan — the
    * reference's codec factory surface (reference:
    * io/compress/CompressionCodecFactory.java, GzipCodec; TextOutputFormat
    * optional codec). Note gzip files are NOT splittable — one task per
    * file on read, so writers control read parallelism by file count
    * (same operational rule as the reference).
    */
  def compressedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("compressed_roundtrip", dir)
    Tables.documents(spark, dir)
      .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(path)
    TextIO.readKv(spark, path, "\t")
      .select(col("k").cast("long").as("doc_id"), col("v").as("lang"))
  }

  private val compressedRoundtripSql =
    "SELECT doc_id, lang FROM documents"

  // ---- bucketed co-located join (CompositeInputFormat co-partitioning) ----
  /** Both sides written bucketed+sorted on the join key, then joined: the
    * sort-merge join consumes bucket files directly — NO shuffle exchange
    * on either side (asserted in PlanSpec). This is the reference's
    * map-side join precondition (reference:
    * mapred/join/CompositeInputFormat.java:115-118 — co-partitioned,
    * same-sorted inputs) as Spark bucketed tables, and the pattern that
    * amortizes one shuffle across every future join at 100 TB.
    *
    * The bucketed tables are REUSED when this session already wrote them
    * (the amortization is the point of bucketing: write once, join many) —
    * so in the bench's best-of-N, the first attempt pays the layout write
    * and the min measures the shuffle-free join itself. Tables written by
    * an earlier JVM are rebuilt: the in-memory catalog forgot them, and
    * saveAsTable over the stale warehouse dir would fail
    * LOCATION_ALREADY_EXISTS, so both catalog entry and location drop first.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val (to, tl) = (s"g_orders_$key", s"g_lineitem_$key")
    if (!spark.catalog.tableExists(to) || !spark.catalog.tableExists(tl)) {
      // surfacing the layout write in the bench's shared_builds: the
      // first attempt's extra cost is the amortized bucketing pass, not
      // run-to-run variance
      graft.core.Shared.noteBuild("bucketed_tables_write")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      Seq(to, tl).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(s"$wh/${t.toLowerCase}")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(to)
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(tl)
    }
    bucketedJoinPlan(spark, to, tl)
  }

  /** The join itself, reusable for plan assertions. */
  def bucketedJoinPlan(spark: SparkSession, ordersTable: String,
                       lineitemTable: String): DataFrame =
    spark.table(ordersTable)
      .join(spark.table(lineitemTable),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))

  private val bucketedJoinSql =
    """SELECT o_orderstatus, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  // ---- MultipleOutputs named side outputs ---------------------------------
  /** Two named, independently-filtered side outputs from one cached pass
    * (reference: mapred/lib/MultipleOutputs.java:283 addNamedOutput), read
    * back per name and summarized — green proves both physical outputs.
    */
  def multipleOutputsNamed(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("multiple_outputs_named", dir)
    val src = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val outs = MultiSink.writeNamed(src, Map(
      "open" -> (col("o_orderstatus") === "O"),
      "final" -> (col("o_orderstatus") === "F")), path)
    outs.toSeq.sortBy(_._1).map { case (name, p) =>
      spark.read.parquet(p)
        .agg(lit(name).as("output"), count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }.reduce(_ unionByName _)
  }

  private val multipleOutputsNamedSql =
    """SELECT 'final' AS output, count(*) AS cnt,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |UNION ALL
      |SELECT 'open', count(*), round(sum(o_totalprice), 2)
      |FROM orders WHERE o_orderstatus = 'O'""".stripMargin

  // ---- JDBC round trip (DBInputFormat/DBOutputFormat via Derby) -----------
  /** The reference's dbcount made real: aggregate pageviews, write them to
    * a JDBC table, read them back PARTITIONED (bounded-range queries), and
    * apply DBCountPageView's self-check invariant
    * (reference: examples/DBCountPageView.java:239-245 —
    * Σ pageview == total events) before returning.
    */
  def jdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val db = Scratch.dir("jdbc_roundtrip", dir) + "/db"
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("pageview"))
    JdbcIO.write(counts, db, "pageview")
    val upper = 1L.max(counts.agg(max(col("pageview"))).head().getLong(0) + 1)
    val back = JdbcIO.readPartitioned(spark, db, "pageview",
      "pageview", 0L, upper, 4)
    val total = Tables.events(spark, dir).count()
    val sumBack = back.agg(sum(col("pageview"))).head().getLong(0)
    require(sumBack == total,
      s"DBCountPageView self-check failed: sum(pageview)=$sumBack != total=$total")
    back.select(col("event_type"), col("pageview"))
  }

  private val jdbcRoundtripSql =
    "SELECT event_type, count(*) AS pageview FROM events GROUP BY event_type"

  // ---- ORC columnar round trip --------------------------------------------
  /** ORC write + filtered read-back. ORC is the second columnar format the
    * stack ships (the reference era's RCFile/columnar successor — cf.
    * reference src/core/org/apache/hadoop/io/SequenceFile.java as the
    * pre-columnar on-disk table format); the read side proves the same
    * scan-level goodness parquet gets: the return-flag equality reaches the
    * ORC reader as a pushed filter + min/max stripe statistics, so at
    * 100 TB the scan skips whole stripes, not rows. zlib block compression
    * exercises the codec path on write.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("orc_roundtrip", dir)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").option("compression", "zlib").orc(path)
    spark.read.orc(path)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))
  }

  private val orcRoundtripSql =
    """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
      |FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag""".stripMargin

  // ---- Avro container-file round trip --------------------------------------
  /** Avro object-container roundtrip through the stock `avro-mapred`
    * formats ([[graft.sources.AvroIO]]) — documents land as schema'd Avro
    * records and come back through the self-describing header, then
    * aggregate per source. The oracle answers from the raw table: the
    * format boundary must be lossless for every field type it carries.
    */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("avro_roundtrip", dir)
    graft.sources.AvroIO.write(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars")), path)
    graft.sources.AvroIO.read(spark, path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        sum(col("id")).as("id_sum"))
  }

  private val avroRoundtripSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents GROUP BY source""".stripMargin

  // ---- schema'd JSON-lines round trip --------------------------------------
  /** JSON-lines sink + schema'd re-read: the semi-structured props string is
    * promoted to a typed struct BEFORE the write (from_json, codegen'd), and
    * the read back supplies an explicit schema so Spark skips the
    * whole-dataset inference pass — the difference between one scan and two
    * at 100 TB. Nested-field access on the re-read (`props.k`) prunes to
    * the single leaf in ReadSchema.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("json_roundtrip", dir)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), lit("k LONG")).as("props"))
      .write.mode("overwrite").json(path)
    spark.read.schema("event_id LONG, event_type STRING, props STRUCT<k: LONG>")
      .json(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("props.k")).as("k_sum"))
  }

  private val jsonRoundtripSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum
      |FROM events GROUP BY event_type""".stripMargin

  // ---- small-file compaction ----------------------------------------------
  /** The small-file problem, solved the Spark way: a directory of 40 tiny
    * parquet files (the reference's HAR archives exist for exactly this
    * pathology — reference src/tools/org/apache/hadoop/tools/HadoopArchives.java)
    * is rewritten into size-targeted files — target count =
    * ceil(input_bytes / 8 MiB), floor 1 — via coalesce (a partition-merge
    * NARROW dependency: no shuffle; each output task reads several input
    * files sequentially). The byte size comes from a driver-side FS
    * LISTING — metadata-only, never data. Read-back aggregate proves the
    * rewrite lost nothing; IoSpec pins the on-disk file counts.
    */
  def compactFiles(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("compact_files", dir)
    Tables.documents(spark, dir)
      .repartition(40)
      .write.mode("overwrite").parquet(s"$path/small")
    val small = spark.read.parquet(s"$path/small")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$path/small")).getLength
    val target = math.max(1L, (bytes + (8L << 20) - 1) / (8L << 20)).toInt
    small.coalesce(target).write.mode("overwrite").parquet(s"$path/compact")
    spark.read.parquet(s"$path/compact")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
  }

  private val compactFilesSql =
    """SELECT source, count(*) AS docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY source""".stripMargin

  /** Point-lookup part keys for [[parquetBloomFilter]] — low enough to
    * exist at every scale factor (sf0.001 has 200 parts). */
  private val BloomProbeKeys = Seq(7L, 77L, 177L)

  /** Parquet bloom-filter write/read path: the fact slice is written with
    * a COLUMN-LEVEL BLOOM FILTER on the point-lookup key
    * (`parquet.bloom.filter.enabled#l_partkey`) plus small row groups, so
    * a selective equality probe skips row groups whose filter proves the
    * key absent — the storage-side rejection that min/max statistics
    * cannot give a HIGH-CARDINALITY UNSORTED key (every row group's
    * partkey range spans the domain; only the bloom filter discriminates).
    * At 100 TB this is the difference between a point lookup touching
    * ~one row group per file and scanning all of them. The readout
    * re-aggregates the probed keys so the oracle attests the roundtrip
    * end-to-end.
    */
  def parquetBloomFilter(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("parquet_bloom", dir)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#l_partkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_partkey", "1000000")
      .option("parquet.block.size", (1 << 20).toString)
      .parquet(s"$path/bloomed")
    spark.read.parquet(s"$path/bloomed")
      .where(col("l_partkey").isin(BloomProbeKeys: _*))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  private val parquetBloomFilterSql =
    s"""SELECT l_partkey, count(*) AS n_rows,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |FROM lineitem
       |WHERE l_partkey IN (${BloomProbeKeys.mkString(", ")})
       |GROUP BY l_partkey""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("text_roundtrip", textRoundtrip, Some(textRoundtripSql)),
    QueryDef("orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    QueryDef("avro_roundtrip", avroRoundtrip, Some(avroRoundtripSql)),
    QueryDef("compact_files", compactFiles, Some(compactFilesSql)),
    QueryDef("json_roundtrip", jsonRoundtrip, Some(jsonRoundtripSql)),
    QueryDef("kv_text_separator", kvTextSeparator, Some(kvTextSeparatorSql)),
    QueryDef("seqfile_roundtrip", seqfileRoundtrip, Some(seqfileRoundtripSql)),
    QueryDef("seqfile_sort", seqfileSort, Some(seqfileSortSql)),
    QueryDef("generic_writable_union", genericWritableUnion, Some(genericWritableUnionSql)),
    QueryDef("setfile_roundtrip", setfileRoundtrip, Some(setfileRoundtripSql)),
    QueryDef("arrayfile_lookup", arrayfileLookup, Some(arrayfileLookupSql)),
    QueryDef("har_roundtrip", harRoundtrip, Some(harRoundtripSql)),
    QueryDef("upsert_partitioned", upsertPartitioned, Some(upsertPartitionedSql)),
    QueryDef("delta_agg", deltaAgg, Some(deltaAggSql)),
    QueryDef("zorder_cluster", zorderCluster, Some(zorderClusterSql)),
    QueryDef("hilbert_cluster", hilbertCluster, Some(hilbertClusterSql)),
    QueryDef("partition_prune", partitionPrune, Some(partitionPruneSql)),
    QueryDef("seqfile_binary_roundtrip", seqfileBinaryRoundtrip, Some(seqfileBinaryRoundtripSql)),
    QueryDef("seqfile_block_compressed", seqfileBlockCompressed, Some(seqfileBlockCompressedSql)),
    QueryDef("seqfile_default_codec", seqfileDefaultCodec, Some(seqfileDefaultCodecSql)),
    QueryDef("bzip2_roundtrip", bzip2Roundtrip, Some(bzip2RoundtripSql)),
    QueryDef("mapfile_format_roundtrip", mapfileFormatRoundtrip, Some(mapfileFormatRoundtripSql)),
    QueryDef("tfile_roundtrip", tfileRoundtrip, Some(tfileRoundtripSql)),
    QueryDef("multifile_wordcount", multifileWordcount, Some(multifileWordcountSql)),
    QueryDef("csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)),
    QueryDef("schema_merge_read", schemaMergeRead, Some(schemaMergeReadSql)),
    QueryDef("csv_malformed", csvMalformed, Some(csvMalformedSql)),
    QueryDef("compressed_roundtrip", compressedRoundtrip, Some(compressedRoundtripSql)),
    QueryDef("bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    QueryDef("multiple_outputs_write", multipleOutputsWrite, Some(multipleOutputsWriteSql)),
    QueryDef("multiple_outputs_named", multipleOutputsNamed, Some(multipleOutputsNamedSql)),
    QueryDef("jdbc_roundtrip", jdbcRoundtrip, Some(jdbcRoundtripSql)),
    QueryDef("parquet_bloom_filter", parquetBloomFilter,
      Some(parquetBloomFilterSql)),
  )
}
