package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Scratch, Tables}
import graft.functions.{PortableHash, TextFns}
import graft.operators.{CompositeJoin, Generators, KeyFieldSort, SkipBad,
  TotalOrderSort}
import graft.sources.SequenceFileIO

/** The remaining reference operator families: key-field sort/partition,
  * seeded generators + TeraValidate, Pipes, Counters, the imperative
  * mapper surfaces (flatMap / MapRunnable / SkipBadRecords), scan-time
  * SequenceFile filters, the broadcast-lookup idiom, and the duplicate-key
  * outer-join cross-product.
  */
object MiscOps extends QueryModule {

  // ---- KeyFieldBasedComparator: -k sort over text fields ------------------
  /** Full reference grammar incl. END positions
    * (mapred/lib/KeyFieldHelper.java:31-40): chars 2..6 of the price field,
    * numeric desc, then the whole orderkey field numeric asc (unique →
    * deterministic ranks).
    */
  private val SortSpec = "-k3.2,3.6nr -k2,2n"

  def keyfieldSort(spark: SparkSession, dir: String): DataFrame = {
    val line = concat_ws(":", col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val fields = Tables.orders(spark, dir)
      .select(split(line, ":").as("w"))
    val ranked = TotalOrderSort.rank(fields,
      KeyFieldSort.sortColumnsK(col("w"), ":", SortSpec))
    ranked.select(
      element_at(col("w"), 1).cast("long").as("custkey"),
      element_at(col("w"), 2).cast("long").as("orderkey"),
      element_at(col("w"), 3).cast("double").as("price"),
      col("rn"))
  }

  private val keyfieldSortSql =
    """WITH f AS (
      |  SELECT string_split(concat_ws(':', o_custkey, o_orderkey, o_totalprice), ':') AS w
      |  FROM orders
      |)
      |SELECT w[1]::BIGINT AS custkey, w[2]::BIGINT AS orderkey,
      |  w[3]::DOUBLE AS price,
      |  row_number() OVER (ORDER BY substr(w[3], 2, 5)::DOUBLE DESC, w[2]::DOUBLE) AS rn
      |FROM f""".stripMargin

  // ---- KeyFieldBasedPartitioner: hash over selected fields ----------------
  private val NumParts = 8

  def keyfieldPartition(spark: SparkSession, dir: String): DataFrame = {
    val line = concat_ws(":", col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    Tables.orders(spark, dir)
      .select(split(line, ":").as("w"))
      .select(KeyFieldSort.partitionId(col("w"), Seq(1), NumParts).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("cnt"))
  }

  private val keyfieldPartitionSql = {
    val h = PortableHash.h48Sql("w[1]")
    s"""WITH f AS (
       |  SELECT string_split(concat_ws(':', o_custkey, o_orderkey, o_totalprice), ':') AS w
       |  FROM orders
       |)
       |SELECT $h % $NumParts AS pid, count(*) AS cnt FROM f GROUP BY 1""".stripMargin
  }

  // ---- TeraGen ------------------------------------------------------------
  private val GenRows = 10000L

  def teragenCheck(spark: SparkSession, dir: String): DataFrame =
    Generators.teraGen(spark, GenRows).agg(
      count(lit(1)).as("n_rows"),
      min(col("key")).as("min_key"), max(col("key")).as("max_key"),
      sum(PortableHash.h48(col("key"))).as("key_checksum"),
      min(length(col("value"))).as("min_val_len"))

  private val teragenCheckSql = {
    val h = PortableHash.h48Sql("key")
    s"""WITH g AS (
       |  SELECT substr(md5('tg:' || i), 1, 10) AS key,
       |    substr(md5('tv0:' || i) || md5('tv1:' || i) || md5('tv2:' || i), 1, 78) AS value
       |  FROM generate_series(0, ${GenRows - 1}) t(i)
       |)
       |SELECT count(*) AS n_rows, min(key) AS min_key, max(key) AS max_key,
       |  sum($h)::BIGINT AS key_checksum, min(len(value)) AS min_val_len
       |FROM g""".stripMargin
  }

  // ---- RandomTextWriter ---------------------------------------------------
  private val RtwRows = 2000L
  private val RtwWords = 20

  def randomTextWriter(spark: SparkSession, dir: String): DataFrame =
    Generators.randomTextWriter(spark, RtwRows, RtwWords)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private val randomTextWriterSql = {
    val vocab = Generators.Vocab.map(w => s"'$w'").mkString("[", ", ", "]")
    val h = PortableHash.h48Sql("'rtw:' || id || ':' || i")
    s"""WITH g AS (
       |  SELECT id, unnest(range($RtwWords)) AS i
       |  FROM generate_series(0, ${RtwRows - 1}) t(id)
       |)
       |SELECT list_extract($vocab, ($h % 100)::INT + 1) AS word, count(*) AS cnt
       |FROM g GROUP BY 1""".stripMargin
  }

  // ---- TeraValidate -------------------------------------------------------
  def teravalidate(spark: SparkSession, dir: String): DataFrame = {
    val ranked = TotalOrderSort.rank(
      Generators.teraGen(spark, GenRows).select(col("key")), Seq(col("key")))
    Generators.validateSorted(ranked, "key", "rn")
  }

  private val teravalidateSql = {
    val h = PortableHash.h48Sql("key")
    s"""WITH g AS (
       |  SELECT substr(md5('tg:' || i), 1, 10) AS key
       |  FROM generate_series(0, ${GenRows - 1}) t(i)
       |), ord AS (
       |  SELECT key, lag(key) OVER (ORDER BY key) AS prev FROM g
       |)
       |SELECT count(*) AS n_rows,
       |  sum(CASE WHEN prev > key THEN 1 ELSE 0 END)::BIGINT AS misorders,
       |  sum($h)::BIGINT AS key_checksum
       |FROM ord""".stripMargin
  }

  // ---- Pipes: external command over records (mapred/pipes/Submitter.java) -
  /** Lines piped through an external process (`tr a-z A-Z`), then counted —
    * `RDD.pipe` is the modern form of the reference's C++ Pipes/streaming
    * contract (record stream over stdin/stdout, one process per partition).
    */
  def pipeWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val upper = Tables.documents(spark, dir)
      .select(col("text")).rdd.map(_.getString(0))
      .pipe("tr a-z A-Z")
    upper.toDF("text")
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  private val pipeWordcountSql =
    s"""SELECT upper(word) AS word, count(*) AS cnt
       |FROM (SELECT unnest(${TextFns.tokensSql("text")}) AS word FROM documents)
       |GROUP BY 1""".stripMargin

  // ---- Counters (mapred/Counters.java:411-422; Task.java:66-79) -----------
  /** User metrics via `df.observe` (driver-visible after one action — the
    * modern Counters) plus a `longAccumulator` incremented in executor code
    * (the direct incrCounter analog). Output = the counter table.
    */
  def countersObserve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val obs = Observation("counters")
    val acc = spark.sparkContext.longAccumulator("PURCHASE_EVENTS")
    val observed = Tables.events(spark, dir)
      .observe(obs,
        count(lit(1)).as("map_input_records"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_events"))
    observed.foreach { r =>
      if (r.getAs[String]("event_type") == "purchase") acc.add(1L)
    }
    val m = obs.get
    import spark.implicits._
    Seq(
      ("MAP_INPUT_RECORDS", m("map_input_records").asInstanceOf[Long]),
      ("ERROR_EVENTS", m("error_events").asInstanceOf[Long]),
      ("PURCHASE_EVENTS", acc.value: Long),
    ).toDF("counter", "value")
  }

  private val countersObserveSql =
    """SELECT 'MAP_INPUT_RECORDS' AS counter, count(*) AS value FROM events
      |UNION ALL
      |SELECT 'ERROR_EVENTS', count(*) FROM events WHERE event_type = 'error'
      |UNION ALL
      |SELECT 'PURCHASE_EVENTS', count(*) FROM events WHERE event_type = 'purchase'""".stripMargin

  // ---- Mapper.map 1→N: typed flatMap (mapred/Mapper.java:157) -------------
  /** Word bigrams via Dataset.flatMap — imperative 1→N logic that SQL
    * expressions can't host (the reference's universal mapper surface).
    */
  def mapperFlatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("text")).as[String]
      .flatMap(t => t.split("\\s+").filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .toDF("bigram")
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
  }

  private val mapperFlatmapSql =
    s"""WITH t AS (SELECT ${TextFns.tokensSql("text")} AS w FROM documents),
       |b AS (
       |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
       |  FROM t
       |)
       |SELECT bigram, count(*) AS cnt FROM b GROUP BY 1""".stripMargin

  // ---- MapRunnable: whole-partition imperative pass (mapred/MapRunner.java)
  /** Per-partition iteration with imperative per-row work (vowel counting)
    * — per-partition setup happens once (the MapRunnable contract).
    */
  def mapRunner(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val vowels = "aeiou".toSet // per-partition init
        rows.map { case (id, text) =>
          var n = 0L
          var i = 0
          while (i < text.length) { if (vowels(text.charAt(i))) n += 1; i += 1 }
          (id, n)
        }
      }
      .toDF("doc_id", "n_vowels")
  }

  private val mapRunnerSql =
    """SELECT doc_id, len(regexp_extract_all(text, '[aeiou]'))::BIGINT AS n_vowels
      |FROM documents""".stripMargin

  // ---- SkipBadRecords (mapred/SkipBadRecords.java:51) ---------------------
  /** Records whose parse throws (here: a planted poison predicate) are
    * skipped and counted; survivors aggregate normally.
    */
  def skipBadRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("SKIPPED_RECORDS")
    val kRe = "\"k\": (\\d+)".r
    val parsed = SkipBad.flatMapSkipBad(
      Tables.events(spark, dir).select(col("event_type"), col("props"))
        .as[(String, String)], acc) { case (et, props) =>
      val k = kRe.findFirstMatchIn(props).get.group(1).toLong // throws if absent
      if (k % 13 == 0) throw new RuntimeException("poison record")
      Iterator.single((et, k))
    }
    parsed.toDF("event_type", "k")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_ok"), sum(col("k")).as("sum_k"))
  }

  private val skipBadRecordsSql =
    """WITH p AS (
      |  SELECT event_type, regexp_extract(props, '"k": (\d+)', 1)::BIGINT AS k
      |  FROM events
      |)
      |SELECT event_type, count(*) AS n_ok, sum(k)::BIGINT AS sum_k
      |FROM p WHERE k % 13 <> 0 GROUP BY event_type""".stripMargin

  // ---- SequenceFileInputFilter (regex / percent / md5) --------------------
  /** Scan-time record filters over a SequenceFile
    * (reference: mapred/SequenceFileInputFilter.java:103,146,195): one scan,
    * all three filter counts.
    */
  def seqfileInputFilter(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("seqfile_input_filter", dir)
    SequenceFileIO.write(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), path)
    val k = col("key").cast("string")
    SequenceFileIO.read(spark, path).agg(
      sum(when(k.rlike("[02468]$"), 1L).otherwise(0L)).as("n_regex"),
      sum(when(PortableHash.h48(k) % 10 === 0, 1L).otherwise(0L)).as("n_percent"),
      sum(when(PortableHash.h48(k, 7) % 10 === 0, 1L).otherwise(0L)).as("n_md5"))
  }

  private val seqfileInputFilterSql = {
    val h = PortableHash.h48Sql("doc_id::VARCHAR")
    val hSeeded = PortableHash.h48Sql("doc_id::VARCHAR", 7)
    s"""SELECT
       |  sum(CASE WHEN regexp_matches(doc_id::VARCHAR, '[02468]$$') THEN 1 ELSE 0 END)::BIGINT AS n_regex,
       |  sum(CASE WHEN $h % 10 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_percent,
       |  sum(CASE WHEN $hSeeded % 10 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_md5
       |FROM documents""".stripMargin
  }

  // ---- broadcast lookup (DistributedCache + MapFile.getEntry idiom) -------
  /** Explicit `broadcast()` of the small side — the reference ships a
    * MapFile via DistributedCache and probes it per record
    * (filecache/DistributedCache.java:77, MapFileOutputFormat.java:82-107);
    * here the dimension broadcasts once per executor and the probe is a
    * hash-join lookup. At 100 TB the fact side never shuffles for this join.
    */
  def broadcastLookup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
  }

  private val broadcastLookupSql =
    """SELECT p_brand, count(*) AS cnt,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // ---- outer join with duplicate keys on two sides ------------------------
  /** The TupleWritable duplicate-key cross-product
    * (reference: mapred/join/OuterJoinRecordReader.java:41-44): both order
    * slices carry duplicate custkeys, so each key emits the positional
    * cross-product of its per-source rows — the semantic the pre-aggregated
    * join_outer query deliberately avoids.
    */
  def joinOuterDup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    def slice(status: String, out: String) =
      ord.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as(out))
    CompositeJoin.outer(
      Seq(cust, slice("F", "f_orderkey"), slice("O", "o_orderkey2")), "custkey")
  }

  private val joinOuterDupSql =
    """WITH f AS (SELECT o_custkey AS k, o_orderkey AS f_orderkey
      |           FROM orders WHERE o_orderstatus = 'F'),
      |o AS (SELECT o_custkey AS k, o_orderkey AS o_orderkey2
      |      FROM orders WHERE o_orderstatus = 'O')
      |SELECT COALESCE(c.c_custkey, f.k, o.k) AS custkey, c.c_name,
      |       f.f_orderkey, o.o_orderkey2
      |FROM customer c
      |FULL JOIN f ON c.c_custkey = f.k
      |FULL JOIN o ON COALESCE(c.c_custkey, f.k) = o.k""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("keyfield_sort", keyfieldSort, Some(keyfieldSortSql)),
    QueryDef("keyfield_partition", keyfieldPartition, Some(keyfieldPartitionSql)),
    QueryDef("teragen_check", teragenCheck, Some(teragenCheckSql)),
    QueryDef("random_text_writer", randomTextWriter, Some(randomTextWriterSql)),
    QueryDef("teravalidate", teravalidate, Some(teravalidateSql)),
    QueryDef("pipe_wordcount", pipeWordcount, Some(pipeWordcountSql)),
    QueryDef("counters_observe", countersObserve, Some(countersObserveSql)),
    QueryDef("mapper_flatmap", mapperFlatmap, Some(mapperFlatmapSql)),
    QueryDef("map_runner", mapRunner, Some(mapRunnerSql)),
    QueryDef("skip_bad_records", skipBadRecords, Some(skipBadRecordsSql)),
    QueryDef("seqfile_input_filter", seqfileInputFilter, Some(seqfileInputFilterSql)),
    QueryDef("broadcast_lookup", broadcastLookup, Some(broadcastLookupSql)),
    QueryDef("join_outer_dup", joinOuterDup, Some(joinOuterDupSql)),
  )
}
