package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns
import graft.operators.ValueAggregators

/** The reference's aggregate framework as a query surface
  * (reference: mapred/lib/aggregate/ValueAggregatorJob.java;
  * examples/AggregateWordCount.java:43-59,
  * examples/AggregateWordHistogram.java:41-61).
  *
  * Framework model: descriptors turn each input row into tagged entries
  * (aggregatorType, id, value); the engine groups by (type, id) and applies
  * the aggregator named by the tag. Here the descriptor output is a
  * DataFrame and the dispatch is declarative — every aggregator computes as
  * a parallel agg column and a CASE projects the one the tag names, which
  * keeps the whole framework inside one hash-aggregate (map-side partial
  * agg = the reference's ValueAggregatorCombiner, for free).
  */
object AggregateFramework extends QueryModule {

  /** Dispatch for tagged aggregator entries (the framework's dynamic
    * piece): every type named in `types` is resolved through
    * [[ValueAggregators.registered]] — builtins AND user-registered
    * plugins — computed as parallel agg columns, and the tag picks one.
    * Still ONE hash-aggregate with map-side partial agg regardless of how
    * many types run.
    */
  def runAggregators(entries: DataFrame, types: Seq[String]): DataFrame = {
    val table = ValueAggregators.registered
    val unknown = types.filterNot(table.contains)
    require(unknown.isEmpty,
      s"unregistered aggregator type(s) ${unknown.mkString(", ")} — " +
        "register with ValueAggregators.define")
    val aggCols = types.zipWithIndex.map { case (t, i) =>
      table(t)(col("value")).as(s"v_$i")
    }
    val out = entries.groupBy(col("agg_type"), col("id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val dispatch = types.zipWithIndex.tail.foldLeft(
      when(col("agg_type") === types.head, col("v_0"))) {
      case (acc, (t, i)) => acc.when(col("agg_type") === t, col(s"v_$i"))
    }
    out.select(col("agg_type"), col("id"), dispatch.as("agg_value"))
  }

  /** Long-type convenience wrapper (the original three-type dispatch). */
  def runLongAggregators(entries: DataFrame): DataFrame =
    runAggregators(entries,
      Seq("LongValueSum", "LongValueMax", "LongValueMin"))

  // ---- aggregatewordcount -------------------------------------------------
  /** Two descriptors over documents: word → LongValueSum(1) (the reference's
    * AggregateWordCount) plus doc length → LongValueMax/Min (exercising the
    * dispatch on multiple types in one job, as UserDefinedValueAggregator
    * descriptors do).
    */
  def aggregateWordcount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs.select(lit("LongValueSum").as("agg_type"),
      explode(TextFns.tokens(col("text"))).as("id"), lit(1L).as("value"))
    val maxLen = docs.select(lit("LongValueMax").as("agg_type"),
      lit("doc_chars").as("id"), col("n_chars").cast("long").as("value"))
    val minLen = docs.select(lit("LongValueMin").as("agg_type"),
      lit("doc_chars").as("id"), col("n_chars").cast("long").as("value"))
    runLongAggregators(words.unionByName(maxLen).unionByName(minLen))
  }

  private val aggregateWordcountSql =
    s"""WITH w AS (
       |  SELECT unnest(${TextFns.tokensSql("text")}) AS word FROM documents
       |)
       |SELECT 'LongValueSum' AS agg_type, word AS id, count(*) AS agg_value
       |FROM w GROUP BY word
       |UNION ALL
       |SELECT 'LongValueMax', 'doc_chars', max(n_chars) FROM documents
       |UNION ALL
       |SELECT 'LongValueMin', 'doc_chars', min(n_chars) FROM documents""".stripMargin

  // ---- aggregatewordhist --------------------------------------------------
  /** Global histogram of word frequencies — the reference's
    * AggregateWordHistogram (single key "WORD_HISTOGRAM", report of the
    * frequency distribution) via the custom [[ValueAggregators.ValueHistogram]].
    */
  def aggregateWordhist(spark: SparkSession, dir: String): DataFrame = {
    val hist = udaf(ValueAggregators.ValueHistogram(3), Encoders.STRING)
    Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(lit("WORD_HISTOGRAM").as("key"))
      .agg(hist(col("word")).as("h"))
      .select(col("key"), col("h.n_distinct"), col("h.min_freq"),
        col("h.median_freq"), col("h.max_freq"), col("h.avg_freq"),
        col("h.stddev_freq"), col("h.top_items"))
  }

  private val aggregateWordhistSql =
    s"""WITH w AS (
       |  SELECT unnest(${TextFns.tokensSql("text")}) AS word FROM documents
       |), f AS (
       |  SELECT word, count(*) AS c FROM w GROUP BY word
       |), stats AS (
       |  SELECT count(*) AS n, min(c) AS mn, median(c) AS med, max(c) AS mx,
       |         sum(c) AS s, sum(c * c) AS sq,
       |         array_to_string(list(word || ':' || c ORDER BY c DESC, word)[1:3], '|') AS top
       |  FROM f
       |)
       |SELECT 'WORD_HISTOGRAM' AS key, n AS n_distinct, mn AS min_freq,
       |  med AS median_freq, mx AS max_freq,
       |  round(s::DOUBLE / n, 6) AS avg_freq,
       |  round(sqrt((n * sq - s * s)::DOUBLE / (n::DOUBLE * n)), 6) AS stddev_freq,
       |  top AS top_items
       |FROM stats""".stripMargin

  // ---- aggregate_plugin ---------------------------------------------------
  /** The plugin path end-to-end: register a user aggregator type
    * ("LongValueRange" = max − min, a type the reference's fixed table
    * doesn't know) and run it NEXT TO a builtin in one job — per
    * event_type the range of value-cents, plus the framework's
    * "record_count" LongValueSum convention (reference:
    * ValueAggregatorBaseDescriptor.java:116-131 emits a record_count
    * LongValueSum entry for every input record).
    */
  def aggregatePlugin(spark: SparkSession, dir: String): DataFrame = {
    ValueAggregators.define("LongValueRange",
      c => max(c.cast("long")) - min(c.cast("long")))
    val ev = Tables.events(spark, dir)
    val ranges = ev.select(lit("LongValueRange").as("agg_type"),
      concat(lit("value_cents_"), col("event_type")).as("id"),
      round(col("value") * 100).cast("long").as("value"))
    val records = ev.select(lit("LongValueSum").as("agg_type"),
      lit("record_count").as("id"), lit(1L).as("value"))
    runAggregators(ranges.unionByName(records),
      Seq("LongValueRange", "LongValueSum"))
  }

  private val aggregatePluginSql =
    """WITH c AS (
      |  SELECT event_type, round(value * 100)::BIGINT AS cv FROM events
      |)
      |SELECT 'LongValueRange' AS agg_type, 'value_cents_' || event_type AS id,
      |  max(cv) - min(cv) AS agg_value
      |FROM c GROUP BY 2
      |UNION ALL
      |SELECT 'LongValueSum', 'record_count', count(*) FROM events""".stripMargin

  // ---- double/string aggregator types -------------------------------------
  /** The remaining builtin aggregator types over events: DoubleValueSum of
    * the metric, StringValueMax/Min of the (stringified) user id — the
    * types aggregate_wordcount's long-only dispatch doesn't reach.
    */
  def aggregateDoubleString(spark: SparkSession, dir: String): DataFrame = {
    val b = ValueAggregators.builtins
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("user_id"),
        col("user_id").cast("string").as("u"))
      .groupBy("event_type")
      .agg(round(b("DoubleValueSum")(col("value")), 2).as("double_sum"),
        b("StringValueMax")(col("u")).as("str_max"),
        b("StringValueMin")(col("u")).as("str_min"),
        b("LongValueMax")(col("user_id")).as("long_max"))
  }

  private val aggregateDoubleStringSql =
    """SELECT event_type, round(sum(value), 2) AS double_sum,
      |  max(user_id::VARCHAR) AS str_max, min(user_id::VARCHAR) AS str_min,
      |  max(user_id) AS long_max
      |FROM events GROUP BY event_type""".stripMargin

  // ---- uniq_value_count ---------------------------------------------------
  private val UniqCap = 10

  /** Per event_type: capped exact distinct users
    * (reference: lib/aggregate/UniqValueCount.java:28-50 — count and set,
    * exact until maxNumItems).
    */
  def uniqValueCount(spark: SparkSession, dir: String): DataFrame = {
    val uniq = udaf(ValueAggregators.UniqValueCount(UniqCap), Encoders.STRING)
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
      .groupBy("event_type")
      .agg(uniq(col("u")).as("r"))
      .select(col("event_type"), col("r.uniq_count"), col("r.items"))
  }

  private val uniqValueCountSql =
    s"""WITH d AS (
       |  SELECT DISTINCT event_type, user_id::VARCHAR AS u FROM events
       |)
       |SELECT event_type, least(count(*), $UniqCap) AS uniq_count,
       |  array_to_string(list(u ORDER BY u)[1:$UniqCap], '|') AS items
       |FROM d GROUP BY event_type""".stripMargin

  // ---- value_histogram ----------------------------------------------------
  /** Per event_type: histogram report of per-user event counts. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val hist = udaf(ValueAggregators.ValueHistogram(3), Encoders.STRING)
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
      .groupBy("event_type")
      .agg(hist(col("u")).as("h"))
      .select(col("event_type"), col("h.n_distinct"), col("h.min_freq"),
        col("h.median_freq"), col("h.max_freq"), col("h.avg_freq"),
        col("h.stddev_freq"), col("h.top_items"))
  }

  private val valueHistogramSql =
    """WITH f AS (
      |  SELECT event_type, user_id::VARCHAR AS u, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, count(*) AS n_distinct, min(c) AS min_freq,
      |  median(c) AS median_freq, max(c) AS max_freq,
      |  round(sum(c)::DOUBLE / count(*), 6) AS avg_freq,
      |  round(sqrt((count(*) * sum(c * c) - sum(c) * sum(c))::DOUBLE
      |        / (count(*)::DOUBLE * count(*))), 6) AS stddev_freq,
      |  array_to_string(list(u || ':' || c ORDER BY c DESC, u)[1:3], '|') AS top_items
      |FROM f GROUP BY event_type""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("aggregate_wordcount", aggregateWordcount, Some(aggregateWordcountSql)),
    QueryDef("aggregate_plugin", aggregatePlugin, Some(aggregatePluginSql)),
    QueryDef("aggregate_double_string", aggregateDoubleString, Some(aggregateDoubleStringSql)),
    QueryDef("aggregate_wordhist", aggregateWordhist, Some(aggregateWordhistSql)),
    QueryDef("uniq_value_count", uniqValueCount, Some(uniqValueCountSql)),
    QueryDef("value_histogram", valueHistogram, Some(valueHistogramSql)),
  )
}
