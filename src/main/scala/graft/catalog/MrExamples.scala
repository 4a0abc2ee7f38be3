package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.operators.{CompositeJoin, FieldSelection, TextMappers, TotalOrderSort}

/** The reference's example "query catalog"
  * (reference: examples/ExampleDriver.java:38-63) re-expressed over the
  * driver corpus. Each entry exercises one operator family from SURVEY.md §2.
  */
object MrExamples extends QueryModule {

  // ---- wordcount (examples/WordCount.java) --------------------------------
  def wordcount(spark: SparkSession, dir: String): DataFrame =
    TextMappers.wordCount(Tables.documents(spark, dir), "text")

  private val wordcountSql =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
      |        w -> w <> '')) AS word FROM documents)
      |GROUP BY word""".stripMargin

  // ---- grep (examples/Grep.java: extract → count → global desc sort) -----
  private val grepPattern = "s[a-z]+"

  def grep(spark: SparkSession, dir: String): DataFrame =
    TextMappers.grep(Tables.documents(spark, dir), "text", grepPattern)

  private val grepSql =
    s"""WITH c AS (
       |  SELECT m, count(*) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(text, '$grepPattern')) AS m
       |        FROM documents)
       |  GROUP BY m)
       |SELECT cnt, m, row_number() OVER (ORDER BY cnt DESC, m) AS rank
       |FROM c""".stripMargin

  // ---- regex mapper on a different column family (mapred/lib/RegexMapper) -
  def regexMapper(spark: SparkSession, dir: String): DataFrame =
    TextMappers.regexMatchCount(Tables.events(spark, dir), "props", "[0-9]+")

  private val regexMapperSql =
    """SELECT m, count(*) AS cnt
      |FROM (SELECT unnest(regexp_extract_all(props, '[0-9]+')) AS m FROM events)
      |GROUP BY m""".stripMargin

  // ---- composite joins (mapred/join, examples/Join.java) ------------------
  private val highValueCutoff = 400000.0

  private def joinSources(spark: SparkSession, dir: String) = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
    val hv = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > highValueCutoff)
      .select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("hv_orderkey"))
    (cust, ord, hv)
  }

  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val (cust, ord, hv) = joinSources(spark, dir)
    CompositeJoin.inner(Seq(cust, ord, hv), "custkey")
  }

  private val joinInnerSql =
    s"""SELECT c.c_custkey AS custkey, c.c_name, o.o_orderkey, h.o_orderkey AS hv_orderkey
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN (SELECT o_custkey, o_orderkey FROM orders
       |      WHERE o_totalprice > $highValueCutoff) h
       |  ON c.c_custkey = h.o_custkey""".stripMargin

  /** Semi/anti joins as first-class plan shapes: the probe side streams,
    * only the key set of the filter side shuffles (or broadcasts), and no
    * payload from the filter side is ever materialized — at 100 TB the
    * difference between EXISTS-as-semi-join and an inner join + distinct
    * is the whole fact-table dedup shuffle the latter adds.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val (cust, _, hv) = joinSources(spark, dir)
    cust.join(hv, Seq("custkey"), "left_semi")
  }

  private val joinSemiSql =
    s"""SELECT c.c_custkey AS custkey, c.c_name
       |FROM customer c WHERE EXISTS (
       |  SELECT 1 FROM orders o
       |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $highValueCutoff)""".stripMargin

  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val (cust, _, hv) = joinSources(spark, dir)
    cust.join(hv, Seq("custkey"), "left_anti")
  }

  private val joinAntiSql =
    s"""SELECT c.c_custkey AS custkey, c.c_name
       |FROM customer c WHERE NOT EXISTS (
       |  SELECT 1 FROM orders o
       |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $highValueCutoff)""".stripMargin

  /** NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of silently dropping — the semantics a MapReduce
    * tag-join gives for free (a null tag is just a key byte) but SQL's
    * `=` does not. Catalyst plans EqualNullSafe as a true EQUI-join (hash
    * or sort-merge on the coalesced key), NOT a nested loop — pinned in
    * the spec — so the null bucket shuffles like any other key. The
    * nullable key here sends ~1/5th of rows to NULL, so the null-match
    * rows are a visible, value-checked slice of the result.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("nk",
        expr("NULLIF(CAST(round(value * 100) AS BIGINT) % 5, 0)"))
    val purch = e.where(col("event_type") === "purchase")
      .select(col("nk").as("lk"), col("event_id"))
    val clicks = e.where(col("event_type") === "click")
      .groupBy(col("nk").as("rk")).agg(count(lit(1)).as("clicks"))
    purch.join(clicks, col("lk") <=> col("rk"), "left")
      .groupBy(col("lk"))
      .agg(count(lit(1)).as("n_purchases"), max(col("clicks")).as("clicks"))
  }

  private val nullSafeJoinSql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    NULLIF(round(value * 100)::BIGINT % 5, 0) AS nk
      |  FROM events
      |), r AS (
      |  SELECT nk AS rk, count(*) AS clicks FROM e
      |  WHERE event_type = 'click' GROUP BY 1
      |)
      |SELECT l.nk AS lk, count(*) AS n_purchases, max(r.clicks) AS clicks
      |FROM e l LEFT JOIN r ON l.nk IS NOT DISTINCT FROM r.rk
      |WHERE l.event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val (cust, ord, hv) = joinSources(spark, dir)
    val ordCnt = ord.groupBy("custkey").agg(count(lit(1)).as("order_cnt"))
    val hvCnt  = hv.groupBy("custkey").agg(count(lit(1)).as("hv_cnt"))
    CompositeJoin.outer(Seq(cust, ordCnt, hvCnt), "custkey")
  }

  private val joinOuterSql =
    s"""WITH oc AS (SELECT o_custkey AS k, count(*) AS order_cnt FROM orders GROUP BY 1),
       |hc AS (SELECT o_custkey AS k, count(*) AS hv_cnt FROM orders
       |       WHERE o_totalprice > $highValueCutoff GROUP BY 1)
       |SELECT COALESCE(c.c_custkey, oc.k, hc.k) AS custkey, c.c_name,
       |       oc.order_cnt, hc.hv_cnt
       |FROM customer c
       |FULL JOIN oc ON c.c_custkey = oc.k
       |FULL JOIN hc ON COALESCE(c.c_custkey, oc.k) = hc.k""".stripMargin

  /** Sources = per-status slices of orders; override keeps, per custkey, only
    * the rows of the right-most slice that has that key
    * (reference: mapred/join/OverrideRecordReader.java:49-90).
    */
  def joinOverride(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def slice(status: String) = ord.filter(col("o_orderstatus") === status)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"))
    CompositeJoin.overrideJoin(Seq(slice("F"), slice("O"), slice("P")), "custkey")
  }

  private val joinOverrideSql =
    """WITH t AS (
      |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |    CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END AS source_idx
      |  FROM orders),
      |m AS (SELECT custkey, max(source_idx) AS mp FROM t GROUP BY custkey)
      |SELECT t.custkey, t.orderkey, t.source_idx
      |FROM t JOIN m ON t.custkey = m.custkey AND t.source_idx = m.mp""".stripMargin

  /** User-DEFINED composite join type, the reference's
    * `mapred.join.define.<ident>` surface
    * (reference: mapred/join/CompositeInputFormat.java:96-110): register a
    * "collect" type — per key, every source's rows concatenated in
    * (source, value) order — then dispatch it by identifier exactly like a
    * built-in. The merge runs as one groupBy over the tagged union (single
    * shuffle on the key, map-side partial collect), and the ordered list
    * leaves as a comma-joined scalar per the catalog's oracle contract.
    */
  def joinCustom(spark: SparkSession, dir: String): DataFrame = {
    CompositeJoin.define("collect", (sources, key) =>
      CompositeJoin.taggedUnion(sources)
        .groupBy(col(key))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("source_idx"), col("orderkey")))),
            x => x.getField("orderkey").cast("string")), ",").as("orderkeys"),
          count(lit(1)).as("n_rows")))
    val ord = Tables.orders(spark, dir)
    def slice(status: String) = ord.filter(col("o_orderstatus") === status)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"))
    CompositeJoin("collect", Seq(slice("F"), slice("O"), slice("P")), "custkey")
  }

  private val joinCustomSql =
    """WITH t AS (
      |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |    CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END AS source_idx
      |  FROM orders)
      |SELECT custkey,
      |  string_agg(orderkey::VARCHAR, ',' ORDER BY source_idx, orderkey) AS orderkeys,
      |  count(*) AS n_rows
      |FROM t GROUP BY custkey""".stripMargin

  // ---- total-order sort (examples/Sort.java + TotalOrderPartitioner) ------
  def sortTotalOrder(spark: SparkSession, dir: String): DataFrame =
    TotalOrderSort.rank(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber")),
      Seq(col("l_orderkey"), col("l_linenumber")))

  private val sortSql =
    """SELECT l_orderkey, l_linenumber,
      |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      |FROM lineitem""".stripMargin

  // ---- secondary sort (examples/SecondarySort.java) -----------------------
  /** Partition by customer, order by date within the group; the in-group
    * sequence number is exactly the "values arrive sorted" contract of the
    * reference's grouping-comparator idiom (SURVEY §2.5).
    */
  def secondarySort(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("seq"))
  }

  private val secondarySortSql =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_orderdate, o_orderkey) AS seq
      |FROM orders""".stripMargin

  // ---- field selection (mapred/lib/FieldSelectionMapReduce) ---------------
  def fieldSelection(spark: SparkSession, dir: String): DataFrame = {
    val line = concat_ws(":", col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"), col("l_suppkey"), col("l_partkey"))
    FieldSelection.select(
      Tables.lineitem(spark, dir).select(line.as("line")),
      "line", ":", keySpec = "2,0", valueSpec = "4-")
  }

  private val fieldSelectionSql =
    """WITH f AS (
      |  SELECT string_split(concat_ws(':', l_orderkey, l_linenumber,
      |    l_returnflag, l_linestatus, l_suppkey, l_partkey), ':') AS w
      |  FROM lineitem)
      |SELECT array_to_string([w[3], w[1]], ':') AS sel_key,
      |       array_to_string(w[5:], ':') AS sel_value
      |FROM f""".stripMargin

  // ---- MultipleInputs → union (mapred/lib/MultipleInputs.java) ------------
  def multiInputsUnion(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cut = lit("1998-01-01").cast("timestamp")
    val oldSrc = ord.filter(col("o_orderdate") < cut).withColumn("src", lit("archive"))
    val newSrc = ord.filter(col("o_orderdate") >= cut).withColumn("src", lit("live"))
    oldSrc.unionByName(newSrc)
      .groupBy(col("src"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  private val multiInputsSql =
    """SELECT src, o_orderstatus, count(*) AS cnt,
      |  round(sum(o_totalprice), 2) AS sum_price
      |FROM (
      |  SELECT 'archive' AS src, * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |  UNION ALL
      |  SELECT 'live' AS src, * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      |GROUP BY src, o_orderstatus""".stripMargin

  // ---- MultipleOutputs routing (mapred/lib/MultipleOutputFormat.java:51) --
  /** Row→output-file routing function (generateFileNameForKeyValue); the
    * physical partitioned write is [[graft.sources.MultiSink]], exercised by
    * IoCatalog's multiple_outputs_write — this query checks the routing
    * logic itself.
    */
  def multipleOutputsRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("route"))
      .agg(count(lit(1)).as("cnt"))

  private val multipleOutputsSql =
    """SELECT concat_ws('-', l_returnflag, l_linestatus) AS route, count(*) AS cnt
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- dbcount (examples/DBCountPageView.java) ----------------------------
  /** Pageview counting (aggregation shape only); the real JDBC in/out round
    * trip with the reference's self-check invariant is IoCatalog's
    * jdbc_roundtrip via [[graft.sources.JdbcIO]].
    */
  def dbcountPageview(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("pageview"))

  private val dbcountSql =
    "SELECT event_type, count(*) AS pageview FROM events GROUP BY event_type"

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("wordcount", wordcount, Some(wordcountSql)),
    QueryDef("grep", grep, Some(grepSql)),
    QueryDef("regex_mapper", regexMapper, Some(regexMapperSql)),
    QueryDef("join_inner", joinInner, Some(joinInnerSql)),
    QueryDef("join_semi", joinSemi, Some(joinSemiSql)),
    QueryDef("join_anti", joinAnti, Some(joinAntiSql)),
    QueryDef("join_outer", joinOuter, Some(joinOuterSql)),
    QueryDef("join_override", joinOverride, Some(joinOverrideSql)),
    QueryDef("join_custom", joinCustom, Some(joinCustomSql)),
    QueryDef("null_safe_join", nullSafeJoin, Some(nullSafeJoinSql)),
    QueryDef("sort_total_order", sortTotalOrder, Some(sortSql)),
    QueryDef("secondary_sort", secondarySort, Some(secondarySortSql)),
    QueryDef("field_selection", fieldSelection, Some(fieldSelectionSql)),
    QueryDef("multi_inputs_union", multiInputsUnion, Some(multiInputsSql)),
    QueryDef("multiple_outputs_route", multipleOutputsRoute, Some(multipleOutputsSql)),
    QueryDef("dbcount_pageview", dbcountPageview, Some(dbcountSql)),
  )
}
