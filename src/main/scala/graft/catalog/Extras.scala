package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Scratch, Tables}
import graft.functions.PortableHash
import graft.operators.TotalOrderSort

/** Remaining example-catalog entries: the multi-job DAG, the pi estimator,
  * and the MapFile point-lookup idiom.
  */
object Extras extends QueryModule {

  // ---- monsterQuery: the 3-stage chained-MR DAG ---------------------------
  /** gridmix2's "monsterQuery" is three chained MapReduce jobs, each
    * materializing to HDFS before the next starts
    * (reference: gridmix2/.../GridMixRunner.java:230-275; multi-job DAGs via
    * mapred/jobcontrol/JobControl.java). Here the whole DAG is ONE
    * declarative plan — stage 1 (per-customer aggregate), stage 2 (join to
    * orders + filter), stage 3 (re-aggregate + global top-k) — with zero
    * intermediate materialization: Catalyst pipelines all three stages and
    * the only barriers are the two shuffles the semantics require.
    */
  def monsterQuery(spark: SparkSession, dir: String): DataFrame = {
    // stage 1: per-customer order stats
    val stage1 = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
    // stage 2: join back to customers, keep the busy ones
    val stage2 = stage1
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .where(col("n_orders") >= 10)
    // stage 3: per-segment rollup + deterministic top-5 by spend
    stage2.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_busy_customers"),
        round(sum(col("total_spend")), 2).as("segment_spend"))
      .orderBy(col("segment_spend").desc, col("c_mktsegment"))
      .limit(5)
  }

  private val monsterQuerySql =
    """WITH stage1 AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    round(sum(o_totalprice), 2) AS total_spend
      |  FROM orders GROUP BY o_custkey
      |), stage2 AS (
      |  SELECT * FROM stage1 JOIN customer ON o_custkey = c_custkey
      |  WHERE n_orders >= 10
      |)
      |SELECT c_mktsegment, count(*) AS n_busy_customers,
      |  round(sum(total_spend), 2) AS segment_spend
      |FROM stage2 GROUP BY c_mktsegment
      |ORDER BY segment_spend DESC, c_mktsegment
      |LIMIT 5""".stripMargin

  // ---- pi estimator -------------------------------------------------------
  private val PiSamples = 100000L

  /** Monte-Carlo pi (reference: examples/PiEstimator.java:75-138 — Halton
    * quasi-random points, map counts inside/outside, one reducer sums).
    * Points here derive from the portable hash so the oracle reproduces the
    * sample stream exactly; generation is `spark.range` — embarrassingly
    * parallel, one partial-sum aggregate, no reducer bottleneck.
    */
  def piEstimate(spark: SparkSession, dir: String): DataFrame = {
    val denom = lit((1L << 48).toDouble)
    val x = PortableHash.h48(concat_ws(":", lit("pix"), col("id"))).cast("double") / denom
    val y = PortableHash.h48(concat_ws(":", lit("piy"), col("id"))).cast("double") / denom
    spark.range(PiSamples)
      .select(when(x * x + y * y <= 1.0, 1L).otherwise(0L).as("inside"))
      .agg(count(lit(1)).as("n_samples"), sum(col("inside")).as("n_inside"),
        round(sum(col("inside")).cast("double") * 4 / count(lit(1)), 6).as("pi_estimate"))
  }

  private val piEstimateSql = {
    val hx = PortableHash.h48Sql("'pix:' || i")
    val hy = PortableHash.h48Sql("'piy:' || i")
    s"""WITH v AS (
       |  SELECT $hx::DOUBLE / 281474976710656.0 AS x,
       |         $hy::DOUBLE / 281474976710656.0 AS y
       |  FROM generate_series(0, ${PiSamples - 1}) t(i)
       |), pts AS (
       |  SELECT CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END AS inside
       |  FROM v
       |)
       |SELECT count(*) AS n_samples, sum(inside)::BIGINT AS n_inside,
       |  round(sum(inside)::DOUBLE * 4 / count(*), 6) AS pi_estimate
       |FROM pts""".stripMargin
  }

  // ---- MapFile: sorted+indexed sink with point lookup ---------------------
  private val LookupKeys = Seq(42L, 4242L, 424242L)

  /** The MapFile idiom (reference: io/MapFile.java sorted data + index;
    * mapred/MapFileOutputFormat.getEntry:82-107 picks the partition by the
    * job's partitioner and binary-searches it): write range-partitioned
    * globally-SORTED parquet (each file covers a contiguous key range —
    * parquet row-group min/max stats are the "index"), then point-lookup a
    * key set; the filter prunes to the one file and row groups whose range
    * covers each key.
    */
  def mapfileLookup(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("mapfile_lookup", dir)
    TotalOrderSort.sort(
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      Seq(col("o_orderkey")))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .where(col("o_orderkey").isin(LookupKeys: _*))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
  }

  private val mapfileLookupSql =
    s"""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       |FROM orders WHERE o_orderkey IN (${LookupKeys.mkString(", ")})""".stripMargin

  // ---- rollup / cube (additive: SURVEY §2.4 "absent in reference") --------
  /** Hierarchical totals in one pass — the reference would run one MR job
    * per grouping level and a manual union.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("o_orderstatus"), col("order_year"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))

  private val rollupAggSql =
    """SELECT o_orderstatus, year(o_orderdate) AS order_year,
      |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))""".stripMargin

  // ---- distributed backtracking search (examples/dancing) -----------------
  /** Known-answer validation like the reference's own drivers: the puzzle
    * has exactly one solution, computed by exhausting the search space
    * across tasks (reference: examples/dancing/Sudoku.java prints it; our
    * oracle asserts it — the PiEstimator known-constant pattern).
    */
  private val SudokuPuzzle =
    "530070000600195000098000060800060003400803001700020006060000280000419005000080079"
  private val SudokuSolution =
    "534678912672195348198342567859761423426853791713924856961537284287419635345286179"

  def sudoku(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedSearch.solveSudoku(spark, SudokuPuzzle)

  private val sudokuSql = s"SELECT '$SudokuSolution' AS solution"

  /** 6×10 pentomino tiling count (reference:
    * examples/dancing/DistributedPentomino.java) through the same prefix
    * fan-out; the oracle is the published 2339 distinct-solution constant —
    * the known-answer pattern the reference's own drivers use.
    */
  def pentomino(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedSearch.pentominoSolutions(spark)

  private val pentominoSql = "SELECT 2339::BIGINT AS n_solutions"

  // ---- nested type algebra (record DDL compiler: JRecord/JVector/JMap) ----
  /** The reference's compiled nested records (SURVEY §1: record compiler
    * JRecord/JVector/JMap → StructType/ArrayType/MapType) proven by a
    * build → parquet round trip → navigate pass: per customer a struct of
    * scalars, an array of order keys, and a map status→count; read back
    * and flattened through field access, element access, and map lookup.
    */
  def nestedTypes(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir("nested_types", dir)
    val ord = Tables.orders(spark, dir)
    val statusMap = ord.groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_custkey"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("o_orderstatus"), col("c"))))).as("status_counts"))
    val nested = ord.groupBy(col("o_custkey"))
      .agg(
        struct(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("spend")).as("stats"),
        sort_array(collect_list(col("o_orderkey"))).as("orderkeys"))
      .join(statusMap, "o_custkey")
    nested.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).select(
      col("o_custkey").as("custkey"),
      col("stats.n").as("n_orders"),
      col("stats.spend").as("spend"),
      size(col("orderkeys")).as("n_keys"),
      element_at(col("orderkeys"), 1).as("first_key"),
      // try_: ANSI element_at throws on a missing map key, and a customer
      // with no open orders is a legal input
      try_element_at(col("status_counts"), lit("O")).as("n_open"))
  }

  private val nestedTypesSql =
    """SELECT o_custkey AS custkey, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS spend,
      |  count(*) AS n_keys, min(o_orderkey) AS first_key,
      |  nullif(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_open
      |FROM orders GROUP BY o_custkey""".stripMargin

  // ---- skew mitigation: salting -------------------------------------------
  private val Salts = 16

  /** Two-phase salted aggregation for hot keys: phase 1 aggregates
    * (key, salt) — spreading each hot key over `Salts` reducers — phase 2
    * merges the partials per key. Identical result to a direct groupBy;
    * at 100 TB this is the fix when one key holds half the data and even
    * AQE's skew handling can't split a single aggregation key.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = Tables.events(spark, dir)
      .withColumn("salt", pmod(hash(col("event_id")), lit(Salts)))
    val partial = salted.groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
    partial.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"), round(sum(col("pv")), 2).as("sum_value"))
  }

  private val saltedAggSql =
    """SELECT event_type, count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Salted broadcast-free join for a skewed fact side: the small dimension
    * replicates once per salt value, the fact side salts deterministically,
    * and the join key becomes (key, salt) — every hot key's rows spread
    * over `Salts` tasks. Result identical to the plain join.
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.events(spark, dir).select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")))
    val dimSalted = dim.crossJoin(
      spark.range(Salts).select(col("id").cast("int").as("salt")))
    val factSalted = Tables.events(spark, dir)
      .withColumn("salt", pmod(hash(col("event_id")), lit(Salts)))
    factSalted.join(dimSalted, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("weight")).as("weight"))
  }

  private val saltedJoinSql =
    """SELECT event_type, count(*) AS n_events,
      |  length(event_type) AS weight
      |FROM events GROUP BY event_type""".stripMargin

  // ---- bloom filter (util/bloom/BloomFilter.java; BloomMapFile) -----------
  /** Build a bloom filter over customer keys, probe every order's customer
    * — the reference's BloomMapFile / DynamicBloomFilter membership idiom
    * (reference: src/core/org/apache/hadoop/util/bloom/BloomFilter.java).
    * The oracle checks the no-false-negative invariant (every true member
    * probes positive — the bloom contract); the false-positive RATE is
    * implementation-defined and asserted in the ScalaTest spec instead.
    * The one-row filter broadcasts to the probe side — at 100 TB this is
    * the shippable-side-structure pattern (a semi-join reduced to a scan).
    */
  def bloomFilter(spark: SparkSession, dir: String): DataFrame = {
    // df.stat.bloomFilter is the public sketch builder (a distributed
    // aggregate under the hood); the serialized filter rides into the probe
    // scan as a binary literal, and the probe is Spark's native codegen'd
    // BloomFilterMightContain expression (no per-row UDF boundary) —
    // registered as bloom_might_contain in GraftSession's extensions
    val bf = Tables.customer(spark, dir).stat
      .bloomFilter("c_custkey", expectedNumItems = 200000, fpp = 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val probe = call_function("bloom_might_contain",
      lit(bytes.toByteArray), col("o_custkey"))
    Tables.orders(spark, dir).select(col("o_custkey")).distinct()
      .select(when(probe, 1L).otherwise(0L).as("hit"))
      .agg(count(lit(1)).as("n_probed"), sum(col("hit")).as("n_positive"))
  }

  private val bloomFilterSql =
    """SELECT count(*) AS n_probed, count(*) AS n_positive
      |FROM (SELECT DISTINCT o_custkey FROM orders)""".stripMargin

  /** Bloom-prefiltered join: the semi-join-reduction pattern for a
    * selective dim that is too big to broadcast whole. The dim's join keys
    * compress into a fixed-size bloom (a few MB regardless of dim rows)
    * that rides into the fact scan as a binary literal; the fact is
    * prefiltered BEFORE its shuffle by the codegen'd `bloom_might_contain`
    * probe, and the exact equi-join afterwards removes the bloom's false
    * positives — so the result is exact and the oracle is the plain join.
    * At 100 TB this is the difference between shuffling the whole fact and
    * shuffling ~the matching slice; Spark's runtime row-level filtering
    * applies the same idea automatically when statistics allow, this row
    * pins the explicit form. (Reference analog: BloomMapFile skips blocks
    * whose bloom rejects the key — src/core/org/apache/hadoop/io/
    * BloomMapFile.java:45 — the same reject-before-touching idea at file
    * granularity.)
    */
  def bloomPrefilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(spark, dir)
      .where(col("p_type") === "PROMO" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_brand"))
    val bf = dim.stat.bloomFilter("p_partkey",
      expectedNumItems = 100000, fpp = 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val probe = call_function("bloom_might_contain",
      lit(bytes.toByteArray), col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .where(probe)
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
  }

  private val bloomPrefilterJoinSql =
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
      |       AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'PROMO' AND p_size <= 10
      |GROUP BY p_brand""".stripMargin

  // ---- set operations (additive: absent in the reference, SURVEY §2.5) ----
  /** intersect/except over customer-key slices — the set ops the reference
    * could only hand-roll in reducers.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val fCusts = ord.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    val oCusts = ord.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = fCusts.intersect(oCusts).agg(count(lit(1)).as("n")).
      select(lit("both").as("op"), col("n"))
    val onlyF = fCusts.except(oCusts).agg(count(lit(1)).as("n"))
      .select(lit("only_f").as("op"), col("n"))
    both.unionByName(onlyF)
  }

  private val setOpsSql =
    """SELECT 'both' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'only_f', count(*) FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin

  // ---- declarative data-quality rule report -------------------------------
  /** One data-quality sweep over the warehouse: each rule is a conditional
    * aggregate (range, null-rate, NaN) or an anti-join (orphaned foreign
    * keys), and the report is the union of their one-row results — the
    * "is this corpus drop loadable" gate a pipeline runs before training.
    * Shape: one scan per table with ALL of that table's conditional rules
    * fused into a single aggregate (Catalyst collapses them — no
    * rule-count × scan-count blowup), plus one broadcastable anti-join
    * per FK rule; the union is rule-count rows, driver-tiny. At 100 TB
    * every rule stays a scan-speed partial aggregate.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    def report(rule: String, checked: Column, violations: Column,
               df: DataFrame): DataFrame =
      df.agg(checked.cast("long").as("n_checked"),
        violations.cast("long").as("n_violations"))
        .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ev = Tables.events(spark, dir)
    val docs = Tables.documents(spark, dir)
    val cnt = count(lit(1))
    val viol = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val orphanedLi = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanedOrders = orders.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
    // the two lineitem conditional rules share ONE scan (a single fused
    // aggregate exploded to two report rows) — separate report() calls
    // were two full passes of the widest table
    li.agg(cnt.cast("long").as("n"),
        viol(!col("l_quantity").between(1, 50)).cast("long").as("v_qty"),
        viol(col("l_extendedprice") <= 0).cast("long").as("v_price"))
      .select(explode(array(
        struct(lit("lineitem.quantity_in_1_50").as("rule"),
          col("n").as("n_checked"), col("v_qty").as("n_violations")),
        struct(lit("lineitem.price_positive").as("rule"),
          col("n").as("n_checked"), col("v_price").as("n_violations"))))
        .as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"))
      .unionAll(report("lineitem.orderkey_resolves", lit(0),
        cnt, orphanedLi).withColumn("n_checked",
          lit(null).cast("long")))
      .unionAll(report("orders.custkey_resolves", lit(0),
        cnt, orphanedOrders).withColumn("n_checked",
          lit(null).cast("long")))
      .unionAll(report("orders.totalprice_positive", cnt,
        viol(col("o_totalprice") <= 0), orders))
      .unionAll(report("events.value_not_nan", cnt,
        viol(isnan(col("value"))), ev))
      .unionAll(report("documents.text_nonempty", cnt,
        viol(length(trim(col("text"))) === 0), docs))
  }

  private val dqChecksSql =
    """SELECT 'lineitem.quantity_in_1_50' AS rule, count(*) AS n_checked,
      |  CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_violations FROM lineitem
      |UNION ALL
      |SELECT 'lineitem.price_positive', count(*),
      |  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem.orderkey_resolves', NULL, count(*)
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'orders.custkey_resolves', NULL, count(*)
      |FROM orders o WHERE NOT EXISTS
      |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'orders.totalprice_positive', count(*),
      |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'events.value_not_nan', count(*),
      |  CAST(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events
      |UNION ALL
      |SELECT 'documents.text_nonempty', count(*),
      |  CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM documents""".stripMargin

  // ---- end-to-end curation pipeline ---------------------------------------
  private val PipeMinChars = 100
  private val PipeDedupThreshold = 0.9

  /** A full training-data curation pass in ONE declarative plan:
    * language/length filter → near-dup removal (keep the lower doc_id of
    * each MinHash-LSH pair) → per-source token budget. The stages the
    * reference would chain through temp dirs compose here as subplans, so
    * Catalyst prunes/pushes across stage boundaries.
    */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    import graft.operators.MinHashLsh
    val docs = Tables.documents(spark, dir)
    val dupLosers = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 3,
      PipeDedupThreshold).select(col("doc_b").as("doc_id")).distinct()
    docs.where(col("lang") === "en" && col("n_chars") >= PipeMinChars)
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .select(col("source"), TextFns.tokens(col("text")).as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("tokens"))
  }

  private val pipelineE2eSql = {
    import graft.functions.TextFns
    import graft.operators.MinHashLsh
    val pairs = MinHashLsh.nearDupSql("documents", "doc_id", "text", 3,
      PipeDedupThreshold)
    s"""WITH dup_pairs AS (
       |$pairs
       |), keep AS (
       |  SELECT * FROM documents
       |  WHERE lang = 'en' AND n_chars >= $PipeMinChars
       |    AND doc_id NOT IN (SELECT doc_b FROM dup_pairs)
       |)
       |SELECT source, count(*) AS n_docs,
       |  sum(len(${TextFns.tokensSql("text")}))::BIGINT AS tokens
       |FROM keep GROUP BY source""".stripMargin
  }

  // ---- one-pass table profiling -------------------------------------------
  /** Column profiler — the data-quality pass a pipeline runs before
    * training: per column of `events`, row count, null count, EXACT
    * distinct count, and canonical min/max keys, computed in ONE
    * aggregate job (Catalyst's Expand handles the multi-column distincts;
    * that is a deliberate exactness/read-amplification trade — the
    * approx_count_distinct variant drops the Expand for one pass at
    * scale). min/max canonicalize to strings through integer-exact
    * encodings only (longs as decimal strings, doubles floor-quantized to
    * micro-units, timestamps as epoch-ns), so the cross-engine compare
    * never touches float formatting.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val one = ev.agg(
      count(lit(1)).as("n_rows"),
      count(col("event_id")).as("c_event_id"),
      countDistinct(col("event_id")).as("d_event_id"),
      min(col("event_id")).as("mn_event_id"), max(col("event_id")).as("mx_event_id"),
      count(col("user_id")).as("c_user_id"),
      countDistinct(col("user_id")).as("d_user_id"),
      min(col("user_id")).as("mn_user_id"), max(col("user_id")).as("mx_user_id"),
      count(col("event_type")).as("c_event_type"),
      countDistinct(col("event_type")).as("d_event_type"),
      min(col("event_type")).as("mn_event_type"), max(col("event_type")).as("mx_event_type"),
      // ts profiles at MICROsecond precision: the oracle engine reads the
      // nanos parquet timestamp truncated to us, so ns-level stats are not
      // cross-engine comparable (and two events in the same us would make
      // even n_distinct diverge)
      count(col("ts")).as("c_ts"),
      countDistinct(expr("ts div 1000")).as("d_ts"),
      min(expr("ts div 1000")).as("mn_ts"), max(expr("ts div 1000")).as("mx_ts"),
      count(col("value")).as("c_value"), countDistinct(col("value")).as("d_value"),
      min(col("value")).as("mn_value"), max(col("value")).as("mx_value"))
    one.select(expr(
      """stack(5,
        |'event_id',  n_rows, n_rows - c_event_id,  d_event_id,
        |  cast(mn_event_id as string), cast(mx_event_id as string),
        |'user_id',   n_rows, n_rows - c_user_id,   d_user_id,
        |  cast(mn_user_id as string), cast(mx_user_id as string),
        |'event_type',n_rows, n_rows - c_event_type,d_event_type,
        |  mn_event_type, mx_event_type,
        |'ts',        n_rows, n_rows - c_ts,        d_ts,
        |  cast(mn_ts as string), cast(mx_ts as string),
        |'value',     n_rows, n_rows - c_value,     d_value,
        |  cast(floor(mn_value * 1000000) as string),
        |  cast(floor(mx_value * 1000000) as string))
        |AS (col_name, n_rows, n_nulls, n_distinct, min_key, max_key)
        |""".stripMargin))
  }

  private val tableProfileSql =
    """SELECT 'event_id' AS col_name, count(*) AS n_rows,
      |  count(*) - count(event_id) AS n_nulls,
      |  count(DISTINCT event_id) AS n_distinct,
      |  min(event_id)::VARCHAR AS min_key, max(event_id)::VARCHAR AS max_key
      |FROM events
      |UNION ALL
      |SELECT 'user_id', count(*), count(*) - count(user_id),
      |  count(DISTINCT user_id), min(user_id)::VARCHAR, max(user_id)::VARCHAR
      |FROM events
      |UNION ALL
      |SELECT 'event_type', count(*), count(*) - count(event_type),
      |  count(DISTINCT event_type), min(event_type), max(event_type)
      |FROM events
      |UNION ALL
      |SELECT 'ts', count(*), count(*) - count(ts),
      |  count(DISTINCT epoch_us(ts)),
      |  min(epoch_us(ts))::VARCHAR, max(epoch_us(ts))::VARCHAR
      |FROM events
      |UNION ALL
      |SELECT 'value', count(*), count(*) - count(value),
      |  count(DISTINCT value),
      |  floor(min(value) * 1000000)::BIGINT::VARCHAR,
      |  floor(max(value) * 1000000)::BIGINT::VARCHAR
      |FROM events""".stripMargin

  // ---- SCD2 dimension versioning ------------------------------------------
  /** Slowly-changing-dimension (type 2) merge: fold a CDC change stream
    * into a versioned dimension with [valid_from, valid_to) day ranges.
    * Base = each customer's account balance (sentinel day 0); changes =
    * their orders' totals keyed by order day, compacted last-write-wins
    * per (key, day) by the highest orderkey — the CDC dedup a real feed
    * needs. One window pass per key assigns each version its successor's
    * day as valid_to (open versions get sentinel 99999999); everything
    * shuffles once on custkey. Money stays in exact cents.
    */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").as("custkey"), lit(0L).as("day"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
    val changes = Tables.orders(spark, dir).select(
        col("o_custkey").as("custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("custkey"), col("day"))
        .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1).drop("rn", "o_orderkey")
    val w = Window.partitionBy(col("custkey")).orderBy(col("day"))
    base.unionByName(changes)
      .withColumn("valid_to",
        coalesce(lead(col("day"), 1).over(w), lit(99999999L)))
      .select(col("custkey"), col("day").as("valid_from"), col("valid_to"),
        col("cents"), (col("valid_to") === 99999999L).as("is_current"))
  }

  private val scd2MergeSql =
    """WITH base AS (
      |  SELECT c_custkey AS custkey, 0::BIGINT AS day,
      |    round(c_acctbal * 100)::BIGINT AS cents
      |  FROM customer
      |), ch AS (
      |  SELECT o_custkey AS custkey, epoch_us(o_orderdate) // 86400000000 AS day,
      |    round(o_totalprice * 100)::BIGINT AS cents,
      |    row_number() OVER (PARTITION BY o_custkey,
      |      epoch_us(o_orderdate) // 86400000000
      |      ORDER BY o_orderkey DESC) AS rn
      |  FROM orders
      |), u AS (
      |  SELECT custkey, day, cents FROM base
      |  UNION ALL
      |  SELECT custkey, day, cents FROM ch WHERE rn = 1
      |)
      |SELECT custkey, day AS valid_from,
      |  coalesce(lead(day) OVER (PARTITION BY custkey ORDER BY day),
      |           99999999) AS valid_to,
      |  cents,
      |  coalesce(lead(day) OVER (PARTITION BY custkey ORDER BY day),
      |           99999999) = 99999999 AS is_current
      |FROM u""".stripMargin

  // ---- join-key skew diagnosis --------------------------------------------
  /** Skew report for a join key — the diagnostic a planner (or an engineer
    * deciding whether [[MiscOps]]' salted join is warranted) reads before
    * shuffling 100 TB on that key: the 5 hottest key values with their row
    * share in basis points, plus the key's global skew factor
    * (hottest-key count ÷ mean count, ×1000 — 1000 = perfectly uniform).
    * One partial-aggregated groupBy + a 5-row top-k; the per-key count
    * table never leaves the cluster and the scalars that do are bounded.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    // orderBy+limit plans as TakeOrdered (per-partition top-5, then a
    // 5·partitions merge) — never a global single-partition sort of the
    // whole count table; the rank window runs over the 5 survivors only
    val top5 = counts.orderBy(col("cnt").desc, col("l_partkey")).limit(5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("l_partkey"))))
    top5
      .crossJoin(counts.agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("n_keys")))
      .select(col("rank"), col("l_partkey"), col("cnt"),
        expr("(10000 * cnt) div total").as("share_bp"),
        expr("(1000 * cnt * n_keys) div total").as("skew_x1000"))
  }

  private val skewReportSql =
    """WITH counts AS (
      |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys
      |  FROM counts
      |), ranked AS (
      |  SELECT l_partkey, cnt,
      |    row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rank
      |  FROM counts
      |)
      |SELECT rank, l_partkey, cnt,
      |  CAST((10000 * cnt) // total AS BIGINT) AS share_bp,
      |  CAST((1000 * cnt * n_keys) // total AS BIGINT) AS skew_x1000
      |FROM ranked, tot WHERE rank <= 5""".stripMargin

  // ---- Benford first-digit audit -------------------------------------------
  /** Benford expectation per leading digit, floor(10⁶·log10(1 + 1/d)) —
    * computed once here and interpolated as literals into both engines
    * (the NdcgDiscount device: no engine evaluates a logarithm at query
    * time, so the two sides agree by construction).
    */
  private val BenfordMicro: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /** Benford's-law audit of order amounts — the classic anomaly screen
    * for fabricated or clipped numeric columns (a synthetic-data
    * fingerprint check for a pipeline ingesting third-party corpora):
    * the leading digit of each cent amount against floor(10⁶·log10(1+1/d)).
    * The digit extracts via STRING truncation (`substring` of the decimal
    * rendering) — identical in both engines, no float log anywhere; the
    * observed frequencies are one 9-row aggregate off a map-only scan,
    * deviations in micro units with the usual truncating division.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val expCase = s"CASE digit ${BenfordMicro.map { case (d, e) =>
      s"WHEN $d THEN ${e}L" }.mkString(" ")} END"
    Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .where(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(
        Tables.orders(spark, dir).where(expr("round(o_totalprice * 100) > 0"))
          .agg(count(lit(1)).as("tot"))))
      .select(col("digit"), col("n").as("n_orders"),
        expr("(1000000 * n) div tot").as("obs_micro"),
        expr(expCase).as("exp_micro"),
        (expr("(1000000 * n) div tot") - expr(expCase)).as("dev_micro"))
  }

  private val benfordDigitsSql = {
    val expCase = s"CASE digit ${BenfordMicro.map { case (d, e) =>
      s"WHEN $d THEN $e" }.mkString(" ")} END"
    s"""WITH s AS (
       |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders
       |  WHERE round(o_totalprice * 100) > 0
       |), d AS (
       |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM s
       |), g AS (
       |  SELECT digit, count(*) AS n FROM d GROUP BY digit
       |), t AS (
       |  SELECT CAST(count(*) AS BIGINT) AS tot FROM s
       |)
       |SELECT digit, n AS n_orders,
       |  CAST((1000000 * n) // tot AS BIGINT) AS obs_micro,
       |  CAST($expCase AS BIGINT) AS exp_micro,
       |  CAST((1000000 * n) // tot - $expCase AS BIGINT) AS dev_micro
       |FROM g CROSS JOIN t""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("skew_report", skewReport, Some(skewReportSql)),
    QueryDef("table_profile", tableProfile, Some(tableProfileSql)),
    QueryDef("scd2_merge", scd2Merge, Some(scd2MergeSql)),
    QueryDef("set_ops", setOps, Some(setOpsSql)),
    QueryDef("pipeline_e2e", pipelineE2e, Some(pipelineE2eSql)),
    QueryDef("monster_query", monsterQuery, Some(monsterQuerySql)),
    QueryDef("pi_estimate", piEstimate, Some(piEstimateSql)),
    QueryDef("mapfile_lookup", mapfileLookup, Some(mapfileLookupSql)),
    QueryDef("bloom_filter", bloomFilter, Some(bloomFilterSql)),
    QueryDef("bloom_prefilter_join", bloomPrefilterJoin, Some(bloomPrefilterJoinSql)),
    QueryDef("salted_agg", saltedAgg, Some(saltedAggSql)),
    QueryDef("salted_join", saltedJoin, Some(saltedJoinSql)),
    QueryDef("nested_types", nestedTypes, Some(nestedTypesSql)),
    QueryDef("dq_checks", dqChecks, Some(dqChecksSql)),
    QueryDef("benford_digits", benfordDigits, Some(benfordDigitsSql)),
    QueryDef("sudoku", sudoku, Some(sudokuSql)),
    QueryDef("pentomino", pentomino, Some(pentominoSql)),
    QueryDef("rollup_agg", rollupAgg, Some(rollupAggSql)),
  )
}
