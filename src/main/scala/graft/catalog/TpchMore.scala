package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TPC-H join shapes beyond the Analytics headliners — each exercises a
  * distinct Catalyst capability the reference engine had to hand-build as
  * a MapReduce chain (semi/anti joins via reduce-side tag merging,
  * disjunctive predicates re-evaluated per record in the mapper,
  * "scalar subquery" as a separate averaging job + DistributedCache file;
  * cf. reference src/examples/org/apache/hadoop/examples/join/ and the
  * gridmix2 monsterQuery chain, src/benchmarks/gridmix2/.../GridMixRunner.java:230-275).
  *
  * Scale notes, per query, are on each method. The common frame: the
  * orders/lineitem spine is never broadcast and never collected; dimension
  * sides (part, supplier, the 1-row scalar aggregate) broadcast, so every
  * plan keeps exactly one shuffle-bound fact-table pass and degrades
  * gracefully when AQE decides a "dimension" outgrew the broadcast
  * threshold at 100 TB.
  */
object TpchMore extends QueryModule {

  /** TPC-H Q4 shape: EXISTS → LEFT SEMI join. The semi join keeps the
    * orders row at most once however many lineitems match — the reference
    * expresses this as a reduce-side join followed by a dedup pass (two
    * jobs); here it is one shuffle on the order key with early-out probe
    * semantics. The extra `l_shipdate > o_orderdate` correlate rides the
    * join condition, so no post-join filter materializes matched pairs.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q14 shape: two-sided conditional aggregate over a fact⋈dim join
    * (promo revenue share in one month). The month filter reaches the
    * lineitem scan (PushedFilters), so the join probes only ~1/60th of the
    * fact table; part joins on its key and at toy SF broadcasts. The CASE
    * lives INSIDE the aggregate — one pass, no self-join of two filtered
    * aggregates, which is how the reference's two-job version pays twice.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(pt, col("p_partkey") === col("l_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), disc).otherwise(lit(0.0))) /
          sum(disc), 4).as("promo_pct"),
        count(lit(1)).as("n_rows"))
  }

  private val q14Sql =
    """SELECT round(100.0 *
      |    sum(CASE WHEN p_type LIKE 'PROMO%'
      |             THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
      |    sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  /** TPC-H Q16 shape: NOT IN → LEFT ANTI join + grouped COUNT(DISTINCT).
    * The anti side (suppliers in arrears) is tiny and broadcasts; the
    * distinct-count is Catalyst's two-phase expand (partial distinct per
    * partition, exact merge) — no per-group supplier set ever materializes
    * on one node, which is the 100 TB hazard of the naive
    * collect-set-then-size formulation.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 9, 19, 23, 36, 45, 49, 50)
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_size").isin(sizes: _*))
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
    li.join(badSupp, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .join(pt, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_size IN (1, 9, 19, 23, 36, 45, 49, 50)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 shape: disjunction of conjunctions across BOTH join sides.
    * Catalyst extracts the per-side implied filters (p_brand ∈ {...},
    * l_quantity ∈ [1,30]) and pushes them below the join, then re-checks
    * the full OR above it — the reference's mapper has to evaluate the
    * whole disjunct per record with no scan-level pruning. The residual OR
    * stays inside whole-stage codegen.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    li.join(pt, col("p_partkey") === col("l_partkey"))
      .where(arm1 || arm2 || arm3)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q19Sql =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q22 shape: scalar subquery + NOT EXISTS. The average balance is
    * a 1-row aggregate broadcast-cross-joined under the filter (never
    * collected to the driver — the plan stays fully distributed and the
    * scalar recomputes for free on retry); the NOT EXISTS is a LEFT ANTI
    * join against urgent orders on the customer key. Adapted from stock
    * Q22 (all synthetic customers have orders, so the anti side is
    * "urgent orders" rather than "any order").
    */
  def q22NoUrgent(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    cust.join(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
  }

  private val q22Sql =
    """SELECT c_nationkey, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q4_order_priority", q4OrderPriority, Some(q4Sql)),
    QueryDef("q14_promo_revenue", q14PromoRevenue, Some(q14Sql)),
    QueryDef("q16_supplier_cnt", q16SupplierCnt, Some(q16Sql)),
    QueryDef("q19_disjunctive", q19Disjunctive, Some(q19Sql)),
    QueryDef("q22_no_urgent", q22NoUrgent, Some(q22Sql)),
  )
}
