package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.MrJob

/** Queries driven through the [[graft.plans.MrJob]] façade — proving the
  * JobConf algebra (mapper/combiner/partitioner/sort/grouping/reducer)
  * compiles to correct Spark execution, including the values-sorted-
  * within-group contract that no declarative groupBy gives.
  */
object MrFacade extends QueryModule {

  /** WordCount as a full MrJob: tokenizing mapper, summing combiner
    * (map-side), summing reducer — the canonical pipeline
    * (reference: examples/WordCount.java:35-44).
    */
  def mrjobWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val input = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].rdd
    MrJob.run[Long, String, String, Long, Long, String, String, Long](
      input,
      mapper = (_, text) =>
        text.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (word, counts) => Iterator.single(word -> counts.sum),
      combiner = Some((_, counts) => Iterator.single(counts.sum)),
      numReduces = 32,
      sortKey = identity[Long],
      groupKey = identity[String],
    ).toDF("word", "cnt")
  }

  private val mrjobWordcountSql =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
      |        w -> w <> '')) AS word FROM documents)
      |GROUP BY word""".stripMargin

  /** Secondary sort as a full MrJob: partition by customer, sort values by
    * (date, orderkey), group by customer — the reducer consumes each
    * customer's orders IN DATE ORDER from a lazy iterator and emits the
    * first three plus the count (reference: examples/SecondarySort.java:57-163:
    * FirstPartitioner + IntPair sort comparator + FirstGroupingComparator).
    */
  def mrjobSecondarySort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val input = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        // NTZ → TZ cast is value-preserving under the UTC session timezone
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
        col("o_orderkey"))
      .as[(Long, Long, Long)].rdd
      .map { case (cust, date, ord) => (cust, (date, ord)) }
    MrJob.run[Long, (Long, Long), Long, (Long, Long), (Long, Long), Long,
        Long, (String, Long)](
      input,
      mapper = (cust, v) => Iterator.single(cust -> v),
      reducer = (cust, orders) => {
        // orders arrive sorted by (date, orderkey) — the façade's contract
        var n = 0L
        val first = List.newBuilder[Long]
        orders.foreach { case (_, orderkey) =>
          if (n < 3) first += orderkey
          n += 1
        }
        Iterator.single(cust -> (first.result().mkString(","), n))
      },
      numReduces = 32,
      sortKey = identity[(Long, Long)],
      groupKey = identity[Long],
    ).map { case (cust, (firstOrders, n)) => (cust, firstOrders, n) }
      .toDF("custkey", "first_orders", "n_orders")
  }

  private val mrjobSecondarySortSql =
    """SELECT o_custkey AS custkey,
      |  array_to_string(list(o_orderkey ORDER BY o_orderdate, o_orderkey)[1:3], ',')
      |    AS first_orders,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("mrjob_wordcount", mrjobWordcount, Some(mrjobWordcountSql)),
    QueryDef("mrjob_secondary_sort", mrjobSecondarySort, Some(mrjobSecondarySortSql)),
  )
}
