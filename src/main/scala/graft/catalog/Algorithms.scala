package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Bfs, HeavyHitters}

/** Distributed-algorithm queries: graph reach, sublinear heavy hitters,
  * Pareto frontier. Each has a plain-SQL oracle twin (recursive CTE /
  * GROUP-BY-HAVING / NOT-EXISTS dominance) that is the SEMANTIC spec but
  * would not survive 100 TB — the Spark side is the scale-shaped
  * evaluation of the same answer.
  */
object Algorithms extends QueryModule {

  /** Bounded-depth BFS over the part co-purchase graph (parts sharing an
    * order). Edge build is a self-equi-join on the order key — per-order
    * multiplicity is bounded by order size (~7 lines), so the join output
    * is O(|lineitem| · linesPerOrder), never quadratic in parts. The
    * iterative expansion is [[Bfs.hopsFrom]]: one equi-join + one
    * min-aggregate per round. The oracle's recursive CTE enumerates the
    * same closure centrally.
    */
  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    Bfs.hopsFrom(edges, src = 1L, maxHops = 3)
  }

  private val bfsSql =
    """WITH RECURSIVE ed AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |),
      |walk(v, d) AS (
      |  SELECT CAST(1 AS BIGINT), 0
      |  UNION
      |  SELECT ed.v, walk.d + 1 FROM walk JOIN ed ON ed.u = walk.v
      |  WHERE walk.d < 3
      |)
      |SELECT v AS part_id, min(d) AS hops FROM walk GROUP BY v""".stripMargin

  /** Exact tokens at ≥1% relative support via [[HeavyHitters.frequent]]
    * (Misra-Gries candidates, k=128 counters/partition, then exact
    * recount). The oracle's full GROUP BY HAVING shuffles the entire
    * vocabulary; the engine path shuffles at most k·partitions keys.
    */
  def heavyHitterTokens(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word") =!= "")
    HeavyHitters.frequent(words, supportDenom = 100, k = 128)
  }

  private val heavyHittersSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
      |),
      |tf AS (
      |  SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word
      |)
      |SELECT word, cnt FROM tf
      |WHERE cnt * 100 >= (SELECT count(*) FROM toks WHERE word <> '')""".stripMargin

  /** 2-D Pareto frontier (skyline) of parts minimizing (p_size,
    * p_retailprice). Decomposition: (1) per-size min price — a key
    * aggregate that collapses the data to ≤ |distinct sizes| rows;
    * (2) running strictly-smaller-size min over that TINY frame (the one
    * single-partition window; bounded by attribute cardinality, never data
    * size); (3) broadcast the frontier back to recover tied part rows.
    * The oracle's NOT-EXISTS dominance check is the quadratic spec.
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val mins = p.groupBy("p_size").agg(min("p_retailprice").as("mp"))
    val smaller = Window.orderBy(col("p_size"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = mins
      .withColumn("smaller_min", min(col("mp")).over(smaller))
      .where(col("smaller_min").isNull || col("mp") < col("smaller_min"))
      .select(col("p_size").as("f_size"), col("mp"))
    p.join(broadcast(frontier),
        col("p_size") === col("f_size") && col("p_retailprice") === col("mp"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
  }

  private val skylineSql =
    """SELECT p.p_partkey, p.p_size, p.p_retailprice
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM part q
      |  WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
      |    AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice))""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("bfs_hops", bfsHops, Some(bfsSql)),
    QueryDef("heavy_hitters", heavyHitterTokens, Some(heavyHittersSql)),
    QueryDef("skyline_parts", skylineParts, Some(skylineSql)),
  )
}
