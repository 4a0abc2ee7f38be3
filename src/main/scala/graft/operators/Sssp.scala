package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Materialize

/** Single-source shortest paths over a weighted graph, bounded rounds —
  * synchronous Bellman-Ford on the min-plus semiring. Each round relaxes
  * EVERY settled vertex (not just a frontier: with weights, a node
  * reached cheaply late can undercut a node reached early), which is one
  * equi-join edges⋈dist + one min-aggregate — the same two-shuffle round
  * shape as PageRank, no driver-side graph state beyond the 1-row source
  * scalar.
  *
  * Reference analog: none (the reference's graph processing is the
  * example drivers' chained jobs); this is the Pregel-style iteration
  * expressed as relational rounds.
  */
object Sssp {

  /** @param edges  columns `u`, `v`, `w` (BIGINT); treated as undirected.
    * @return (part_id, cost) for every vertex within `rounds` hops of the
    *         highest-degree vertex (ties → smallest id) — a deterministic,
    *         engine-independent source that lands in the graph's dense
    *         region at every SF; the collect is ONE scalar row.
    */
  def relax(edges: DataFrame, rounds: Int,
            trace: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col("u"), col("v"), col("w"))
      .union(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val src = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("u")).head().getLong(0)

    var dist = Seq((src, 0L)).toDF("part_id", "cost")
    for (i <- 1 to rounds) {
      val next = dist.join(e, col("part_id") === col("u"))
        .select(col("v").as("part_id"), (col("cost") + col("w")).as("cost"))
      val round = dist.union(next).groupBy("part_id").agg(min("cost").as("cost"))
      dist = Materialize(round)
      trace.foreach(t => graft.core.PlanTrace.capture(round, s"${t}_round$i"))
    }
    e.unpersist()
    dist
  }
}
