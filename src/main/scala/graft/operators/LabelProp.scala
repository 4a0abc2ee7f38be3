package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Materialize

/** Seeded min-label propagation: a subset of vertices starts labeled
  * (label = own id) and every synchronous round each vertex takes the min
  * of its own and its neighbors' labels — after k rounds a vertex holds
  * the smallest seed label within k hops (multi-source BFS carrying
  * labels). The semi-supervised cousin of connected components: CC labels
  * everything from everywhere; this floods only from the seed set, which
  * is the shape of label-spreading over a similarity graph (annotate a
  * seed corpus, propagate to near-duplicates).
  *
  * Per round: one equi-join + one min-aggregate; label state is one row
  * per reached vertex, never an adjacency list.
  */
object LabelProp {

  /** @param edges  columns `u`, `v` (BIGINT); treated as undirected.
    * @param seedMod vertices with id % seedMod == 0 are seeds.
    */
  def minLabel(edges: DataFrame, seedMod: Long, rounds: Int,
               trace: Option[String] = None): DataFrame = {
    val e = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = e.select(col("u").as("part_id")).distinct()
      .where(col("part_id") % seedMod === 0)
      .select(col("part_id"), col("part_id").as("label"))
    for (i <- 1 to rounds) {
      val prop = labels.join(e, col("part_id") === col("u"))
        .select(col("v").as("part_id"), col("label"))
      val round = labels.union(prop).groupBy("part_id").agg(min("label").as("label"))
      labels = Materialize(round)
      trace.foreach(t => graft.core.PlanTrace.capture(round, s"${t}_round$i"))
    }
    e.unpersist()
    labels
  }
}
