package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Materialize

/** Bounded-depth breadth-first search: minimum hop distance from a source
  * vertex over an undirected edge set, as iterative frontier expansion.
  *
  * Per round: one equi-join (frontier ⋈ edges on the source endpoint) and
  * one min-aggregate — both key-shuffles, no cartesian, no driver-side
  * graph. The frontier only ever holds NEWLY discovered vertices (distance
  * == round), so the join probe side shrinks as the search saturates;
  * edges are cached once and reused every round. Distances are folded with
  * `min`, so re-discovering a vertex later never overwrites a shorter
  * path. Lineage is truncated per round via [[Materialize]] (local
  * checkpoint in tests, reliable dir on a cluster) — the standard guard
  * against O(rounds²) re-execution in iterative Spark jobs.
  *
  * The reference expresses this exact pattern as one MapReduce job PER
  * ROUND with the distance table re-read from HDFS each time (the classic
  * "iterative MR" tax its DAG framework cannot avoid; cf. JobControl
  * chaining, reference src/mapred/org/apache/hadoop/mapred/jobcontrol/).
  */
object Bfs {

  /** @param edges  two BIGINT columns `u`, `v`; treated as undirected.
    * @return `part_id`, `hops` for every vertex within `maxHops` of `src`.
    */
  def hopsFrom(edges: DataFrame, src: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // symmetrize once; cached — every round probes this same build side
    val e = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var dist = Seq((src, 0)).toDF("part_id", "hops")
    var frontier = dist
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      val next = frontier.join(e, col("part_id") === col("u"))
        .select(col("v").as("part_id"), lit(h).as("hops"))
      dist = Materialize(
        dist.union(next).groupBy("part_id").agg(min("hops").as("hops")))
      frontier = dist.where(col("hops") === h)
    }
    e.unpersist()
    dist
  }
}
