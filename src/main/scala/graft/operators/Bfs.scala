package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Materialize, PlanTrace}

/** Bounded-depth breadth-first search: minimum hop distance from a source
  * vertex over an undirected edge set, as iterative DELTA-frontier
  * expansion.
  *
  * Per round: join the (small, materialized) frontier against the cached
  * edge set, collapse path multiplicity with a `distinct` BEFORE anything
  * else sees it — on a dense graph the hop-3 path count is ~100× the
  * vertex count, and collapsing early keeps that explosion inside one
  * map-side partial aggregate — then anti-join against the vertices
  * already reached to extract only the NEWLY discovered ones. Because BFS
  * discovers every vertex first at its minimum depth, tagging the delta
  * with the round number IS the min-aggregate; no re-aggregation of the
  * full distance table ever happens.
  *
  * Scale shape: only the O(|frontier delta|) rows are checkpointed per
  * round ([[Materialize]] — local in tests, reliable dir on a cluster),
  * never the O(|V|) running distance table; the result is the lazy union
  * of the per-round materialized deltas. Edges are symmetrized once,
  * hash-partitioned on the probe key and cached, so no round re-shuffles
  * them — a small frontier side broadcasts under AQE instead.
  *
  * The reference expresses this exact pattern as one MapReduce job PER
  * ROUND with the FULL distance table re-read from and re-written to HDFS
  * each time (the classic "iterative MR" tax its DAG framework cannot
  * avoid; cf. JobControl chaining, reference
  * src/mapred/org/apache/hadoop/mapred/jobcontrol/) — the delta-only
  * checkpoint is precisely what that model cannot express.
  */
object Bfs {

  /** @param edges  two BIGINT columns `u`, `v`; treated as undirected.
    * @param trace  optional query label for per-round plan capture
    *               ([[PlanTrace]]; files `<trace>_round<k>.txt`).
    * @param symmetrized  set when `edges` already holds BOTH directions of
    *               every undirected edge, deduplicated — skips the
    *               internal symmetrize + distinct (one full edge shuffle).
    * @param materialized  set when `edges` is ALREADY block-backed (a
    *               [[graft.core.Shared]] memo / [[Materialize]]d frame):
    *               skips the internal persist, which would copy every edge
    *               block into the cache a second time per traversal — under
    *               a full bench suite's block-manager pressure those
    *               redundant copies evict real working sets and got billed
    *               to this operator (round-9 `graph_diameter` regression).
    * @return `part_id`, `hops` for every vertex within `maxHops` of `src`.
    */
  def hopsFrom(edges: DataFrame, src: Long, maxHops: Int,
               trace: Option[String] = None,
               symmetrized: Boolean = false,
               materialized: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // symmetrize once (unless the caller already did); cached — every
    // round probes this same build side. No pre-partitioning: the
    // frontier side is orders of magnitude smaller, so AQE turns each
    // round's join into a broadcast of the frontier over the cached edge
    // partitions in place. A memoized input is already block-backed —
    // persisting it AGAIN would double the block-cache footprint.
    val sym =
      if (symmetrized) edges.select(col("u"), col("v"))
      else edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct()
    val e = if (materialized) sym else sym.persist(StorageLevel.MEMORY_AND_DISK)

    var frontier = Materialize(Seq((src, 0)).toDF("part_id", "hops"))
    var dist = frontier
    var h = 0
    var frontierSize = 1L
    while (h < maxHops && frontierSize > 0) {
      h += 1
      // neighbors of the frontier, path multiplicity collapsed map-side
      val cand = frontier.join(e, col("part_id") === col("u"))
        .select(col("v").as("part_id"))
        .distinct()
      // delta = candidates not reached in ANY earlier round; first
      // discovery is at minimum depth, so hops := h needs no min()
      val newF = cand.join(dist, Seq("part_id"), "left_anti")
        .select(col("part_id"), lit(h).as("hops"))
      frontier = Materialize(newF)
      trace.foreach(t => PlanTrace.capture(newF, s"${t}_round$h"))
      frontierSize = frontier.count()
      dist = dist.union(frontier)
    }
    if (!materialized) e.unpersist()
    dist
  }
}
