package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a (src, dst) edge frame —
  * label every node with the smallest node id in its component.
  *
  * The near-dup passes ([[MinHashLsh]], [[SimHash]], [[SetSimJoin]],
  * [[graft.catalog.LlmPipeline.spanDedup]]) emit PAIRS; turning pairs into
  * dedup CLUSTERS (pick one canonical doc per group, drop the rest) is a
  * connected-components problem — A~B and B~C must collapse to one cluster
  * even when A and C were never compared. No reference analog (the
  * reference's dedup surface is wordcount-shaped); the algorithm is the
  * iterated min-label propagation + pointer-jumping family described in
  * Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14).
  *
  * Scale shape: each iteration is (a) one equi-join of edges against the
  * current labels + a min-aggregate (neighbor propagation — partial-agg
  * friendly, shuffles on node id), and (b) one self-join of the label table
  * (pointer jumping: lbl := label(lbl), which halves chain depth so
  * convergence is O(log diameter) iterations, not O(diameter)). Labels only
  * ever decrease, so the changed-row count is monotone and the fixpoint
  * test is exact. Every per-iteration result is re-materialized and its
  * lineage truncated (`localCheckpoint`) — on a multi-node cluster swap in
  * a reliable `checkpoint` dir; the loop itself is driver-orchestrated but
  * every step is a distributed shuffle, never a collect.
  */
object ConnectedComponents {

  /** @param nodes single-column frame of node ids (column `id`)
    * @param edges two-column frame (`src`, `dst`), undirected (one
    *              direction suffices; symmetrized internally)
    * @return frame (`id`, `component`) — component = min node id reachable
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor propagation: lbl(v) := min(lbl(v), min over lbl(u), u~v)
      val nbr = sym
        .join(labels.select(col("id").as("nid"), col("lbl")),
          col("dst") === col("nid"))
        .select(col("src").as("id"), col("lbl"))
      val prop = labels.select(col("id"), col("lbl")).union(nbr)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      // pointer jumping: lbl(v) := min(lbl(v), lbl(lbl(v)))
      val next = prop
        .join(prop.select(col("id").as("jid"), col("lbl").as("jlbl")),
          col("lbl") === col("jid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("jlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.select(col("id"), col("lbl").as("prev")), "id")
        .filter(col("lbl") < col("prev")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("component"))
  }
}
