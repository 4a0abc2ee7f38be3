package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank — the canonical iterative-graph job of
  * the reference's era (PageRank-over-MapReduce is the motivating example
  * of the period's literature; each iteration below is exactly the
  * contribute/aggregate round a chained MapReduce runs, minus the
  * per-round HDFS materialization).
  *
  * Determinism contract (same policy as [[KMeans]]): ranks are integers at
  * a fixed per-node scale (initial rank = `Scale`), contributions are
  * `rank div out_degree`, damping is the rational 85/100 applied as
  * `(85·Σ) div 100`, iterations fixed — every engine computes bit-identical
  * ranks, so the DuckDB oracle replays the rounds as chained CTEs.
  * (Classic float PageRank would diverge across engines in the sum order.)
  *
  * Scale shape: degrees are computed once and the (src, dst, deg) edge
  * list materializes once; each iteration is the textbook pair of
  * shuffles — join ranks to edges on src, aggregate contributions on dst —
  * plus a left join back to the node set so isolated nodes keep the
  * teleport base. Ranks materialize per round ([[graft.core.Materialize]]): the
  * CC lesson — stacked unmaterialized rounds re-expand the whole prefix
  * into every branch. int64 headroom: a node overflows only past
  * ~9·10⁶ full-rank in-neighbors (Σ < 2⁶³/Scale); beyond that, lift the
  * rank column to decimal(38,0).
  *
  * No dangling-mass redistribution: callers pass SYMMETRIZED edges (every
  * node with any edge has out-degree ≥ 1), so the only rankless sources
  * are isolated nodes, which correctly sit at the teleport base.
  */
object PageRank {
  val Scale: Long = 1000000000000L
  val DampNum = 85L
  val DampDen = 100L

  /** @param nodes single-column `id` frame (every vertex, isolated or not)
    * @param edges directed (src, dst) — symmetrize before calling for an
    *              undirected graph
    * @return (id, rank) after `iters` rounds, rank at [[Scale]]
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
          trace: Option[String] = None): DataFrame = {
    val base = (DampDen - DampNum) * Scale / DampDen
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = graft.core.Materialize(edges.join(deg, "src"))
    var r = graft.core.Materialize(
      nodes.select(col("id"), lit(Scale).as("rank")))
    for (i <- 0 until iters) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val round = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(base) + expr(s"(coalesce(s, cast(0 as bigint)) * $DampNum) div $DampDen"))
            .as("rank"))
      r = graft.core.Materialize(round)
      trace.foreach(t =>
        graft.core.PlanTrace.capture(round, s"${t}_round${i + 1}"))
    }
    r
  }

  /** Personalized PageRank: teleport mass flows ONLY to the seed set, so
    * ranks measure proximity to the seeds rather than global centrality —
    * the "expand a curated corpus to everything near it" primitive (seed
    * docs are trusted; high-PPR non-seeds are the candidates to pull in).
    * Same determinism contract as [[run]] (integer ranks, rational
    * damping, fixed rounds — oracle replays as chained CTEs); same
    * two-shuffle round shape; the only difference is the per-node
    * teleport base: seeds start at [[Scale]] and keep the base term,
    * non-seeds start (and teleport) at zero.
    *
    * @param seeds single-column `id` frame, a subset of `nodes`
    */
  def personalized(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
                   iters: Int, trace: Option[String] = None): DataFrame = {
    val base = (DampDen - DampNum) * Scale / DampDen
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = graft.core.Materialize(edges.join(deg, "src"))
    val tagged = graft.core.Materialize(
      nodes.join(seeds.select(col("id"), lit(1).as("is_seed")), Seq("id"), "left")
        .select(col("id"), coalesce(col("is_seed"), lit(0)).as("is_seed")))
    var r = graft.core.Materialize(tagged.select(col("id"),
      when(col("is_seed") === 1, lit(Scale)).otherwise(lit(0L)).as("rank")))
    for (i <- 0 until iters) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val round = tagged.join(contrib, tagged("id") === contrib("dst"), "left")
        .select(tagged("id"),
          (when(col("is_seed") === 1, lit(base)).otherwise(lit(0L)) +
            expr(s"(coalesce(s, cast(0 as bigint)) * $DampNum) div $DampDen"))
            .as("rank"))
      r = graft.core.Materialize(round)
      trace.foreach(t =>
        graft.core.PlanTrace.capture(round, s"${t}_round${i + 1}"))
    }
    r
  }
}
