package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Materialize, PlanTrace}

/** Borůvka minimum spanning forest over a weighted undirected edge frame —
  * the backbone of SINGLE-LINKAGE clustering (cut the k−1 heaviest forest
  * edges and the components ARE the k single-linkage clusters), and the
  * classic "iterative MapReduce" graph algorithm the reference's
  * JobControl chaining would express as one job per round with the full
  * edge set re-read from HDFS every time (cf. reference
  * src/mapred/org/apache/hadoop/mapred/jobcontrol/).
  *
  * Edges are totally ordered by (w, u, v), which makes the forest UNIQUE —
  * the tie-broken order is what an infinitesimal weight perturbation would
  * give, so the cut/cycle properties hold verbatim and any engine
  * computing under the same order must produce the identical edge set
  * (that is what lets a DuckDB replay attest the result).
  *
  * Per round (Borůvka): every current component picks its minimum outgoing
  * edge (one conditional argmin aggregate on the component key — no
  * adjacency list, no per-node sort), the picked edges join the forest,
  * and the components they connect merge. The merge is itself a
  * connected-components run — but over the COMPONENT graph (≤ |comps|/2
  * edges, at least halving every round), delegated to the existing
  * alternating-star [[ConnectedComponents.run]]. Component count at least
  * halves per round, so rounds ≤ log₂ |V|; per-round cost is one edge-set
  * shuffle + the shrinking contraction. Only O(|frontier|)-sized frames
  * are ever materialized; per-round `count()` on the picked-edge frame is
  * the loop condition (the [[Bfs]] precedent), never a data-sized collect.
  */
object Mst {

  /** @param edges three columns `u`, `v`, `w` (BIGINT): one row per
    *              undirected edge, u ≠ v, no duplicates.
    * @param maxRounds backstop on Borůvka rounds (components at least
    *              halve per round, so 16 covers 65 536 components — at
    *              larger scale pass log₂|V|; the fixpoint exit fires
    *              first on every real graph). If the bound is hit while
    *              cross-component edges remain, the run FAILS LOUDLY
    *              rather than silently returning a non-spanning forest.
    * @return the forest's edge frame (`u`, `v`, `w`) — n_nodes − n_comps
    *         rows by the forest property.
    */
  def forest(edges: DataFrame, maxRounds: Int = 16,
             trace: Option[String] = None): DataFrame = {
    val e0 = Materialize(edges.select(col("u"), col("v"), col("w")))
    var comp = Materialize(
      e0.select(explode(array(col("u"), col("v"))).as("id")).distinct()
        .withColumn("label", col("id")))
    var mst = e0.where(lit(false))
    var round = 0
    var selected = 1L
    while (selected > 0 && round < maxRounds) {
      round += 1
      val cu = comp.select(col("id").as("u"), col("label").as("cu"))
      val cv = comp.select(col("id").as("v"), col("label").as("cv"))
      val cross = e0.join(cu, "u").join(cv, "v")
        .where(col("cu") =!= col("cv"))
      // each side's component considers the edge; argmin by (w, u, v) is
      // ONE struct-min partial aggregate per component — the struct's
      // field order IS the tie-broken total order
      val cand = cross.select(col("cu").as("c"), col("w"), col("u"), col("v"))
        .union(cross.select(col("cv").as("c"), col("w"), col("u"), col("v")))
      val sel = Materialize(cand.groupBy(col("c"))
        .agg(min(struct(col("w"), col("u"), col("v"))).as("s"))
        .select(col("s.u").as("u"), col("s.v").as("v"), col("s.w").as("w"))
        .distinct())
      trace.foreach(t => PlanTrace.capture(sel, s"${t}_round$round"))
      selected = sel.count()
      if (selected > 0) {
        mst = Materialize(mst.union(sel))
        // contract: CC over the component graph (nodes = current labels,
        // edges = the picked cross-component edges mapped to labels)
        val cg = sel
          .join(cu, "u").join(cv, "v")
          .select(col("cu").as("src"), col("cv").as("dst"))
        val cc = ConnectedComponents.run(
          comp.select(col("label").as("id")).distinct(), cg)
        comp = Materialize(
          comp.join(cc.withColumnRenamed("id", "label")
              .withColumnRenamed("component", "nl"), "label")
            .select(col("id"), col("nl").as("label")))
      }
    }
    if (selected > 0) {
      // exited on the round bound with the last round still selecting —
      // converged iff no cross-component edge remains; anything else is
      // an incomplete forest and must not be returned silently
      val cu = comp.select(col("id").as("u"), col("label").as("cu"))
      val cv = comp.select(col("id").as("v"), col("label").as("cv"))
      val remaining = e0.join(cu, "u").join(cv, "v")
        .where(col("cu") =!= col("cv")).limit(1).count()
      require(remaining == 0L,
        s"Mst.forest did not converge within maxRounds=$maxRounds " +
          "(cross-component edges remain); raise maxRounds to log2(|V|)")
    }
    mst
  }
}
