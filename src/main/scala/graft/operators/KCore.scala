package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Materialize

/** Bounded k-core peeling: repeatedly drop vertices of degree < k and the
  * edges that touched them. The graph-cleaning counterpart of the
  * iterative family (CC finds structure, k-core removes weakly-attached
  * noise before it pollutes downstream clustering/propagation). Each
  * round is one degree aggregate + two semi-shaped equi-joins against the
  * (shrinking) survivor set; the edge frame re-materializes per round so
  * lineage — and recovery cost after executor loss — stays flat however
  * many rounds run. Rounds are BOUNDED (not to-fixpoint) so the oracle
  * can replay the identical schedule as chained CTEs — same convention as
  * the integer PageRank rounds.
  */
object KCore {

  /** @param edges columns `u`, `v` (BIGINT); treated as undirected.
    * @return (part_id, degree) of vertices surviving `rounds` peels at
    *         threshold `k`, with their degree in the peeled graph.
    */
  def peel(edges: DataFrame, k: Int, rounds: Int,
           trace: Option[String] = None): DataFrame = {
    var e = Materialize(
      edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v"))))
    for (i <- 1 to rounds) {
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("u").as("kv"))
      val round = e.join(keep, col("u") === col("kv")).select(col("u"), col("v"))
        .join(keep, col("v") === col("kv")).select(col("u"), col("v"))
      e = Materialize(round)
      trace.foreach(t => graft.core.PlanTrace.capture(round, s"${t}_round$i"))
    }
    e.groupBy(col("u").as("part_id")).agg(count(lit(1)).as("degree"))
  }
}
