package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via the degree-ordered node-iterator
  * (Cohen's MapReduce formulation / Suri-Vassilvitskii): orient each
  * undirected edge from its (degree, id)-smaller endpoint to the larger,
  * build wedges by self-joining the oriented list on the apex, and close
  * them against the oriented edges. Orientation bounds every node's
  * out-degree by O(√m), so the wedge join — the only superlinear step —
  * generates O(m^{3/2}) candidates total regardless of skew: a star hub
  * of degree 10⁶ produces ZERO wedges at its apex (all its edges point
  * in), where the naive neighbor join would explode into 10¹² pairs.
  *
  * The per-node participation counts are a property of the triangle SET,
  * not the enumeration order — so the oracle may (and does) enumerate with
  * plain id ordering and still match row for row.
  */
object TriangleCount {

  /** @param edges undirected edge list, both directions present, distinct,
    *              no self-loops (the [[ConnectedComponents]] input contract)
    * @return (id, n_triangles) for every node in at least one triangle
    */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // orient: keep (a→b) iff (deg_a, a) <lex (deg_b, b) — each undirected
    // edge survives exactly once. The (deg, id) struct key rides along so
    // wedges can order their legs by the SAME total order; then a
    // triangle x<y<z is oriented x→y, x→z, y→z and every wedge closes
    // with ONE equi-join probe (no OR-condition join → no nested loop).
    val dir = edges
      .join(deg.select(col("src"), col("deg").as("da")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("db")), "dst")
      .where(struct(col("da"), col("src")) < struct(col("db"), col("dst")))
      .select(col("src").as("a"), col("dst").as("b"),
        struct(col("db"), col("dst")).as("kb"))
      .transform(graft.core.Materialize(_)) // consumed three times below
    val wedges = dir.as("e1").join(dir.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.kb") < col("e2.kb"))
      .select(col("e1.a").as("u"), col("e1.b").as("v"), col("e2.b").as("w"))
    val tri = wedges.join(dir.select(col("a"), col("b")),
        col("v") === col("a") && col("w") === col("b"))
      .select(col("u"), col("v"), col("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node local clustering coefficient: closed wedges over possible
    * wedges, kept in EXACT integers — (n_triangles, n_wedges =
    * deg·(deg−1)/2, cc_permille = ⌊2000·tri / (deg·(deg−1))⌋) — so the
    * result is bit-identical across engines (no float division). Nodes
    * with degree < 2 have no wedges and are excluded; nodes in no
    * triangle appear with 0 (the left join — a triangle-only frame would
    * silently drop them). Both inputs are node-sized aggregates of the
    * edge list, so the join is broadcast-scale at any corpus size.
    *
    * @param edges the [[perNode]] input contract: both directions present,
    *              distinct, no self-loops
    */
  def clusteringCoeff(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val tri = perNode(edges)
    deg.where(col("deg") >= 2)
      .join(tri, deg("src") === tri("id"), "left")
      .select(
        deg("src").as("doc_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("CAST((deg * (deg - 1)) div 2 AS BIGINT)").as("n_wedges"),
        expr("CAST((2000 * coalesce(n_triangles, 0)) div (deg * (deg - 1)) AS BIGINT)")
          .as("cc_permille"))
  }
}
