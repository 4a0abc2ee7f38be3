package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Materialize

/** Bounded k-truss peeling: repeatedly drop edges that sit in fewer than
  * k−2 triangles. The EDGE-level member of the graph-cleaning family —
  * [[KCore]] strips weakly-attached vertices, k-truss strips weakly-
  * supported edges (an edge with no triangle support is a coincidental
  * co-occurrence, not community structure), which is the sharper filter
  * on co-occurrence graphs where hubs keep degree high but triangles
  * honest.
  *
  * Each round enumerates triangles with the SAME degree-ordered
  * node-iterator as [[TriangleCount]] (orientation bounds wedge volume to
  * O(m^{3/2}) regardless of skew — a star hub yields zero wedges at its
  * apex), credits each triangle's three canonical edges, and keeps edges
  * with support ≥ k−2. The support frame re-materializes per round so
  * lineage stays flat; rounds are BOUNDED (not to-fixpoint) so the oracle
  * replays the identical schedule as chained CTEs — the [[KCore]] /
  * PageRank convention. Triangle SUPPORT is a property of the triangle
  * set, not the enumeration order, so the oracle may enumerate by plain
  * id order and still match row for row.
  */
object KTruss {

  /** @param edges canonical undirected edge list: columns `u` < `v`,
    *              distinct, no self-loops
    * @return surviving edges (u, v, support) after `rounds` peels, with
    *         the triangle support measured in the round that admitted them
    */
  def peel(edges: DataFrame, k: Int, rounds: Int,
           trace: Option[String] = None): DataFrame = {
    require(rounds >= 1 && k >= 3)
    var e = edges.select(col("u"), col("v"))
    var sup: DataFrame = null
    for (i <- 1 to rounds) {
      val sym = e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val dir = sym
        .join(deg.select(col("src"), col("deg").as("da")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("db")), "dst")
        .where(struct(col("da"), col("src")) < struct(col("db"), col("dst")))
        .select(col("src").as("a"), col("dst").as("b"),
          struct(col("db"), col("dst")).as("kb"))
        .transform(Materialize(_)) // wedge legs + closure probe all read it
      val wedges = dir.as("e1").join(dir.as("e2"),
          col("e1.a") === col("e2.a") && col("e1.kb") < col("e2.kb"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val tri = wedges.join(dir.select(col("a"), col("b")),
          col("y") === col("a") && col("z") === col("b"))
        .select(col("x"), col("y"), col("z"))
      // credit the triangle's three edges in canonical (min, max) form —
      // the oriented enumeration orders vertices by (deg, id), not id
      val credit = tri.select(explode(array(
          struct(least(col("x"), col("y")).as("u"),
            greatest(col("x"), col("y")).as("v")),
          struct(least(col("x"), col("z")).as("u"),
            greatest(col("x"), col("z")).as("v")),
          struct(least(col("y"), col("z")).as("u"),
            greatest(col("y"), col("z")).as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
      sup = Materialize(credit)
      e = sup.where(col("support") >= k - 2).select(col("u"), col("v"))
      trace.foreach(t => graft.core.PlanTrace.capture(e, s"${t}_round$i"))
    }
    sup.where(col("support") >= k - 2)
      .select(col("u"), col("v"), col("support"))
  }
}
