package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Mst.forest]] (Borůvka) against hand-derived spanning forests and
  * the forest/component algebra on the real co-purchase graph.
  */
class MstSpec extends SparkSpec {

  import spark.implicits._

  private def forestOf(edges: Seq[(Long, Long, Long)]) =
    Mst.forest(edges.toDF("u", "v", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("hand graph: unique-weight MST matches Kruskal by hand") {
    // path 1-2-3-4-5 with two chords; MST = the three light path edges +
    // the forced heavy bridge to 5
    val got = forestOf(Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 5L, 5L),
      (1L, 3L, 4L), (2L, 4L, 7L)))
    assert(got === Set((1L, 2L, 1L), (3L, 4L, 1L), (2L, 3L, 2L), (4L, 5L, 5L)))
  }

  test("all-tied square: the (w, u, v) order decides, cycle edge dropped") {
    // every edge weighs 5; lexicographic order admits (1,2),(1,4),(2,3)
    // and must reject (3,4) — the cycle-closing edge under that order
    val got = forestOf(Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (1L, 4L, 5L)))
    assert(got === Set((1L, 2L, 5L), (1L, 4L, 5L), (2L, 3L, 5L)))
  }

  test("disconnected input yields a forest, one tree per component") {
    val got = forestOf(Seq(
      (1L, 2L, 3L), (2L, 3L, 4L), // component {1,2,3}
      (10L, 11L, 1L)))            // component {10,11}
    assert(got === Set((1L, 2L, 3L), (2L, 3L, 4L), (10L, 11L, 1L)))
  }

  test("distributed contraction path produces the identical forest") {
    // threshold 0 forces every round's contraction through the
    // alternating-star CC loop (the >2^16 branch) — both paths must emit
    // the same unique tie-broken forest
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 5L, 5L),
      (1L, 3L, 4L), (2L, 4L, 7L), (10L, 11L, 1L), (11L, 12L, 9L))
    val viaDriver = Mst.forest(edges.toDF("u", "v", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDistributed =
      Mst.forest(edges.toDF("u", "v", "w"), driverCcThreshold = 0L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDistributed === viaDriver)
    assert(viaDriver === Set((1L, 2L, 1L), (3L, 4L, 1L), (2L, 3L, 2L),
      (4L, 5L, 5L), (10L, 11L, 1L), (11L, 12L, 9L)))
  }

  test("hitting the round bound with edges remaining fails loudly") {
    // two cheap pairs joined by an expensive bridge: round 1 merges the
    // pairs, only round 2 can pick the bridge — maxRounds = 1 must throw
    // rather than silently return a non-spanning forest
    val edges = Seq(
      (1L, 2L, 1L), (3L, 4L, 2L), (2L, 3L, 10L))
      .toDF("u", "v", "w")
    val ex = intercept[IllegalArgumentException] {
      Mst.forest(edges, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // and the same bound is fine when one round suffices
    val one = Mst.forest(Seq((1L, 2L, 7L)).toDF("u", "v", "w"), maxRounds = 1)
      .collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((1L, 2L, 7L)))
  }

  test("mst_forest: component count matches an independent CC run") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.catalog.Algorithms.mstForest(spark, dir).collect().head
    val (nNodes, nEdges, nComp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nComp === nNodes - nEdges, "forest property")
    // independent recount: the alternating-star CC operator over the same
    // support-filtered graph must see exactly as many components
    val edges = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val co = edges.as("a").join(edges.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("c")).where(col("c") >= 2)
      .select(col("src"), col("dst"))
    val nodes = co.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
    val cc = ConnectedComponents.run(nodes, co)
    assert(cc.select(col("component")).distinct().count() === nComp)
    assert(cc.count() === nNodes)
  }
}
