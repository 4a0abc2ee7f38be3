package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Algorithms

class KTrussSpec extends SparkSpec {

  import spark.implicits._

  test("peel: 4-truss keeps K4, drops a pendant triangle and a tail edge") {
    // K4 on {0,1,2,3} (every edge in 2 triangles), a triangle {3,4,5}
    // hanging off vertex 3 (its edges in 1 triangle), a bare edge (5,6)
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), // K4
      (3L, 4L), (3L, 5L), (4L, 5L),                               // pendant tri
      (5L, 6L),                                                   // tail
    ).toDF("u", "v")
    val got = KTruss.peel(edges, k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val k4 = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(got.keySet === k4, "only the K4 edges survive a 4-truss")
    assert(got.values.forall(_ === 2L), "each K4 edge sits in 2 triangles")
  }

  test("peel: second round removes support lost to the first peel") {
    // two triangles sharing edge (1,2): {0,1,2} and {1,2,3}, plus a third
    // triangle {3,4,5} connected via edge (3,4)... use a chain where the
    // first peel breaks a triangle and the second must react:
    // K4 on {0,1,2,3} + triangle {2,3,4} → 4-truss: round 1 drops the
    // pendant triangle's edges (support 1); K4 is untouched; round 2
    // re-measures the K4 at support 2 and keeps it — the result is stable
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L),
    ).toDF("u", "v")
    val r1 = KTruss.peel(edges, k = 4, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = KTruss.peel(edges, k = 4, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val k4 = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(r1 === k4)
    assert(r2 === k4, "a 4-truss is a fixpoint for K4")
  }

  test("ktruss_graph: survivors are a subset of kcore survivors' edges") {
    val dir = "/root/testdata/sf0.001"
    val truss = Algorithms.ktrussGraph(spark, dir)
    val n = truss.count()
    assert(n > 0L, "sf0.001 co-purchase graph has triangle-supported edges")
    assert(truss.where(col("support") < 1).count() === 0L)
    // edge-level peel is at least as strict as keeping both endpoints:
    // every surviving edge's endpoints must appear in the peeled frame
    val verts = truss.select(explode(array(col("u"), col("v"))).as("id"))
      .distinct().count()
    assert(verts >= 3L)
  }
}
