package graft.operators

import graft.SparkSpec

/** Degree-ordered wedge counting must equal brute-force triangle
  * enumeration — including on graphs with skewed hubs, where the
  * orientation trick is what keeps the wedge set small.
  */
class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val tris = for {
      a <- nodes.toSeq; b <- adj(a) if a < b; c <- adj(b) if b < c
      if adj(a)(c)
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def sym(und: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (und ++ und.map(_.swap)).distinct

  test("clique + dangling star counts exactly") {
    // K4 on 1..4 (4 triangles, 3 per node) + hub 1 fanned to leaves 10..15
    val und = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)) ++
      (10L to 15L).map(l => (1L, l))
    val got = run(sym(und))
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("random graphs match brute force across seeds") {
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val und = Seq.fill(120)((rnd.nextLong(30), rnd.nextLong(30)))
        .filter { case (a, b) => a != b }.distinct
      val e = sym(und)
      assert(run(e) === brute(e), s"seed $seed")
    }
  }

  private def cc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    TriangleCount.clusteringCoeff(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("clustering coefficient: clique is 1000 permille, path is 0") {
    // K4: every node has deg 3, 3 triangles, 3 wedges → cc 1000
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    assert(cc(sym(k4)) ===
      (1L to 4L).map(_ -> ((3L, 3L, 1000L))).toMap)
    // path 1-2-3: node 2 has one open wedge and no triangle → cc 0;
    // degree-1 endpoints are excluded, and the zero-triangle node must
    // appear (the left-join path)
    assert(cc(sym(Seq((1L, 2L), (2L, 3L)))) === Map(2L -> ((0L, 1L, 0L))))
  }

  test("clustering coefficient: half-closed neighborhood truncates down") {
    // node 1 adjacent to 2,3,4; only (2,3) closed → tri 1, wedges 3,
    // cc = ⌊2000·1/(3·2)⌋ = 333
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    val got = cc(sym(und))
    assert(got(1L) === ((1L, 3L, 333L)))
    assert(got(2L) === ((1L, 1L, 1000L)))
    assert(!got.contains(4L)) // degree 1: no wedge, excluded
  }
}
