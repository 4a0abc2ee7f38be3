package graft.operators

import graft.SparkSpec

/** Component labels must equal the min node id reachable through ANY chain
  * of edges — including chains far longer than one propagation hop (the
  * pointer-jumping payoff) and nodes with no edges at all.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(
      nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated nodes resolve to min-id components") {
    val nodes = (1L to 12L)
    // chain 1-2-3-4-5, triangle 6-7-8 (+ redundant 6-8), pair 9-10, isolated 11, 12
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L), (10L, 9L))
    val got = components(nodes, edges)
    assert((1L to 5L).forall(got(_) == 1L))
    assert((6L to 8L).forall(got(_) == 6L))
    assert(got(9L) == 9L && got(10L) == 9L)
    assert(got(11L) == 11L && got(12L) == 12L)
  }

  test("a 64-node chain converges within the iteration cap (O(log d) jumps)") {
    val nodes = (1L to 64L)
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = components(nodes, edges)
    assert(nodes.forall(got(_) == 1L), "long chain must collapse to node 1")
  }

  test("random graphs match a driver-side union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 30
      val nodes = (0L until n.toLong).toSeq
      val edges = Seq.fill(10 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(v =>
        v -> nodes.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
      val got = components(nodes, edges)
      assert(got == want, s"trial $trial: ${edges.toList}")
    }
  }

  test("bridging edge merges two clusters discovered independently") {
    // two dense blobs joined by one bridge — the A~B, B~C transitivity case
    val nodes = Seq(1L, 2L, 3L, 20L, 21L, 22L)
    val edges = Seq((1L, 2L), (2L, 3L), (20L, 21L), (21L, 22L), (3L, 20L))
    val got = components(nodes, edges)
    assert(nodes.forall(got(_) == 1L))
  }

  test("reliable-checkpoint path (spark.graft.checkpointDir) is equivalent") {
    // exercises graft.core.Materialize's executor-loss-safe branch: with a
    // fault-tolerant dir configured, iterative rounds go through
    // checkpoint(eager = true) instead of executor-local blocks
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set(graft.core.Materialize.ConfKey, dir)
    try {
      val nodes = (1L to 10L)
      val edges = (1L until 10L).map(i => (i, i + 1))
      val got = components(nodes, edges)
      assert(nodes.forall(got(_) == 1L))
      // the reliable path actually wrote checkpoint data
      def anyFile(p: java.io.File): Boolean =
        p.isFile || Option(p.listFiles).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        "reliable checkpoint dir stayed empty — local path was used")
    } finally spark.conf.unset(graft.core.Materialize.ConfKey)
  }
}
