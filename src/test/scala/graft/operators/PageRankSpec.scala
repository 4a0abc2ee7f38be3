package graft.operators

import graft.SparkSpec

/** Integer PageRank must match a driver-side replay of the same integer
  * recurrence exactly — plus the structural sanity facts (hubs outrank
  * leaves, isolated nodes sit at the teleport base).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference replay of the exact integer recurrence. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)],
                     iters: Int): Map[Long, Long] = {
    val base = 15L * PageRank.Scale / 100L
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> PageRank.Scale).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L) * 85L / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, Long] =
    PageRank.run(nodes.toDF("id"), edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star + chain + isolated node matches the driver replay bit for bit") {
    val nodes = 1L to 8L
    // undirected star centered at 1 (1-2,1-3,1-4), chain 5-6-7, isolated 8
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L))
    val edges = und ++ und.map(_.swap)
    val got = run(nodes, edges, 3)
    assert(got === replay(nodes, edges, 3))
    val base = 15L * PageRank.Scale / 100L
    assert(got(8L) === base, "isolated node must sit at the teleport base")
    assert(got(1L) > got(2L), "the star center must outrank its leaves")
    assert(got(6L) > got(5L), "the chain middle must outrank its ends")
  }

  test("random graphs match the driver replay across seeds") {
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val nodes = 0L until 40L
      val und = Seq.fill(60)((rnd.nextLong(40), rnd.nextLong(40)))
        .filter { case (a, b) => a != b }.distinct
      val edges = (und ++ und.map(_.swap)).distinct
      assert(run(nodes, edges, 3) === replay(nodes, edges, 3), s"seed $seed")
    }
  }

  test("personalized: mass flows from the seed; unreachable nodes stay 0") {
    // edge 1↔2, seed {1}, isolated 3 — two rounds by hand at Scale 10¹²:
    // r1 = (base, 0.85·S, 0); r2 = (base + 0.85²·S, 0.85·base, 0)
    val got = PageRank.personalized(
      Seq(1L, 2L, 3L).toDF("id"), Seq(1L).toDF("id"),
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = PageRank.Scale
    val base = 15L * s / 100L
    assert(got === Map(
      1L -> (base + (85L * s / 100L) * 85L / 100L),
      2L -> (base * 85L / 100L),
      3L -> 0L))
  }
}
