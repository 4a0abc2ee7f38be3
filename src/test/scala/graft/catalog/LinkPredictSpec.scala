package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Algorithms.linkPredict]] / [[Algorithms.graphAssortativity]]
  * against independent driver-side brute force over the sf0.001 graph
  * (small enough to enumerate): the distributed wedge join must agree
  * with the textbook Adamic-Adar definition, and corr with a hand Pearson.
  */
class LinkPredictSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the same support-filtered co-purchase graph the operators consume,
  // rebuilt independently (SQL, not the shared frame) and collected
  private def edgeSet(): Set[(Long, Long)] = {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p"), col("b.p")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("link_predict: matches brute-force Adamic-Adar on the sf0.001 graph") {
    val ed = edgeSet()
    val adj = (ed.toSeq ++ ed.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val aam = adj.collect {
      case (w, ns) if ns.size >= 2 && ns.size <= 32 =>
        w -> math.round(1000000.0 / math.log(ns.size.toDouble))
    }
    // brute force: for every non-adjacent pair u<v, sum aam over common
    // neighbors that survive the degree cap
    val nodes = adj.keys.toSeq.sorted
    val expect = (for {
      u <- nodes; v <- nodes if u < v && !adj(u).contains(v)
      common = (adj(u) & adj(v)).filter(aam.contains)
      if common.nonEmpty
    } yield (u, v, common.toSeq.map(aam).sum, common.size.toLong))
      .sortBy { case (u, v, s, _) => (-s, u, v) }
      .take(20)
    val got = Algorithms.linkPredict(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
  }

  test("link_predict: every returned pair is genuinely non-adjacent, cn >= 1") {
    val ed = edgeSet()
    val sym = ed ++ ed.map(e => (e._2, e._1))
    val rows = Algorithms.linkPredict(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(!sym.contains((r.getLong(0), r.getLong(1))),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) is an existing edge")
      assert(r.getLong(3) >= 1)
    }
    assert(rows.map(_.getLong(4)).toSeq === (1L to 20L))
  }

  test("graph_assortativity: matches a driver-side Pearson over the edges") {
    val ed = edgeSet()
    val sym = (ed.toSeq ++ ed.toSeq.map(e => (e._2, e._1)))
    val deg = sym.groupBy(_._1).map { case (k, vs) => k -> vs.size.toDouble }
    val xs = sym.map(e => deg(e._1))
    val ys = sym.map(e => deg(e._2))
    val n = xs.size.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sdx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
    val sdy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
    val expect = cov / (sdx * sdy)
    val row = Algorithms.graphAssortativity(spark, dir).head()
    assert(row.getLong(0) === sym.size.toLong)
    // the query emits round(r, 6), so the unrounded replica can sit up to
    // half a 6-decimal ulp away from the returned value
    assert(math.abs(row.getDouble(1) - expect) < 5.1e-7,
      s"got ${row.getDouble(1)}, expected $expect")
  }
}
