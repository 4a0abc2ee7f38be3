package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Analytics.rfmSegments]] and [[Analytics.assocRules]] against
  * driver-side brute force at sf0.001.
  */
class SegmentationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rfm_segments: matches brute-force quintile scoring") {
    val pc = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(datediff(max(expr("CAST(o_orderdate AS DATE)")), lit("1992-01-01"))
          .cast("long").as("r"),
        count(lit(1)).as("f"), round(sum(col("o_totalprice")), 2).as("m"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    def qbounds[T](vs: Seq[(T, Long)])(implicit ord: Ordering[T]): Seq[T] = {
      // (value, custkey) sorted; boundary = value at rank ceil(q*n/100)
      val sorted = vs.sortBy(identity)(Ordering.Tuple2(ord, implicitly))
      Seq(20, 40, 60, 80).map(q => sorted((sorted.size * q + 99) / 100 - 1)._1)
    }
    val rb = qbounds(pc.map(x => (x._2, x._1)))
    val fb = qbounds(pc.map(x => (x._3, x._1)))
    val mb = qbounds(pc.map(x => (x._4, x._1)))
    def sc[T](x: T, b: Seq[T])(implicit ord: Ordering[T]): Int =
      1 + b.count(v => ord.gt(x, v))
    val expect = pc.map { case (c, r, f, m) =>
      (c, r, f, m, sc(r, rb) * 100 + sc(f, fb) * 10 + sc(m, mb))
    }.toSet
    val got = Analytics.rfmSegments(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getInt(4))).toSet
    assert(got === expect)
  }

  test("assoc_rules: matches brute-force support/confidence ranking") {
    val po = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = graft.core.Tables.orders(spark, dir).count()
    val byOrder = po.groupBy(_._1).map { case (o, v) => o -> v.map(_._2).toSet }
    val perPart = po.groupBy(_._2).map { case (p, v) => p -> v.size.toLong }
    val pairCounts = byOrder.values.toSeq.flatMap { ps =>
      for (a <- ps.toSeq; b <- ps.toSeq if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 3)
    val expect = pairCounts.toSeq.map { case ((a, b), nab) =>
      val (na, nb) = (perPart(a), perPart(b))
      (a, b, nab, math.round(1000000.0 * nab / nOrders),
        math.round(1000000.0 * nab / na),
        math.round(1000000.0 * ((nab * 1.0) * nOrders) / ((na * 1.0) * nb)))
    }.sortBy { case (a, b, _, _, conf, _) => (-conf, a, b) }.take(25)
    val got = Analytics.assocRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }
}
