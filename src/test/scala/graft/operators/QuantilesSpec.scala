package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins [[Quantiles.binned]]: the error bound (≤ one bin width below the
  * exact order statistic) and the bounded-histogram shape.
  */
class QuantilesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cents = Tables.lineitem(spark, dir)
    .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))

  test("each binned quantile sits within one bin width of the exact order stat") {
    val binW = 100L
    val got = Quantiles.binned(cents, binW, Seq(50, 90, 99))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = cents.count()
    val sorted = cents.orderBy("v").collect().map(_.getLong(0))
    Seq(50, 90, 99).foreach { p =>
      // the spec'd rank: ⌈p·n/100⌉, 1-based — same integer math as the op
      val exact = sorted(((n * p + 99) / 100 - 1).toInt)
      val v = got(p)
      assert(v <= exact && exact < v + binW,
        s"p$p: binned $v must be the bin floor of exact order stat $exact")
    }
  }

  test("quantiles are monotone in pct") {
    val got = Quantiles.binned(cents, 100L, Seq(50, 90, 99))
      .orderBy("pct").collect().map(_.getLong(1))
    assert(got.sorted.sameElements(got))
  }

  test("rejects invalid parameters") {
    intercept[IllegalArgumentException] { Quantiles.binned(cents, 0L, Seq(50)) }
    intercept[IllegalArgumentException] { Quantiles.binned(cents, 10L, Seq(0)) }
  }

  test("grouped variant isolates groups and keeps the per-group rank rule") {
    import spark.implicits._
    // group a: 1..100; group b: 1000·(1..10) — disjoint ranges, so any
    // cross-group bleed moves a quantile by orders of magnitude
    val rows = (1L to 100L).map(v => ("a", v)) ++ (1L to 10L).map(v => ("b", v * 1000))
    val df = rows.toDF("k", "v").repartition(7)
    val got = Quantiles.binnedByKey(df, binWidth = 10L, pcts = Seq(50, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a: rank ⌈50·100/100⌉ = 50 → value 50 lives in bin 5 → edge 50;
    //    rank ⌈99⌉ = 99 → bin 9 → edge 90
    assert(got(("a", 50)) == 50L && got(("a", 99)) == 90L)
    // b: rank ⌈0.5·10⌉ = 5 → 5000 → bin edge 5000; p99 rank 10 → 10000
    assert(got(("b", 50)) == 5000L && got(("b", 99)) == 10000L)
    // per-group answers agree with running the global op on each slice
    Seq("a", "b").foreach { k =>
      val solo = Quantiles.binned(
        df.where(col("k") === k).select(col("v")), 10L, Seq(50, 99))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      Seq(50, 99).foreach(p => assert(got((k, p)) == solo(p), s"$k p$p"))
    }
  }
}
