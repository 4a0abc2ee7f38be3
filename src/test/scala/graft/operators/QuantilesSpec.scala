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
}
