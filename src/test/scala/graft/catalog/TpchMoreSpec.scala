package graft.catalog

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Value + plan-shape checks for the TpchMore join shapes at sf0.001.
  * Expected values are DuckDB's on the same parquet (the same comparison
  * the driver's t2 gate performs at sf0.01).
  */
class TpchMoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q4: EXISTS compiles to one LEFT SEMI join; counts match oracle") {
    val df = TpchMore.q4OrderPriority(spark, dir)
    assert(plan(df).contains("LeftSemi"), "q4 EXISTS is not a semi join")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "1-URGENT" -> 34L, "2-HIGH" -> 55L, "3-MEDIUM" -> 53L,
      "4-NOT SPECIFIED" -> 44L, "5-LOW" -> 33L))
  }

  test("q14: single-pass conditional aggregate; month filter pushed to scan") {
    val df = TpchMore.q14PromoRevenue(spark, dir)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate filter not pushed:\n$p")
    assert(df.collect().head === Row(16.2791, 69L))
  }

  test("q16: NOT IN is a broadcast anti join; distinct-count matches oracle") {
    val df = TpchMore.q16SupplierCnt(spark, dir)
    assert(plan(df).contains("LeftAnti"), "q16 NOT IN is not an anti join")
    val rows = df.collect()
    assert(rows.length === 30)
    assert(rows.map(_.getLong(3)).sum === 280L)
  }

  test("q19: OR-of-ANDs still pushes the implied per-side filters") {
    val df = TpchMore.q19Disjunctive(spark, dir)
    val p = plan(df)
    // Catalyst derives p_brand IN (12,23,3) / quantity bounds below the join
    assert(p.contains("PushedFilters: ["), s"no pushed filters under q19:\n$p")
    assert(df.collect().head === Row(588689.8051, 11L))
  }

  test("q7: nation-pair volume by year matches oracle") {
    val rows = TpchMore.q7VolumeShipping(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(rows.toSeq === Seq(
      ("NATION_12", "NATION_10", 1996L, 615184.595),
      ("NATION_12", "NATION_10", 1997L, 590588.672)))
  }

  test("q8: market share is a one-pass conditional aggregate over 5 dims") {
    val df = TpchMore.q8MarketShare(spark, dir)
    // one pass: exactly one HashAggregate pair over the fact join tree —
    // no self-join of two filtered aggregates
    assert(!plan(df).toLowerCase.contains("cartesian"))
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.toSeq === Seq((1996L, 36.6554, 17L), (1997L, 21.0907, 29L)))
  }

  test("q10: top-20 returned-item ranking runs as TakeOrdered, not global sort") {
    val df = TpchMore.q10ReturnedItems(spark, dir)
    assert(plan(df).contains("TakeOrderedAndProject"),
      "limit+orderBy did not plan as TakeOrderedAndProject")
    val rows = df.collect()
    assert(rows.length === 20)
    val top = rows.head
    assert(top.getLong(0) === 140L && top.getDouble(3) === 243284.0191)
  }

  test("q13: zero-order customers survive the left outer with count 0") {
    val rows = TpchMore.q13OrderDistribution(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.values.sum === 150L, "every customer appears exactly once")
    assert(rows(1L) === 1L && rows(9L) === 25L && rows(16L) === 1L)
    assert(plan(TpchMore.q13OrderDistribution(spark, dir)).contains("LeftOuter"))
  }

  test("q15: max-revenue supplier via broadcast scalar, equality on rounded") {
    val df = TpchMore.q15TopSupplier(spark, dir)
    assert(plan(df).contains("BroadcastExchange"),
      "q15 max aggregate is not broadcast")
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 9L &&
      rows.head.getDouble(2) === 1419420.6503)
  }

  test("q17: correlated avg is ONE window shuffle over the brand slice") {
    val df = TpchMore.q17SmallQty(spark, dir)
    val p = plan(df)
    assert(p.contains("Window"), "per-part avg did not plan as a window")
    assert(df.collect().head === Row(755155.91, 15L))
  }

  test("q22: scalar subquery broadcasts (never collected); anti join on urgent") {
    val df = TpchMore.q22NoUrgent(spark, dir)
    val p = plan(df)
    assert(p.contains("LeftAnti"), "q22 NOT EXISTS is not an anti join")
    assert(p.contains("BroadcastExchange"), "q22 scalar aggregate is not broadcast")
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 5L)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 38848.49) < 1e-6)
  }

  test("q9: snowflake keeps ONE fact pass; name filter pruned before the join") {
    val df = TpchMore.q9ProfitNation(spark, dir)
    val p = plan(df)
    // part prunes on p_name at ITS scan, not above the fact join
    assert(p.contains("PushedFilters: [IsNotNull(p_name)") ||
      p.contains("Contains(p_name,gear)"), s"p_name filter not pushed:\n$p")
    val rows = df.collect()
    assert(rows.length === 70)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 50489385.22) < 0.05)
  }

  test("q11: relative-share HAVING in exact decimal; total from the part frame") {
    val rows = TpchMore.q11ImportantParts(spark, dir).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(1)).sum === 498960736L)
  }

  test("q12: both priority counts ride one aggregate over one join pass") {
    val got = TpchMore.q12LatePriority(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq(("F", 582L, 890L), ("O", 601L, 886L)))
  }

  test("q21: double-correlate collapses to one per-order aggregate") {
    val df = TpchMore.q21WaitingSupplier(spark, dir)
    // the EXISTS/NOT-EXISTS pair must NOT plan as extra fact self-joins:
    // exactly one scan of lineitem in the whole plan
    val scans = "Scan parquet".r.findAllIn(plan(df)).size
    assert(scans <= 3, s"q21 should scan lineitem once (+orders/supplier), got $scans")
    val rows = df.collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(1)).sum === 109L)
  }
}
