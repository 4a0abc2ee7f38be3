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
}
