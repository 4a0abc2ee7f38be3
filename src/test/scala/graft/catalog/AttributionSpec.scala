package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.core.Tables

class AttributionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attribution_position: credit conservation against journey census") {
    // independent journey census: assign each non-purchase touch to the next
    // purchase at-or-after it, count journey sizes
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val wFwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val journeys = ev
      .withColumn("conv_id",
        first(when(col("event_type") === "purchase", col("event_id")),
          ignoreNulls = true).over(wFwd))
      .where(col("event_type") =!= "purchase" && col("conv_id").isNotNull)
      .groupBy("user_id", "conv_id").agg(count(lit(1)).as("cnt"))
      .collect().map(_.getLong(2))
    // per-journey assigned weight: 10000 for n≤2, 8000 + (n−2)·(2000 div (n−2))
    val expectTotal = journeys.map { n =>
      if (n <= 2) 10000L else 8000L + (n - 2) * (2000L / (n - 2))
    }.sum

    val got = Analytics.attributionPosition(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getString(0) != "purchase",
      "purchases are conversions, never touches"))
    assert(got.map(_.getLong(2)).sum === expectTotal,
      "total assigned basis points must match the journey census")
    assert(got.map(_.getLong(1)).sum === journeys.sum,
      "every touch in a converting journey is credited exactly once")
    // revenue credit never exceeds full-credit revenue
    val fullCredit = Analytics.attributionLastTouch(spark, dir)
      .agg(sum("revenue_cents")).head().getLong(0) * 10000L
    assert(got.map(_.getLong(3)).sum <= fullCredit)
  }
}
