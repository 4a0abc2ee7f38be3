package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PrefixRank must be a pure re-implementation of the single-partition
  * global window: same numbers on a frame with heavy ties (37 distinct
  * values over 5 000 rows across 32 range partitions — tie groups
  * straddle would-be partition boundaries unless the range partitioner
  * keeps equal values together, which is exactly the property withRank2
  * leans on).
  */
class PrefixRankSpec extends SparkSpec {

  private lazy val df = spark.range(0, 5000)
    .select((col("id") % 37).as("v"), col("id").as("k"))

  private def same(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("withRowNumber equals row_number() over a global order") {
    same(
      PrefixRank.withRowNumber(df, "rn", col("v"), col("k")),
      df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long")))
  }

  test("withRank2 equals the doubled mid-rank from the global window") {
    same(
      PrefixRank.withRank2(df, "v", "r2"),
      df.withColumn("r2",
        rank().over(Window.orderBy(col("v"))).cast("long") * 2
          + count(lit(1)).over(Window.partitionBy(col("v"))) - 1))
  }

  test("empty input stays empty") {
    assert(PrefixRank.withRowNumber(df.limit(0), "rn", col("v")).isEmpty)
    assert(PrefixRank.withRank2(df.limit(0), "v", "r2").isEmpty)
  }
}
