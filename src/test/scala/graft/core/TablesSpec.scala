package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Tables.events]] normalization contract: `ts` is epoch-NANOS
  * LongType after loading, whatever the parquet encoding was.
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events.ts normalizes to a LongType column") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType.typeName === "long",
      s"ts must be epoch-nanos long, got ${df.schema("ts").dataType}")
  }

  test("events.ts magnitude is epoch-NANOS, not micros/millis/seconds") {
    // 2020-01-01 .. 2040-01-01 as epoch-nanos. An int64 column that
    // actually stored micros (or a conversion that multiplied wrong)
    // lands 1000× outside this band — the unit bug the LongType
    // passthrough in Tables.events cannot itself detect.
    val lo = 1577836800L * 1000000000L
    val hi = 2208988800L * 1000000000L
    val r = Tables.events(spark, dir)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    assert(r.getLong(0) >= lo && r.getLong(1) <= hi,
      s"ts range [${r.getLong(0)}, ${r.getLong(1)}] is not plausibly epoch-nanos")
  }
}
