package graft.core

import graft.SparkSpec

/** TaskMetricsProbe: the bench's per-attempt cause fields are deltas of
  * listener-accumulated TaskMetrics — pin that a snapshot pair around a
  * real job (a) sees the job's tasks, (b) attributes shuffle bytes to a
  * shuffling job and none to a map-only job, and (c) never goes negative
  * (the subtraction contract `snap_after - snap_before`).
  */
class TaskMetricsProbeSpec extends SparkSpec {

  test("snapshot deltas attribute a job's tasks and shuffle to the window") {
    val probe = new TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)
    try {
      TaskMetricsProbe.drain(spark.sparkContext)
      val s0 = probe.snap()
      // a shuffling job: 2^18 rows through a groupBy
      spark.range(0, 1L << 18, 1, 8)
        .selectExpr("id % 97 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
        .write.format("noop").mode("overwrite").save()
      TaskMetricsProbe.drain(spark.sparkContext)
      val shuffled = probe.snap() - s0
      assert(shuffled.tasks > 0, "no tasks attributed to the window")
      assert(shuffled.shufWriteBytes > 0, "groupBy job wrote no shuffle bytes")
      assert(shuffled.runMs >= 0 && shuffled.gcMs >= 0 &&
        shuffled.spillBytes >= 0)

      val s1 = probe.snap()
      // a map-only job: no exchange anywhere
      spark.range(0, 1L << 16, 1, 8).selectExpr("id + 1 AS x")
        .write.format("noop").mode("overwrite").save()
      TaskMetricsProbe.drain(spark.sparkContext)
      val mapOnly = probe.snap() - s1
      assert(mapOnly.tasks > 0)
      assert(mapOnly.shufWriteBytes === 0,
        "map-only job must not be billed shuffle bytes")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("jvmGcMs is monotone non-negative") {
    val a = TaskMetricsProbe.jvmGcMs
    System.gc()
    val b = TaskMetricsProbe.jvmGcMs
    assert(a >= 0 && b >= a)
  }
}
