package graft

import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/** Benchmark main: times each headline query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json), also written to
  * target/bench.json as a fallback in case stdout is wrapped by a logger.
  *
  * Materialization is a noop-format write, not count(): count() lets
  * Catalyst prune unreferenced expressions, so projection/window-shaped
  * queries (field_selection, secondary_sort) would degrade to parquet
  * count-stars and measure nothing. The noop sink consumes every row and
  * column while writing no bytes.
  *
  * A query that throws is reported with -1.0 and listed in "errors" — a
  * crashing query must be distinguishable from a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest corpus so measured times reflect
    // steady-state execution, not first-query classloading.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // best-of-2 per query: the second run reuses warmed codegen/classloading
    // so reported numbers are steady-state, not JIT noise
    val results = SparkEntry.headlines.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try { val sec = math.min(once(), once()); (name, sec, true) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (name, -1.0, false)
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errors = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/bench.json"), line + "\n")
    } catch { case _: Throwable => () }
    // stop FIRST so no shutdown logging lands after the JSON — the driver
    // reads the tail of stdout and the JSON line must be last
    spark.stop()
    println(line)
  }
}
