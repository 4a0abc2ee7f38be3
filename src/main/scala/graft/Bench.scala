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
  *
  * The "gridmix" object labels the reference benchmark suite's six job
  * shapes (reference: src/benchmarks/gridmix2/.../GridMixRunner.java:105-287)
  * with the catalog query that carries each shape, so the mix subtotal is
  * comparable round-over-round against BASELINE.md's suite definition.
  */
object Bench {

  /** Gridmix2 scenario → the headline query carrying that job shape. */
  private val GridmixScenarios = Seq(
    "streamSort" -> "sort_total_order", // text-stream sort (the terasort shape)
    "javaSort" -> "keyfield_sort",      // java sort with a key-field comparator
    "webdataScan" -> "field_selection", // projection/subset scan
    "combiner" -> "wordcount",          // wordcount with map-side combine
    "monsterQuery" -> "monster_query",  // chained MR pipeline
    "webdataSort" -> "secondary_sort",  // keyed sort of wide records
  )

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
      // attempts timed independently: one success is a valid measurement
      // even if the other attempt throws
      val attempts = Seq.fill(2)(
        try Right(once()) catch { case e: Throwable => Left(e) })
      attempts.collect { case Right(s) => s } match {
        case ok if ok.nonEmpty => (name, ok.min, true)
        case _ =>
          val e = attempts.collectFirst { case Left(t) => t }.get
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (name, -1.0, false)
      }
    }
    val timed = results.map { case (k, v, _) => k -> v }.toMap
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errors = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val gmEntries = GridmixScenarios.map { case (scenario, q) =>
      "\"" + scenario + "\":" + f"${timed.getOrElse(q, -1.0)}%.3f"
    }
    val gmTotal = GridmixScenarios
      .flatMap { case (_, q) => timed.get(q) }.filter(_ >= 0).sum
    val gridmix =
      (gmEntries :+ f""""total":$gmTotal%.3f""").mkString("{", ",", "}")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"gridmix":$gridmix,"errors":$errors,"sf":"$sfDir"}"""
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
