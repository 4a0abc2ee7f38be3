package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Dev main: isolated A/B of expression-level rewrites at synthetic
  * volume, where the catalog's own frames are too small to attribute
  * per-row costs (`runMain graft.MicroBench`). Current kernels: the
  * [[graft.functions.QuantizeQ]] native quantizer vs the HOF
  * `transform(v, x -> floor(cast(x as double) * 10^6))` it replaced —
  * same 2²¹×64 float-array projection through the noop sink, warm + min
  * of 3, plus a full equality count so the A/B doubles as a volume-scale
  * equivalence check.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hof = transform(col("v"), x => floor(x.cast("double") * 1000000L).cast("long"))
    val native = call_function("quantize_q", col("v"))
    val df = spark.range(0, 1L << 21, 1, cpus)
      .select(col("id"),
        expr("transform(sequence(1, 64), i -> CAST(sin(id * i) AS FLOAT))").as("v"))
      .persist()
    df.write.format("noop").mode("overwrite").save()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.select(c.as("q")).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val xs = Seq.fill(3)(once())
      println(f"[micro] $label%-20s min=${xs.min}%.3f s  attempts=${
        xs.map(x => f"$x%.3f").mkString(",")}")
    }
    time("hof_transform", hof)
    time("native_quantize_q", native)
    time("hof_transform", hof) // re-run guards against drift during the A/B
    val neq = df.select(native.as("a"), hof.as("b"))
      .where(expr("a <> b OR (a IS NULL) <> (b IS NULL)")).count()
    println(s"[micro] quantize mismatch rows: $neq (expect 0)")
    spark.stop()
  }
}
