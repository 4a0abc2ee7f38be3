package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Md5Hash48Spec extends SparkSpec {
  import spark.implicits._

  test("fused expression equals the composed conv(substr(md5)) formula on random strings") {
    val rnd = new Random(99)
    val strs = (1 to 2000).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", " ", "äöü €", "a:b|c", "\t\n")
    val df = strs.toDF("s")
    val mismatches = df.select(
      PortableHash.h48(col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("composed"))
      .where(col("fused") =!= col("composed")).count()
    assert(mismatches == 0L)
  }

  test("expression participates in codegen and respects nulls") {
    val df = Seq(Some("x"), None).toDF("s")
    val got = df.select(PortableHash.h48(col("s")).as("h")).collect()
    assert(got.count(_.isNullAt(0)) == 1)
    val plan = df.select(PortableHash.h48(col("s")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Filter")) // sanity: plan built, no fallback errors
  }
}
