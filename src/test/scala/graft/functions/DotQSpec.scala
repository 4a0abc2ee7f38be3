package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotQSpec extends SparkSpec {
  import spark.implicits._

  test("dot_q equals the HOF composition and a driver-side computation") {
    val rnd = new Random(11)
    val rows = Seq.fill(50)(
      (Seq.fill(16)(rnd.nextInt(2000000).toLong - 1000000),
        Seq.fill(16)(rnd.nextInt(2000000).toLong - 1000000)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("dot_q", col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall { case (native, hof) => native == hof })
    val expected = rows.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.map(_._1).toSeq == expected)
  }

  test("dot_q is usable from SQL and stays codegen (no eval fallback error)") {
    val one = spark.sql(
      "SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head().getLong(0)
    assert(one == 4L + 10L + 18L)
  }
}
