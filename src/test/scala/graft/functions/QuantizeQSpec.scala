package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QuantizeQ]] — the native scan-side quantizer must be value- and
  * schema-identical to the HOF composition it replaced
  * (`transform(vec, x -> floor(cast(x AS double) * 1000000))`), on both
  * element types and with null elements preserved.
  */
class QuantizeQSpec extends SparkSpec {
  import spark.implicits._

  private def hof(c: org.apache.spark.sql.Column) =
    transform(c, x => floor(x.cast("double") * 1000000L).cast("long"))

  test("equals the HOF composition on random float vectors") {
    val rnd = new Random(7)
    val rows = Seq.fill(100)(Seq.fill(64)(rnd.nextFloat() * 4 - 2))
    val df = rows.toDF("v")
    val got = df.select(call_function("quantize_q", col("v")).as("n"),
        hof(col("v")).as("h"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    assert(got.forall { case (n, h) => n == h })
    // and against a driver-side recomputation of the same math
    val expected = rows.map(_.map(x => math.floor(x.toDouble * 1e6).toLong))
    assert(got.map(_._1.toSeq).toSeq == expected)
  }

  test("double input, negatives floor toward -inf, exact .5 boundaries") {
    val df = Seq(Seq(-1.5e-6, 2.5e-6, -0.9999995, 0.0, 1.0))
      .toDF("v")
    val n = df.select(call_function("quantize_q", col("v")))
      .head().getSeq[Long](0)
    assert(n == Seq(-2L, 2L, -1000000L, 0L, 1000000L))
  }

  test("null elements and null arrays survive like the HOF form") {
    val df = spark.sql(
      "SELECT quantize_q(array(CAST(0.5 AS FLOAT), CAST(NULL AS FLOAT))) AS a, " +
        "quantize_q(CAST(NULL AS ARRAY<FLOAT>)) AS b, " +
        "transform(array(CAST(0.5 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS h")
    val r = df.head()
    assert(r.getSeq[Any](0) == r.getSeq[Any](2)) // (500000, null)
    assert(r.isNullAt(1))
    assert(df.schema("a").dataType == df.schema("h").dataType)
  }

  test("rejects non-float arrays loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT quantize_q(array(1L, 2L))").collect()
    }
    assert(e.getMessage.contains("quantize_q") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
