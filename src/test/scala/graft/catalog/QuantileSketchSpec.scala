package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The sketch path percentiles_exact's doc promises at 100 TB:
  * `approx_percentile` (Spark's mergeable QuantileSummaries, relative-rank
  * error ≤ 1/accuracy) must land within its guaranteed rank band of the
  * exact rank-based answer the oracle attests. This is the accuracy
  * contract a scale deployment swaps in — verified here against the exact
  * operator rather than an oracle (sketches are engine-specific by
  * nature).
  */
class QuantileSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile stays inside its rank-error band of the exact answer") {
    val acc = 100 // rank error <= n/acc
    val approx = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(0.5, 0.9, 0.99), $acc)").as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val values = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((tpe, sorted) <- values; (q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val n = sorted.length
      val got = approx(tpe)(i)
      val rank = sorted.count(_ <= got) // rank of the sketch's answer
      val target = math.ceil(q * n)
      assert(math.abs(rank - target) <= math.max(1.0, n.toDouble / acc) + 1,
        s"$tpe p$q: sketch answer $got sits at rank $rank, want $target ± ${n / acc}")
    }
  }
}
