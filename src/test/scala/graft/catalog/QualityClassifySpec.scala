package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.PortableHash

/** Pins `quality_classify`: the map-only higher-order-function scoring
  * path must agree with an independent explode + weight-table join
  * evaluation of the same model, and the plan must stay shuffle-free up
  * to the final rollup.
  */
class QualityClassifySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("HOF scoring equals the explode + bucket-table evaluation") {
    val got = TextAnalysis.qualityClassify(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

    // independent path: explode tokens, compute bucket weights as columns,
    // aggregate per doc then per source
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode_outer(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
          .as("t"))
      .withColumn("w",
        when(col("t").isNull, 0L).otherwise(
          (PortableHash.h48(
            (PortableHash.h48(col("t")) % 4096).cast("string"), 7) % 2001) - 1000))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum("w").as("score"))
    val expected = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum("score").as("total_score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

    assert(got == expected)
  }

  test("weights stay inside [-1000, 1000] and the model is seed-stable") {
    val ws = (0 until 4096).map { b =>
      graft.operators.CmsSketch.h48(7, b.toString) % 2001 - 1000
    }
    assert(ws.forall(w => w >= -1000 && w <= 1000))
    // not degenerate: both signs appear with reasonable mass
    assert(ws.count(_ > 0) > 1000 && ws.count(_ < 0) > 1000)
  }
}
