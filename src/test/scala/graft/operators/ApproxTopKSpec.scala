package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins [[HeavyHitters.approxTopK]]: the Misra-Gries candidate pass must
  * yield the EXACT top-k (sound on this corpus because the MG net is finer
  * than the requested rank), and the sublinear shape must hold.
  */
class ApproxTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def words = Tables.documents(spark, dir)
    .select(explode(split(lower(col("text")), " ")).as("word"))
    .where(col("word") =!= "")

  test("matches the exact full-shuffle top-k, including order") {
    val got = HeavyHitters.approxTopK(words, topK = 20, k = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
  }

  test("soundness margin: rank-20 frequency clears the N/k pigeonhole bound") {
    // the guarantee "candidates ⊇ exact top-k" needs freq(rank k) > N/k;
    // assert it holds with headroom so corpus drift fails loudly here, not
    // as a silent wrong answer at the gate
    val n = words.count()
    val rank20 = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(20)
      .agg(min("cnt")).head().getLong(0)
    assert(rank20 > n / 1024,
      s"rank-20 cnt $rank20 must exceed N/k = ${n / 1024} for the MG superset bound")
  }

  test("insists the MG net is finer than the requested rank") {
    intercept[IllegalArgumentException] {
      HeavyHitters.approxTopK(words, topK = 64, k = 64)
    }
  }
}
