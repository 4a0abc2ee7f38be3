package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bloom contract the oracle cannot check: zero false negatives always,
  * and a sane false-positive rate at the sized capacity
  * (reference: util/bloom/BloomFilter.java — same contract).
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter: no false negatives, bounded false positives") {
    val bf = spark.range(0, 10000).toDF("k").stat
      .bloomFilter("k", expectedNumItems = 10000, fpp = 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val probe = call_function("bloom_might_contain",
      lit(bytes.toByteArray), col("k"))
    val probes = spark.range(0, 20000).toDF("k") // half members, half not
      .select(col("k"), probe.as("hit"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (inSet, outSet) = probes.partition(_._1 < 10000)
    assert(inSet.forall(_._2), "false negative — bloom contract broken")
    val fpRate = outSet.count(_._2).toDouble / outSet.length
    assert(fpRate < 0.05, s"false-positive rate $fpRate above 5% at fpp=0.01")
  }

  test("the native probe expression agrees with the driver-side mightContain") {
    val bf = spark.range(0, 1000).toDF("k").stat
      .bloomFilter("k", expectedNumItems = 1000, fpp = 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val viaExpr = spark.range(0, 2000).toDF("k")
      .select(call_function("bloom_might_contain", lit(bytes.toByteArray), col("k")))
      .collect().map(_.getBoolean(0))
    val direct = (0L until 2000L).map(bf.mightContain)
    assert(viaExpr.toSeq == direct)
  }
}
