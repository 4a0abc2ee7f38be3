package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** KMV sketch invariants the oracle compare cannot see: merge-order
  * independence (the property that makes the distributed aggregation
  * partitioning-proof) and estimator accuracy against the exact count.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  test("sketch is insertion- and merge-order independent") {
    val agg = KmvSketch.KmvAgg(k)
    val values = Seq.fill(500)(Random.nextLong(1L << 48)).distinct
    val direct = values.foldLeft(agg.zero)(agg.reduce)
    val shuffled = Random.shuffle(values).foldLeft(agg.zero)(agg.reduce)
    // arbitrary 3-way split, merged in a different order
    val parts = values.grouped(values.size / 3 + 1).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.merge(parts.last, parts.init.foldLeft(agg.zero)(agg.merge))
    assert(direct == shuffled)
    assert(agg.finish(merged) == agg.finish(direct))
    assert(direct.size == k && direct == direct.sorted && direct.distinct == direct)
  }

  test("below k distinct values the sketch is the exact distinct set") {
    val agg = KmvSketch.KmvAgg(k)
    val values = Seq.fill(200)(Random.nextLong(40)) // ≤ 40 distinct
    val sk = agg.finish(values.foldLeft(agg.zero)(agg.reduce))
    assert(sk == values.distinct.sorted)
    assert(KmvSketch.estimate(sk, k) == values.distinct.size)
  }

  test("estimate is within bottom-k error bounds on real hash values") {
    // h48 over distinct strings behaves uniformly; k=64 gives a relative
    // standard error of 1/sqrt(k-2) ≈ 12.7% — assert a generous 3σ band
    val n = 20000
    val hashes = spark.range(0, n).select(
      PortableHash.h48(concat(lit("kmv:"), col("id"))).as("hv"))
      .as[Long].collect()
    val agg = KmvSketch.KmvAgg(k)
    val est = KmvSketch.estimate(
      agg.finish(hashes.foldLeft(agg.zero)(agg.reduce)), k)
    val rel = math.abs(est.toDouble - n) / n
    assert(rel < 0.40, s"estimate $est vs exact $n — relative error $rel")
  }

  test("distributed aggregation matches a single-pass local sketch") {
    val agg = KmvSketch.KmvAgg(k)
    val kmv = udaf(agg)
    val df = spark.range(0, 5000).repartition(7)
      .select(PortableHash.h48(concat(lit("d:"), col("id"))).as("hv"))
    val viaSpark = df.agg(kmv(col("hv")).as("sk"))
      .select(explode(col("sk"))).as[Long].collect().toList
    val local = df.as[Long].collect()
      .foldLeft(agg.zero)(agg.reduce)
    assert(viaSpark == local)
  }
}
