package graft.catalog

import graft.SparkSpec

/** Pins [[LlmPipeline.pcaPower]]'s fixed-point iteration against a
  * double-precision replay of the same 10 rounds: the Q20 quantization
  * must not bend the direction (cosine ≥ 0.999), and the normalization
  * invariant must hold exactly (max |loading| = 2^20).
  */
class PcaPowerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pca_power: fixed-point direction matches the double replay") {
    val got = LlmPipeline.pcaPower(spark, dir)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(got.size === 64)
    assert(got.values.map(math.abs).max === (1L << 20))

    // double-precision replay from the same gram matrix and start vector
    val d = 64
    val G = Array.ofDim[Double](d, d)
    LlmPipeline.gramMatrix(spark, dir).collect().foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble)
      G(i)(j) = s; G(j)(i) = s
    }
    var v = Array.fill(d)(1.0)
    (1 to 10).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => G(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val fx = (0 until d).map(i => got(i).toDouble / (1L << 20))
    val dot = (0 until d).map(i => fx(i) * v(i)).sum
    val cos = dot / (math.sqrt(fx.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.999, s"cosine $cos between fixed-point and double replay")
  }
}
