package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HllSketch

/** Pins the new cardinality sketches against exact answers computed
  * independently in-session: [[Algorithms.hllDistinct]] must land inside
  * the HLL error envelope for m=64 registers, and [[Algorithms.kmvSetOps]]
  * must bracket the exact union/intersection/Jaccard of the two order-key
  * slices. (Bit-level cross-engine attestation is the oracle's job; these
  * specs assert the ESTIMATORS are accurate, which the oracle — running
  * the same estimator — cannot see.)
  */
class CardinalitySketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("hll_distinct: every group within 3 sigma of exact (sigma=1.04/8)") {
    val exact = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Algorithms.hllDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    val tol = 3.0 * 1.04 / math.sqrt(HllSketch.M.toDouble)
    est.foreach { case (k, e) =>
      val rel = math.abs(e.toDouble - exact(k)) / exact(k)
      assert(rel < tol, s"group $k: est $e vs exact ${exact(k)} (rel $rel)")
    }
  }

  test("hll_distinct: linear-counting branch is exact-ish on tiny groups") {
    // distinct sources per lang in documents are far below 2.5m, forcing
    // the LC branch; with n << m the LC estimate should be within ~20%
    val hv = graft.functions.PortableHash.h48(col("source"))
    val df = graft.core.Tables.documents(spark, dir)
      .select(col("lang"), hv.as("hv"))
    val est = HllSketch.distinctByKey(df, "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(countDistinct(col("source")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(math.abs(e.toDouble - exact(k)) / exact(k) < 0.25,
        s"LC branch $k: est $e vs exact ${exact(k)}")
    }
  }

  test("hll_merge: register-merged ALL equals a direct pass over the union") {
    val merged = Algorithms.hllMerge(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-flag scopes must equal hll_distinct's rows exactly
    val perFlag = Algorithms.hllDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perFlag.foreach { case (k, v) => assert(merged(k) === v, s"scope $k") }
    // ALL must equal the estimate a direct single-scope pass produces
    val hv = graft.functions.PortableHash.h48(col("l_orderkey").cast("string"))
    val direct = HllSketch.distinctByKey(
      graft.core.Tables.lineitem(spark, dir)
        .select(lit("ALL").as("scope"), hv.as("hv")),
      "scope").head().getLong(1)
    assert(merged("ALL") === direct)
  }

  test("kmv_set_ops: estimates bracket the exact set algebra") {
    val li = graft.core.Tables.lineitem(spark, dir)
    def keys(flag: String): Set[Long] = li
      .where(col("l_returnflag") === flag)
      .select(col("l_orderkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val a = keys("A")
    val b = keys("R")
    val exactU = (a ++ b).size.toDouble
    val exactI = (a & b).size.toDouble
    val row = Algorithms.kmvSetOps(spark, dir).head()
    val (estU, estI, jbp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // k=64 bottom-k union estimate: sigma ~ 1/sqrt(k-2) ~ 12.7%
    assert(math.abs(estU - exactU) / exactU < 0.4, s"union $estU vs $exactU")
    assert(math.abs(estI - exactI) / exactI < 0.5, s"inter $estI vs $exactI")
    val exactJbp = 10000.0 * exactI / exactU
    assert(math.abs(jbp - exactJbp) < 2500, s"jaccard $jbp vs $exactJbp")
  }
}
