package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Analytics.olsMulti]] against an independent driver-side
  * re-derivation (raw rows → BigInt normal equations → Cramer) on the
  * sf0.001 corpus — the distributed moment aggregation and the closed-form
  * solve must agree exactly, not approximately.
  */
class OlsMultiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ols_multi: equals the brute-force BigInt normal-equation solve") {
    val rows = graft.core.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000 - 19700"),
        expr("((ts div 1000) div 3600000000) % 24"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val s11 = rows.map(r => r._1 * r._1).sum
    val s12 = rows.map(r => r._1 * r._2).sum
    val s22 = rows.map(r => r._2 * r._2).sum
    val sy = rows.map(_._3).sum
    val s1y = rows.map(r => r._1 * r._3).sum
    val s2y = rows.map(r => r._2 * r._3).sum
    val a = Array(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b = Array(sy, s1y, s2y)
    def det3(v: Array[BigInt]): BigInt =
      v(0) * (v(4) * v(8) - v(5) * v(7)) -
        v(1) * (v(3) * v(8) - v(5) * v(6)) +
        v(2) * (v(3) * v(7) - v(4) * v(6))
    val det = det3(a)
    assert(det != BigInt(0), "normal matrix must be invertible on this corpus")
    def coef(k: Int): Long = {
      val ak = a.indices.map(i => if (i % 3 == k) b(i / 3) else a(i)).toArray
      ((BigInt(1000) * det3(ak)) / det).toLong
    }
    val got = Analytics.olsMulti(spark, dir).head()
    assert(got.getLong(0) === rows.length.toLong)
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ===
      ((coef(0), coef(1), coef(2))))
  }

  test("markov_stationary: Q20 vector tracks the double-precision chain") {
    val got = Analytics.markovStationary(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Q20 probability vector: sums to 1.0 up to per-type truncation
    assert(math.abs(got.values.sum - (1L << 20)) <= got.size.toLong)
    // double-precision replay of the same 10 rounds
    val c = Analytics.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2).toDouble))
    val rs = c.groupBy(_._1).map { case (a, es) => a -> es.map(_._3).sum }
    var pi = c.map(_._1).distinct.map(_ -> 1.0).toMap
    (1 to 10).foreach { _ =>
      val w = c.groupBy(_._2).map { case (b, es) =>
        b -> es.map(e => e._3 * pi(e._1) / rs(e._1)).sum
      }
      val s = w.values.sum
      pi = w.map { case (b, v) => b -> v / s }
    }
    pi.foreach { case (t, p) =>
      assert(math.abs(got(t).toDouble / (1L << 20) - p) < 1e-3,
        s"type $t: ${got(t)} vs $p")
    }
  }

  test("anova_groups: equals a brute-force replay over raw rows") {
    val raw = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => r.getString(0) -> BigInt(r.getLong(1)))
    val groups = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = BigInt(groups.size)
    val nT = BigInt(raw.length)
    val mq = (BigInt(1000) * raw.map(_._2).sum) / nT
    var ssb = BigInt(0); var ssw = BigInt(0)
    groups.values.foreach { ys =>
      val n = BigInt(ys.length)
      val mqg = (BigInt(1000) * ys.sum) / n
      ssb += n * (mqg - mq) * (mqg - mq)
      ssw += ys.map(y => (BigInt(1000) * y - mqg) * (BigInt(1000) * y - mqg)).sum
    }
    val got = Analytics.anovaGroups(spark, dir).head()
    assert(got.getLong(0) === raw.length.toLong)
    assert(got.getLong(1) === groups.size.toLong)
    assert(got.getLong(2) === (ssb / 1000000).toLong)
    assert(got.getLong(3) === (ssw / 1000000).toLong)
    assert(got.getLong(4) ===
      ((BigInt(1000) * ssb * (nT - k)) / (ssw * (k - 1))).toLong)
    assert(got.getLong(5) === ((BigInt(10000) * ssb) / (ssb + ssw)).toLong)
  }
}
