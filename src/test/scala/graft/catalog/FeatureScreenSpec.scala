package graft.catalog

import graft.SparkSpec

/** Property pins for the round-9 analytics additions beyond their oracle
  * twins: internal consistency that a hash compare alone would not state.
  */
class FeatureScreenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("woe_iv: woe recomputes exactly from the emitted counts") {
    val rows = Analytics.woeIv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val tg = rows.map(_._2).sum.toDouble
    val tb = rows.map(_._3).sum.toDouble
    rows.foreach { case (_, g, b, woeU, _) =>
      val expect = math.round(1e6 * math.log(
        ((g + 0.5) * (tb + 0.5)) / ((b + 0.5) * (tg + 0.5))))
      assert(woeU === expect, s"woe mismatch for bin with g=$g b=$b")
    }
  }

  test("attribution_markov: removal effects are consistent and bounded") {
    val rows = Analytics.attributionMarkov(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === Set("click", "view", "signup", "error"),
      "every non-conversion channel is scored")
    val bases = rows.map(_._2).toSet
    assert(bases.size === 1, "one shared baseline conversion probability")
    assert(bases.head > 0L && bases.head <= 1000000L)
    rows.foreach { case (c, base, removed, bp) =>
      assert(removed >= 0L && removed <= base,
        s"$c: removing a channel cannot raise conversion")
      assert(bp === (base - removed) * 10000L / base,
        s"$c: removal_bp recomputes from the probability columns")
    }
  }

  test("burstiness: vmr recomputes exactly from the daily count frame") {
    val got = Analytics.burstiness(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.nonEmpty)
    val daily = graft.core.Tables.events(spark, dir)
      .selectExpr("event_type", "ts div 86400000000000 AS day_no")
      .groupBy("event_type", "day_no").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val sxx = xs.map(x => x._2 * x._2).sum
      val vmr = BigInt(1000000) * (BigInt(n) * sxx - BigInt(s) * s) /
        (BigInt(n) * s)
      assert(got(t) === ((n, s, vmr.toLong)), s"burstiness mismatch for $t")
    }
  }
}
