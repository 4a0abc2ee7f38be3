package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Analytics.cusumDrift]] and [[TextAnalysis.zipfFit]] against
  * driver-side brute force at sf0.001.
  */
class DriftFitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cusum_drift: matches brute-force cumulative deviation peaks") {
    val dayUs = 86400L * 1000 * 1000
    val rows = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), col("value"), expr(s"(ts div 1000) div ${dayUs}L"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (t, es) =>
      val daily = es.groupBy(_._3).map { case (d, vs) =>
        d -> vs.map(_._2).sum / vs.size
      }.toSeq.sortBy(_._1)
      val mu = daily.map(_._2).sum / daily.size
      var acc = 0.0
      val cusum = daily.map { case (d, m) => acc += m - mu; (d, acc) }
      val peak = cusum.maxBy { case (d, c) => (math.abs(c), -d) }
      t -> (daily.size.toLong, peak._1, math.abs(peak._2))
    }
    val got = Analytics.cusumDrift(spark, dir).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, day, m) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === day)
      assert(math.abs(r.getDouble(3) - m) < 1e-6)
    }
  }

  test("zipf_fit: matches brute-force least squares; slope is Zipf-negative") {
    val freqs = graft.core.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }.take(500)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log(i + 1.0), math.log(f.toDouble))
    }
    val n = pts.length
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val sxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val syy = pts.map(p => (p._2 - my) * (p._2 - my)).sum
    val slope = sxy / sxx
    val r2 = sxy * sxy / (sxx * syy)
    val row = TextAnalysis.zipfFit(spark, dir).head()
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-6)
    assert(math.abs(row.getDouble(3) - r2) < 1e-6)
    assert(row.getDouble(1) < 0.0, "rank-frequency slope must be negative")
  }
}
