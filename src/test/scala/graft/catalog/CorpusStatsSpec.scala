package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for the corpus-statistics ops (the oracle gate attests
  * values; these pin the algebraic properties and the scale-shaped plans).
  */
class CorpusStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("doc_offsets is a correct prefix sum: starts at 0, closes the total") {
    val rows = TextAnalysis.docOffsets(spark, dir)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._3 === 0L, "first doc must start at offset 0")
    rows.sliding(2).foreach { case Array((_, n, off), (_, _, off2)) =>
      assert(off2 === off + n, "each offset = previous offset + its tokens")
    }
    val total = rows.map(_._2).sum
    assert(rows.last._3 + rows.last._2 === total)
  }

  test("doc_offsets plan has no global-order window (range partition + local windows)") {
    val plan = TextAnalysis.docOffsets(spark, dir)
      .queryExecution.executedPlan.toString
    // the per-ROW window must be partitioned by pid — a bare global-order
    // Sort+Window over the full frame would be the single-reducer funnel.
    // (The base-offset side DOES use a global window, by design: it is
    // partition-count-sized, not data-sized.)
    assert(plan.contains("windowspecdefinition(pid"),
      s"per-row running sum is not partitioned by pid:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"base offsets should broadcast back, not shuffle:\n$plan")
  }

  test("chunk_overlap accounting closes: covered = tokens + pad per source") {
    val rows = TextAnalysis.chunkOverlap(spark, dir).collect()
    rows.foreach { r =>
      val (docs, tokens, chunks, pad) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // per-doc: 32 + (n_chunks-1)*24 = n + pad; summed per source:
      assert(32L * docs + (chunks - docs) * 24L === tokens + pad)
      assert(pad >= 0L && pad < 24L * docs, "pad bounded by stride per doc")
    }
  }

  test("ewma_user matches a driver-side replay of the recurrence") {
    val got = Analytics.ewmaUser(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val replay = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").as("tsl"),
        round(col("value") * 100).cast("long").as("cv"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(1)), r.getLong(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        val cvs = rows.sortBy(_._2).map(_._3).take(16)
        u -> ((cvs.length.toLong,
          cvs.foldLeft(-1L)((a, v) => if (a < 0) v else (a * 3 + v) / 4)))
      }
    assert(got === replay)
  }

  test("approx_count_distinct lands within the advertised error band") {
    val df = graft.core.Tables.events(spark, dir)
    val Array(exact, approx) = df
      .agg(countDistinct(col("user_id")).cast("double"),
        approx_count_distinct(col("user_id"), 0.02).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact drifted past 5%")
  }
}
