package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.PortableHash
import graft.operators.MinHashLsh

/** incremental_dedup: the delta-vs-stored-corpus serving path must agree
  * with a brute-force exact computation of the same contract — precision
  * 1.0 (every reported match IS a ≥-threshold near-dup with the exact
  * integer Jaccard), recall bounded by LSH banding (never more matches
  * than brute force), one output row per delta doc — and the stored-band
  * probe must actually push the band_key In filter into the parquet scan
  * (the row-group-pruning contract the store's layout exists for).
  */
class IncrementalDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val n = LlmPipeline.ShingleN

  /** Brute-force exact (delta doc → corpus doc → jm) for ALL pairs sharing
    * ≥1 shingle — a superset of any banded candidate set.
    */
  private def brute(): Map[(Long, Long), Long] = {
    val hd = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
      PortableHash.h48(col("doc_id").cast("string")).as("h"))
    val deltaIds = hd.orderBy(col("h"), col("doc_id"))
      .limit(Composites.IncDeltaDocs).select(col("doc_id"))
    val dEx = MinHashLsh.explodeShingles(
      hd.join(broadcast(deltaIds), "doc_id"), "doc_id", "text", n)
    val cEx = MinHashLsh.explodeShingles(
      hd.join(broadcast(deltaIds), Seq("doc_id"), "left_anti"),
      "doc_id", "text", n)
    val dn = dEx.groupBy(col("id")).agg(count(lit(1)).as("na"))
    val cn = cEx.groupBy(col("id")).agg(count(lit(1)).as("nb"))
    dEx.select(col("id").as("a"), col("shingle"))
      .join(cEx.select(col("id").as("b"), col("shingle")), "shingle")
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .join(dn.select(col("id").as("a"), col("na")), "a")
      .join(cn.select(col("id").as("b"), col("nb")), "b")
      .selectExpr("a", "b", "(1000000L * shared) div (na + nb - shared) AS jm")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("incremental_dedup: exact verification, bounded recall, total delta readout") {
    val out = Composites.incrementalDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === Composites.IncDeltaDocs)
    assert(out.map(_._1).distinct.length === out.length, "one row per delta doc")
    val exact = brute()
    val thresh = math.round(LlmPipeline.JaccardThreshold * 1000000L)
    val exactMatches = exact.filter(_._2 >= thresh)
    for ((id, nm, best, jm) <- out) {
      if (nm == 0L) assert(best === -1L && jm === 0L)
      else {
        // precision 1.0: the reported best IS an exact >=-threshold match,
        // with the exact integer Jaccard
        assert(exactMatches.get((id, best)).contains(jm),
          s"doc $id best=$best jm=$jm not confirmed by brute force")
        // recall bounded by banding: never MORE matches than brute force
        assert(nm <= exactMatches.count(_._1._1 == id).toLong)
      }
    }
    // the synthetic corpus contains near-dup clusters — the query must
    // actually find some, or the spec is vacuous
    assert(out.exists(_._2 > 0L), "no delta doc matched — vacuous corpus?")
  }

  test("incremental_dedup: both stored-artifact probes are In-pruned") {
    // the candidate probe is materialized (checkpoint truncates it out of
    // the final plan), so its band_key pushdown is attested through the
    // PlanTrace side channel — the iterative-operator convention
    val traceDir = java.nio.file.Files
      .createTempDirectory("graft-incdedup-plans-").toString
    spark.conf.set(graft.core.PlanTrace.DirKey, traceDir)
    try {
      val df = Composites.incrementalDedup(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      // round-13: the verification leg must be probe-sized too — the
      // candidate b-ids push In(id) into the id-sorted sets artifact
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [In(id"),
        "stored-sets scan is not pruned by the candidate ids")
      val probe = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$traceDir/incremental_dedup_candprobe.txt"))
      assert(probe.contains("PushedFilters: [In(band_key"),
        "stored-band scan is not pruned by the delta's band keys")
    } finally spark.conf.unset(graft.core.PlanTrace.DirKey)
  }
}
