package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[LlmPipeline.containmentPairs]] (brute-force set containment on
  * the sf0.001 corpus) and [[LlmPipeline.rendezvousRoute]] (the HRW
  * minimal-disruption property and placement balance).
  */
class ContainmentRouteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("containment_pairs: matches brute-force shingle containment") {
    val shingleSets = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty).toMap
    val ids = shingleSets.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a != b
      inter = (shingleSets(a) & shingleSets(b)).size
      if inter > 0 && 2 * inter >= shingleSets(a).size
    } yield (a, b, inter.toLong, shingleSets(a).size.toLong)).toSet
    val got = LlmPipeline.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "corpus contains near-duplicates; pairs expected")
  }

  test("containment_pairs: string-key fallback path is identical") {
    // forces the detected-collision fallback (string join keys) and pins
    // it to the hashed-key path's output — the injectivity gate means the
    // two paths must be a pure key relabeling of each other
    val exploded = graft.operators.MinHashLsh.explodeShingles(
      graft.core.Tables.documents(spark, dir), "doc_id", "text", 3)
    def rows(forceString: Boolean) = graft.operators.SetSimJoin
      .containmentPairs(exploded, 0.5, forceStringKeys = forceString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(rows(forceString = true) === rows(forceString = false))
  }

  test("jaccard_pairs: string-key fallback path is identical") {
    val exploded = graft.operators.MinHashLsh.explodeShingles(
      graft.core.Tables.documents(spark, dir), "doc_id", "text", 3)
    def rows(forceString: Boolean) = graft.operators.SetSimJoin
      .jaccardPairs(exploded, 0.5, forceStringKeys = forceString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val hashed = rows(forceString = false)
    assert(rows(forceString = true) === hashed)
    assert(hashed.nonEmpty, "corpus contains near-duplicates; pairs expected")
  }

  test("rendezvous_route: dropping shard 0 relocates exactly its tenants") {
    val rows = LlmPipeline.rendezvousRoute(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (shard, moved) = (r.getInt(1), r.getInt(3))
      assert((moved == 1) === (shard == 0),
        s"doc ${r.getLong(0)}: moved=$moved but shard=$shard — HRW must " +
          "relocate exactly the dropped shard's docs")
    }
  }

  test("rendezvous_route: placement is balanced within 3x of uniform") {
    val counts = LlmPipeline.rendezvousRoute(spark, dir)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 8).toSet, "every shard gets traffic")
    val uniform = 500.0 / 8
    counts.foreach { case (s, n) =>
      assert(n < uniform * 3 && n > uniform / 3, s"shard $s count $n skewed")
    }
  }
}
