package graft.catalog

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.operators.StageCommit

/** Pins [[Composites.resumableFunnel]]'s recovery contract: a run killed
  * mid-chain resumes from the committed stage boundaries — committed
  * stages are NOT rebuilt, half-written uncommitted data is trampled,
  * and the resumed readout is identical to a straight-through run.
  */
class ResumableFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

  test("kill-and-resume: committed stages served, junk trampled, result identical") {
    val rootA = Files.createTempDirectory("graft-rf-a").toString
    val rootB = Files.createTempDirectory("graft-rf-b").toString
    val straight = rows(Composites.resumableFunnelAt(spark, dir, rootB))
    // crash once two stages have committed
    val e = intercept[IllegalStateException] {
      Composites.resumableFunnelAt(spark, dir, rootA, crashAfter = 2)
        .collect()
    }
    assert(e.getMessage.contains("injected crash"))
    assert(StageCommit.isCommitted(rootA, "admitted"))
    assert(StageCommit.isCommitted(rootA, "exact_dedup"))
    assert(!StageCommit.isCommitted(rootA, "near_dedup"))
    // plant junk parquet in the UNCOMMITTED stage: a resume that trusted
    // uncommitted bytes would read three bogus rows and corrupt the tail
    spark.range(3).selectExpr("id AS doc_id", "id AS n_tok")
      .write.mode("overwrite")
      .parquet(Paths.get(rootA, "near_dedup", "data").toString)
    val commitTime =
      Files.getLastModifiedTime(Paths.get(rootA, "admitted", "_COMMITTED"))
    val resumed = rows(Composites.resumableFunnelAt(spark, dir, rootA))
    assert(resumed === straight,
      "resumed run must be byte-identical to a straight-through run")
    assert(Files.getLastModifiedTime(
        Paths.get(rootA, "admitted", "_COMMITTED")) == commitTime,
      "a committed stage must not be rebuilt on resume")
    StageCommit.reset(rootA)
    StageCommit.reset(rootB)
  }

  test("overlapping census rows agree with the standalone curation_funnel") {
    val cf = rows(Composites.curationFunnel(spark, dir)).filter(_._1 >= 1)
    val root = Files.createTempDirectory("graft-rf-c").toString
    val rf = rows(Composites.resumableFunnelAt(spark, dir, root))
    assert(rf === cf)
    StageCommit.reset(root)
  }
}
