package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline-level stage commit — the reference's FileOutputCommitter
  * two-phase idiom (reference
  * src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java: tasks
  * write to a temporary location, the committer promotes output only on
  * job success, so a crashed job leaves no half-written "result" and a
  * restart redoes only uncommitted work) elevated from one job's output
  * to a multi-stage pipeline's stage boundaries.
  *
  * Each stage writes its frame to `<root>/<stage>/data` (parquet) and
  * only THEN drops a `_COMMITTED` marker. A re-run:
  *   - serves a committed stage from its stored frame (no recompute —
  *     the resume path),
  *   - rebuilds an uncommitted stage from scratch (`mode(Overwrite)`
  *     tramples any half-written data — the crash-safety path).
  *
  * The marker is a separate file created AFTER the parquet write
  * completes, so the commit point is atomic at filesystem granularity:
  * there is no state in which a partial write can be mistaken for a
  * result. This is exactly what makes chained MapReduce jobs restartable
  * in the reference (each job boundary is an HDFS materialization +
  * committer promotion), recovered here ONLY at explicit stage
  * boundaries — intra-stage, Spark lineage/AQE keep their pipelined
  * execution, which is the whole point of not materializing every
  * operator the way MR did (SURVEY §4).
  *
  * At 100 TB the stage artifacts are parquet on the job's durable FS —
  * stage commit is how a 10-hour curation funnel survives a driver loss
  * at hour 9 with 9 hours of work intact.
  */
object StageCommit {

  /** Fingerprint of a source table's parquet listing (name, size, mtime):
    * pipelines key their artifact root by this, so a regenerated corpus
    * at the same path can never be served from a stale committed stage.
    * (Shared with [[graft.sources.Bm25Store]]'s artifact keying.)
    */
  def corpusFingerprint(dir: String, table: String): String = {
    val src = Paths.get(dir, table)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def add(p: java.nio.file.Path): Unit =
      entries += s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    if (Files.isDirectory(src)) {
      val s = Files.list(src)
      try s.forEach(p => if (Files.isRegularFile(p)) add(p))
      finally s.close()
    } else if (Files.exists(src)) add(src)
    // an empty listing would make every corpus hash to the same constant —
    // exactly the staleness this fingerprint exists to prevent (round-12
    // advice: Tables passed a bare table name, the listing came back empty,
    // and the widened artifact could have served a stale corpus). A caller
    // fingerprinting a non-existent source is always a bug: fail loud.
    require(entries.nonEmpty,
      s"corpusFingerprint: nothing to fingerprint at $src — " +
        "pass the listing path under dir (e.g. \"documents.parquet\")")
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  private def markerPath(root: String, stage: String) =
    Paths.get(root, stage, "_COMMITTED")

  def isCommitted(root: String, stage: String): Boolean =
    Files.exists(markerPath(root, stage))

  /** Run (or resume) one stage. Returns the stage's frame read back from
    * the stored artifact in both cases, so downstream stages always
    * consume the committed bytes — a resumed run and a fresh run see
    * byte-identical inputs.
    */
  def stage(spark: SparkSession, root: String, name: String)
           (build: => DataFrame): DataFrame = {
    val dataDir = Paths.get(root, name, "data").toString
    if (!isCommitted(root, name)) {
      build.write.mode("overwrite").parquet(dataDir)
      Files.createDirectories(markerPath(root, name).getParent)
      Files.write(markerPath(root, name), Array.emptyByteArray)
      // surface the stage build in the bench's shared_builds (the
      // FrameStore/Bm25Store attribution convention) — the first
      // resumable_funnel attempt PAYS the four stage builds and later
      // attempts serve committed bytes, so without this note the
      // build-vs-resume contrast reads as an unexplained attempt band
      graft.core.Shared.noteBuild(s"stage:$name")
    }
    spark.read.parquet(dataDir)
  }

  /** Drop every stage marker+artifact under `root` (test/reset hook). */
  def reset(root: String): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(Paths.get(root))
  }
}
