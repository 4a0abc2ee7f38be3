package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic stored per-corpus derived frame — the disk-level analog of
  * [[graft.core.Shared]].memo (which is per-process): a parquet artifact
  * keyed by (name, logic version, corpus fingerprint), built once and
  * served across processes and bench attempts. The generalization of the
  * [[Bm25Store]] prepare/serve split (which keeps its own bespoke layout
  * — term-sorted postings + stats — where this store just persists a
  * frame verbatim), and the same reference idiom: MapFileOutputFormat's
  * build-once-serve-many contract (reference
  * src/mapred/org/apache/hadoop/mapred/MapFileOutputFormat.java:82-100).
  *
  * Staleness is impossible by construction: the corpus fingerprint
  * ([[graft.operators.StageCommit.corpusFingerprint]] — name/size/mtime
  * of the source parquet listing) is part of the path, and `version`
  * must be bumped when the build's SEMANTICS change.
  */
object FrameStore {

  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Read the stored frame, building it first if absent. `writeOptions`
    * reach the parquet writer — e.g. a small `parquet.block.size` when the
    * build is range-sorted on a probe key, so min/max row-group stats give
    * a pushed filter fine-grained pruning (the [[Bm25Store]] postings
    * layout, available to any stored frame).
    */
  def frame(spark: SparkSession, dir: String, name: String, version: Int,
            sourceTable: String,
            writeOptions: Map[String, String] = Map.empty)
           (build: => DataFrame): DataFrame = {
    val root = synchronized {
      val fp = graft.operators.StageCommit.corpusFingerprint(dir, sourceTable)
      val r = Paths.get(graft.core.Scratch.dir(s"$name-v$version", dir), fp)
        .toString
      if (!built.contains(r)) {
        if (!Files.exists(Paths.get(r, "_SUCCESS"))) {
          build.write.mode("overwrite").options(writeOptions).parquet(r)
          // surface the artifact build in the bench's shared_builds, so a
          // first-consumer attempt that paid it is attributed instead of
          // reading as an unexplained max band
          graft.core.Shared.noteBuild(s"store:$name")
        }
        built.add(r)
      }
      r
    }
    spark.read.parquet(root)
  }
}
