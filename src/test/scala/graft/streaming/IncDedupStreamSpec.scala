package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.catalog.Composites

/** incDedupStream: the streaming face of incremental_dedup must be the
  * batch op under a different arrival schedule — the arriving docs split
  * across micro-batches, served against the SAME stored frames, unioned
  * over batches, must equal the batch readout row-for-row (each doc's
  * readout depends only on its own candidates vs the committed corpus, so
  * batch boundaries cannot change it). Plus the foreachBatch idempotence
  * contract: replaying a batch id replaces that partition, never
  * duplicates (the at-least-once → exactly-once device).
  */
class IncDedupStreamSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private val tmp = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
  private def fresh(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-incdedup-$tag-")
    tmp += d
    d.toString
  }
  override def afterAll(): Unit = {
    tmp.foreach { p =>
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
    super.afterAll()
  }

  private def readout(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_matches", "best_match", "best_j_micro")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("streamed micro-batches union to the batch readout") {
    implicit val sqlCtx = spark.sqlContext
    val (deltaDocs, _, _) = Composites.incSplit(spark, dir)
    val docs = deltaDocs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length === Composites.IncDeltaDocs)
    val in = MemoryStream[(Long, String)]
    val out = fresh("out")
    // the stream re-resolves the stored index from the corpus dir per
    // micro-batch (the refreshed-corpus-without-restart contract)
    val q = StreamingOps.incDedupStream(
      in.toDF().toDF("doc_id", "text"), dir, out, fresh("ckpt"))
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = readout(spark.read.parquet(out))
    val batch = readout(Composites.incrementalDedup(spark, dir))
    assert(streamed === batch)
    assert(streamed.exists(_._2 > 0L), "no match found — vacuous corpus?")
    // both micro-batches actually produced output partitions
    assert(spark.read.parquet(out).select("batch_id").distinct().count() === 2L)
  }

  test("replaying a batch id overwrites its own partition — no duplicates") {
    val (deltaDocs, _, _) = Composites.incSplit(spark, dir)
    val (storedBands, storedSets) = Composites.incStoredFrames(spark, dir)
    val batch = deltaDocs.select(col("doc_id"), col("text")).limit(10)
    val out = fresh("replay")
    StreamingOps.incDedupBatch(batch, 7L, storedBands, storedSets, out)
    val once = readout(spark.read.parquet(out))
    StreamingOps.incDedupBatch(batch, 7L, storedBands, storedSets, out)
    val twice = spark.read.parquet(out)
    assert(readout(twice) === once)
    assert(twice.count() === 10L, "replay duplicated rows")
  }
}
