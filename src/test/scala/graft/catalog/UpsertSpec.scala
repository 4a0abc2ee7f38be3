package graft.catalog

import java.io.File

import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def partFiles(root: String, source: String): Map[String, Long] = {
    val d = new File(s"$root/source=$source")
    if (!d.isDirectory) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("upsert rewrites ONLY the touched partitions") {
    // run once so the seeded table exists, then snapshot, then run again:
    // the second run's merge must leave every untouched partition's files
    // (names AND mtimes) alone while rewriting the touched ones
    IoCatalog.upsertPartitioned(spark, sfDir).collect()
    val root = graft.core.Scratch.dir("upsert_partitioned", sfDir)
    val untouchedBefore = partFiles(root, "src5")
    val touchedBefore = partFiles(root, "src3")
    assert(untouchedBefore.nonEmpty && touchedBefore.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    IoCatalog.upsertPartitioned(spark, sfDir).collect()
    assert(partFiles(root, "src5") === untouchedBefore,
      "untouched partition src5 was rewritten")
    assert(partFiles(root, "src3") !== touchedBefore,
      "touched partition src3 was not rewritten")
  }

  test("merge result: superseded rows gone, inserts present, rest intact") {
    import spark.implicits._
    val out = IoCatalog.upsertPartitioned(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // untouched source: byte-for-byte the base aggregate
    val src5 = base.filter(_._2 == "src5")
    assert(out("src5") === ((src5.length.toLong, src5.map(_._3).sum)))
    // touched source: edits add 1000 per (row-index % 4 == 0) row (the
    // gate is doc_id div 20 — the row index within the source), inserts
    // add rows for row-index % 10 == 0
    val src3 = base.filter(_._2 == "src3")
    val edits = src3.count(d => (d._1 / 20) % 4 == 0)
    val inserts = src3.filter(d => (d._1 / 20) % 10 == 0)
    assert(out("src3") === ((src3.length.toLong + inserts.length,
      src3.map(_._3).sum + 1000L * edits + inserts.map(_._3).sum)))
  }
}
