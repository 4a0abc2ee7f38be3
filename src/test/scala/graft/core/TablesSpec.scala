package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Tables.events]] normalization contract: `ts` is epoch-NANOS
  * LongType after loading, whatever the parquet encoding was.
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events.ts normalizes to a LongType column") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType.typeName === "long",
      s"ts must be epoch-nanos long, got ${df.schema("ts").dataType}")
  }

  test("widen relayout: content-identical to the raw table, clustered on the leading key") {
    // sf0.1 documents is above the widen floor (sf0.01's is not), so
    // Tables.documents serves the relayouted artifact; the raw path must
    // round-trip row-for-row (multiset equality via exceptAll both
    // ways), or the device is corrupting every consumer
    val d01 = "/root/testdata/sf0.1"
    val wide = Tables.documents(spark, d01)
    val raw = spark.read.parquet(s"$d01/documents.parquet")
    assert(wide.count() === raw.count())
    assert(wide.exceptAll(raw).isEmpty && raw.exceptAll(wide).isEmpty,
      "widened table is not content-identical to the source")
    // clustered layout: each output FILE owns a contiguous doc_id range
    // (range-repartition + sortWithinPartitions on the leading key) —
    // the property the key-grouped-consumer fix depends on, and what
    // keeps per-file min/max stats usable for pruning
    val spans = wide
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length > 1, "relayout produced a single file — not widened")
    spans.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"file key ranges overlap: $hiA > $loB — not clustered")
    case _ => ()
    }
  }

  test("widen artifact is keyed by a REAL corpus fingerprint") {
    import graft.operators.StageCommit
    // round-12 advice regression: Tables passed the bare table name as the
    // fingerprint listing path, so every corpus hashed an empty listing to
    // the SAME constant — a regenerated corpus would have served the stale
    // widened copy. Pin the two halves of the fix: distinct corpora get
    // distinct fingerprints, and fingerprinting a non-existent listing is
    // a loud failure instead of a silent constant.
    val a = StageCommit.corpusFingerprint(dir, "documents.parquet")
    val b = StageCommit.corpusFingerprint("/root/testdata/sf0.01",
      "documents.parquet")
    assert(a !== b, "two different corpora produced the same fingerprint")
    intercept[IllegalArgumentException] {
      StageCommit.corpusFingerprint(dir, "documents") // the round-12 bug
    }
  }

  test("events.ts magnitude is epoch-NANOS, not micros/millis/seconds") {
    // 2020-01-01 .. 2040-01-01 as epoch-nanos. An int64 column that
    // actually stored micros (or a conversion that multiplied wrong)
    // lands 1000× outside this band — the unit bug the LongType
    // passthrough in Tables.events cannot itself detect.
    val lo = 1577836800L * 1000000000L
    val hi = 2208988800L * 1000000000L
    val r = Tables.events(spark, dir)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    assert(r.getLong(0) >= lo && r.getLong(1) <= hi,
      s"ts range [${r.getLong(0)}, ${r.getLong(1)}] is not plausibly epoch-nanos")
  }
}
