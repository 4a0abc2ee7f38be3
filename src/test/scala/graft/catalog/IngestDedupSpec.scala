package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Verdict semantics on crafted docs: exact beats near, near requires a
  * shared 8-gram with a NON-batch doc, batch-internal duplicates don't
  * count, and clean docs come back unique.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  test("ingest verdicts: exact / near / unique") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      // corpus (doc_id % 10 != 3)
      (1L, s"corpus doc with $span inside it"),
      (2L, "completely different corpus content here"),
      // batch (doc_id % 10 == 3)
      (3L, s"corpus doc with $span inside it"),        // exact copy of 1
      (13L, s"prefix words then $span and a suffix"),  // shares the span
      (23L, "totally novel text nothing shared at all"),
      (33L, "totally novel text nothing shared at all"), // dup of 23 — batch-internal only
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmPipeline.ingestDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got == Map(3L -> "exact", 13L -> "near", 23L -> "unique", 33L -> "unique"),
      s"got $got")
  }
}
