package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Surprisal ordering semantics: a doc of rare tokens scores above a doc of
  * common tokens, and the bit math matches hand-computed floor(log2).
  */
class TokenSurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("rare-token docs out-score common-token docs; bits are exact") {
    // "the" x8 across two docs (common), "rare" x1 — corpus total 9 tokens
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the the the the"),
      (3L, "rare"),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("surprisal").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokenSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // total=9 -> len(bin)=4; tf(the)=8 -> len=4 -> 0 bits; tf(rare)=1 -> 3 bits
    assert(got(1L) == ((4L, 0L, 0L)), s"common doc: ${got(1L)}")
    assert(got(3L) == ((1L, 3L, 3000000L)), s"rare doc: ${got(3L)}")
  }
}
