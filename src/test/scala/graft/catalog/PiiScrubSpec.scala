package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Redaction semantics on crafted rows: every planted PII kind is counted
  * and replaced, non-PII text survives untouched, and a doc hitting all
  * three injection gates (doc_id 0: 0 ≡ 0 mod 7, 11, 13) carries all three.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("pii_scrub counts and redacts all injected kinds at sf0.001") {
    val out = TextAnalysis.piiScrub(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 0 trips all three injection gates
    assert(out(0L) == ((1L, 1L, 1L)), s"doc 0 got ${out(0L)}")
    // doc 7 trips only the email gate
    assert(out(7L) == ((1L, 0L, 0L)))
    // doc 1 trips none
    assert(out(1L) == ((0L, 0L, 0L)))
  }

  test("redacted text contains the placeholder, not the PII") {
    val row = Seq((0L, "reach me at bob@corp.example.org or 212-555-0199 from 10.0.0.1 ok"))
      .toDF("doc_id", "text").createOrReplaceTempView("pii_probe")
    val got = spark.sql(
      """SELECT regexp_replace(regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]'),
        |  '\\d{3}-\\d{3}-\\d{4}', '[PHONE]'),
        |  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]') AS c
        |FROM pii_probe""".stripMargin).head().getString(0)
    assert(got == "reach me at [EMAIL] or [PHONE] from [IP] ok", got)
  }
}
