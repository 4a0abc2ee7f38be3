package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[IoCatalog.schemaMergeRead]] (old shards surface the evolved
  * column as null, nothing dropped) and [[IoCatalog.csvMalformed]]
  * (PERMISSIVE quarantines exactly the malformed lines).
  */
class IoEvolutionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("schema_merge_read: pre-evolution rows group under the null bucket") {
    val docs = graft.core.Tables.documents(spark, dir)
    val nEven = docs.where(col("doc_id") % 2 === 0).count()
    val nTotal = docs.count()
    val rows = IoCatalog.schemaMergeRead(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("<pre-evolution>") === nEven)
    assert(rows.values.sum === nTotal, "merge must drop no rows")
    assert(rows.keySet.size > 1, "evolved rows keep their real lang")
  }

  test("csv_malformed: quarantine count is exactly the injected corruption") {
    val docs = graft.core.Tables.documents(spark, dir)
    val nBad = docs.where(col("doc_id") % 10 === 0).count()
    val r = IoCatalog.csvMalformed(spark, dir).head()
    assert(r.getLong(0) === docs.count(), "PERMISSIVE keeps every row")
    assert(r.getLong(1) === nBad)
    val goodChars = docs.where(col("doc_id") % 10 =!= 0)
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(r.getLong(2) === goodChars)
  }

  test("parquet_bloom_filter: probe pushes In-filter to the scan; values match") {
    val df = IoCatalog.parquetBloomFilter(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(l_partkey"),
      s"partkey IN-probe not pushed to the bloomed scan:\n$plan")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = graft.core.Tables.lineitem(spark, dir)
      .where(col("l_partkey").isin(7L, 77L, 177L))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }
}
