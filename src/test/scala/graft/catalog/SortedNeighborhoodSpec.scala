package graft.catalog

import graft.SparkSpec

class SortedNeighborhoodSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("sorted_neighborhood matches the in-memory windowed-pair spec") {
    val dir = "/root/testdata/sf0.001"
    val got = LlmPipeline.sortedNeighborhood(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute-force replay of the definition: sort by (sig, doc_id), pair
    // ranks at distance 1..8, keep lev(sig) <= 4 — small enough at sf0.001
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "lower(concat_ws(' ', slice(filter(split(coalesce(text, ''), " +
          "'\\\\s+'), t -> t != ''), 1, 12))) AS sig")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, sig) => (sig, id) }
    val want = (for {
      i <- rows.indices
      j <- (i + 1) to math.min(i + 8, rows.length - 1)
      d = lev(rows(i)._2, rows(j)._2) if d <= 4
    } yield (rows(i)._1, rows(j)._1, d.toLong)).toSet

    assert(got === want)
    assert(got.nonEmpty, "sf0.001 corpus has sorted-neighborhood near-dups")
  }
}
