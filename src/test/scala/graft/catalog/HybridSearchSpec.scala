package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Bm25, VectorOps}

class HybridSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rrf_fuse: fused scores reproduce from independently-built legs") {
    val (k, mod, c) = (10, 50, 60) // FuseK / QueryMod / RrfC
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") % mod === 0)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(TextFns.tokens(col("text")), 1, 5)))
          .as("term"))
    val sparse = Bm25.topK(docs, queries, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    val emb = Tables.embeddings(spark, dir)
    val dense = VectorOps.bruteForceTopK(emb,
        emb.where(col("vec_id") % mod === 0), "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    val expect = (sparse.keySet ++ dense.keySet).map { key =>
      key -> (sparse.get(key).map(r => 1000000L / (c + r)).getOrElse(0L) +
        dense.get(key).map(r => 1000000L / (c + r)).getOrElse(0L))
    }.toMap

    val got = LlmPipeline.rrfFuse(spark, dir).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= k)
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq === (1 to rows.length),
        s"query $q ranks must be contiguous from 1")
      val scores = byRank.map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q rrf scores must be non-increasing")
      // every emitted row's score matches the hand-fused legs, and no
      // unfused candidate beats the emitted cutoff
      byRank.foreach { r =>
        assert(r.getLong(2) === expect((q, r.getLong(1))))
      }
      val cutoff = scores.last
      val beaten = expect.filter { case ((qq, d), s) =>
        qq == q && s > cutoff && !rows.exists(_.getLong(1) == d)
      }
      assert(beaten.isEmpty, s"query $q: dropped candidates above cutoff $beaten")
    }
  }

  test("rrf_fuse: a doc ranked top in both legs tops the fusion") {
    // structural sanity on the scoring algebra: the maximum possible fused
    // score is 2·⌊10⁶/61⌋ and any single-leg doc caps at ⌊10⁶/61⌋
    val rows = LlmPipeline.rrfFuse(spark, dir).collect()
    val maxScore = rows.map(_.getLong(2)).max
    assert(maxScore <= 2L * (1000000L / 61L))
    assert(rows.map(_.getLong(2)).min >= 1000000L / 70L,
      "every fused row carries at least one leg's worst-rank credit")
  }
}
