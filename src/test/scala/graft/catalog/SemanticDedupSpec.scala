package graft.catalog

import graft.SparkSpec

/** Greedy keep-first semantics of the within-cluster semantic dedup on
  * crafted vectors: duplicates only ever die to a LOWER id in the SAME
  * cluster; cross-cluster twins both survive (the SemDeDup trade — recall
  * is bounded by clustering quality, candidates by cluster size).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val e1 = Array(1.0f, 0.0f, 0.0f)
  private val e2 = Array(0.0f, 1.0f, 0.0f)

  test("within a cluster, only the smallest id of a duplicate set survives") {
    val emb = Seq(
      (1L, e1), (5L, e1), (9L, e1), // identical triple in cluster 0
      (2L, e2), (7L, e2.map(-_)))   // anti-parallel pair: cos = -1, no dup
      .toDF("vec_id", "embedding")
    val km = Seq(1L -> 0, 5L -> 0, 9L -> 0, 2L -> 1, 7L -> 1)
      .toDF("vec_id", "cluster")
    val kept = LlmPipeline.semanticDedupFrom(emb, km, 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(kept === Map(1L -> 1, 5L -> 0, 9L -> 0, 2L -> 1, 7L -> 1))
  }

  test("identical vectors in different clusters are never compared") {
    val emb = Seq((3L, e1), (4L, e1)).toDF("vec_id", "embedding")
    val km = Seq(3L -> 0, 4L -> 1).toDF("vec_id", "cluster")
    val kept = LlmPipeline.semanticDedupFrom(emb, km, 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(kept === Map(3L -> 1, 4L -> 1))
  }
}
