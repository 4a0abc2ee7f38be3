package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded key domain in two bounded-memory
  * passes — the scalable replacement for `groupBy(key).count().filter(...)`
  * when the DISTINCT key count (e.g. a web-scale token vocabulary) is
  * itself too large to shuffle comfortably.
  *
  * Pass 1 runs a Misra-Gries summary with `k` counters inside each
  * partition (`mapPartitions`, O(k) state, no shuffle) and emits the
  * surviving keys. Pigeonhole guarantee: an item with global frequency
  * > N/k must exceed nₚ/k in at least one partition, so the union of
  * per-partition survivors is a SUPERSET of every item at relative support
  * ≥ 1/k — candidates are ≤ k·partitions keys regardless of vocabulary
  * size. Pass 2 broadcast-semi-joins the stream against that candidate
  * set and counts exactly; the shuffle now carries at most k·partitions
  * distinct keys instead of the whole vocabulary. Final filter applies the
  * requested relative support θ = 1/supportDenom (requires
  * supportDenom < k so the MG net is strictly finer than the threshold).
  *
  * The result is EXACT and partitioning-independent: MG only generates
  * candidates; counts come from the full second pass.
  *
  * Reference analog: aggregate framework's ValueAggregatorJob computes
  * term frequencies with a full shuffle of every distinct key
  * (reference src/mapred/org/apache/hadoop/mapred/lib/aggregate/
  * ValueAggregatorReducer.java) — no sublinear candidate pruning exists
  * there.
  */
object HeavyHitters {

  /** Misra-Gries survivors for one partition (at most k keys), plus the
    * partition's row count — emitted in-band as one `(null, n)` sentinel
    * row (survivors carry n = -1), so the global N needs no separate scan.
    */
  private def misraGries(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { x =>
      n += 1L
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k) counters(x) = 1L
      else {
        // decrement-all; drop zeros (the classic O(1) amortized step)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - 1L)
        counters.foreach { case (key, c) => if (c == 0L) dead += key }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator.map(_ -> -1L) ++ Iterator((null: String) -> n)
  }

  /** @param words single STRING column `word`
    * @return `word`, `cnt` for every word with cnt·supportDenom ≥ N.
    */
  def frequent(words: DataFrame, supportDenom: Int, k: Int): DataFrame = {
    require(supportDenom < k,
      s"MG net k=$k must be finer than support 1/$supportDenom")
    val spark = words.sparkSession
    import spark.implicits._

    val ws: Dataset[String] = words.select(col("word")).as[String]
    // one candidate pass yields BOTH the survivor superset and N:
    // materialized (≤ (k+1)·partitions rows) so its two consumers don't
    // re-scan the input
    val pass1 = graft.core.Materialize(
      ws.mapPartitions(it => misraGries(it, k)).toDF("word", "n"))
    val candidates = pass1.where(col("n") === -1L).select("word").distinct()
    val total = pass1.where(col("word").isNull)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    words.join(broadcast(candidates), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * supportDenom >= lit(total))
  }

  /** Approximate top-`topK` most frequent keys, the KMV treatment of the
    * classic "top words" query: a bounded Misra-Gries candidate sketch per
    * partition (no shuffle, O(k) state) followed by an exact recount of the
    * ≤ k·partitions survivors — the full-vocabulary
    * `groupBy.count.orderBy.limit` shuffle never happens.
    *
    * Soundness bound (pigeonhole, as in [[frequent]]): every key with
    * global frequency > N/k survives the candidate pass in at least one
    * partition. So as long as the true `topK`-th frequency exceeds N/k —
    * i.e. the MG net (k counters) is strictly finer than the tail rank
    * being asked for — the candidate set CONTAINS the exact top-k, the
    * recount ranks it exactly, and the result is bit-identical to the
    * oracle's full `ORDER BY cnt DESC LIMIT k`: attestable, not just
    * spec-tested. `ApproxTopKSpec` asserts that bound holds on the corpus
    * (and that the output equals the exact plan's). Counts are exact
    * integers from pass 2 — no estimator error to canonicalize.
    *
    * Ordering is total (`cnt` DESC, then `word`) so boundary ties cannot
    * make the limit nondeterministic across engines.
    *
    * Reference analog: grep's two-job top-N (count job + sort job over the
    * FULL vocabulary, reference src/examples/org/apache/hadoop/examples/
    * Grep.java:58-77) — same answer, but its sort stage carries every
    * distinct key.
    */
  def approxTopK(words: DataFrame, topK: Int, k: Int): DataFrame = {
    require(topK < k, s"MG net k=$k must be finer than the requested top-$topK")
    val spark = words.sparkSession
    import spark.implicits._

    val ws: Dataset[String] = words.select(col("word")).as[String]
    val candidates = graft.core.Materialize(
      ws.mapPartitions(it => misraGries(it, k)).toDF("word", "n"))
      .where(col("n") === -1L).select("word").distinct()
    words.join(broadcast(candidates), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(topK)
  }
}
