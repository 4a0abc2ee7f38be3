package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Materialize

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline: find the K most
  * frequent adjacent symbol pairs over the corpus, merging each winner
  * into a new symbol before counting the next round.
  *
  * Scale shape: classic BPE trains on WORD TYPES, not the token stream —
  * the only corpus-sized operation is the initial (word, freq) aggregate;
  * every round after that touches a vocabulary-bounded frame (distinct
  * word shapes × their symbol counts), shuffles pair-type counts with
  * map-side combine, and collects exactly ONE argmax row to the driver
  * per round (the k-means-centroid pattern: driver state is the model,
  * never the data).
  *
  * Symbol sequences ride in ONE string column, each symbol wrapped in
  * brackets (`"ab" → "[a][b]"`): adjacent-pair occurrences are then
  * DISJOINT substrings (`"[a][b]"` never shares characters with the next
  * match, unlike space-joined forms), so the standard leftmost
  * non-overlapping `replace` IS greedy left-to-right BPE merging in both
  * engines — the device that lets the DuckDB oracle replay every round
  * bit-identically with plain string functions.
  *
  * Pair COUNTING is position-wise (every adjacent position counts, so
  * "aaa" holds two (a,a) pairs) — the standard formulation; merging is
  * greedy non-overlapping (one merge lands, "aaa" → "aa","a").
  *
  * Reference analog: none — the reference's dictionary-building jobs
  * (aggregatewordcount) stop at unigram counts; this is the iterative
  * completion of that family.
  */
object BpeMerges {

  /** Each symbol of the bracket-string as an array element. */
  private def symbols(s: Column): Column =
    split(regexp_replace(s, "^\\[|\\]$", ""), "\\]\\[")

  /** Adjacent symbol pairs of the bracket-string, position-wise. */
  private def adjacentPairs(s: Column): Column = {
    val arr = symbols(s)
    val n = size(arr)
    zip_with(
      slice(arr, lit(1), n - 1),
      slice(arr, lit(2), n - 1),
      (a, b) => struct(a.as("lft"), b.as("rgt")))
  }

  /** Apply learned merge rules IN ORDER to a word column: bracket-encode,
    * then one greedy leftmost non-overlapping replace per rule — the same
    * device [[learn]] trains with, so encoding a corpus with the learned
    * rules is a pure map-only expression (rules are driver-side literals,
    * the model-as-constants shape).
    */
  def applyMerges(word: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(regexp_replace(word, "(.)", "[$1]")) {
      case (s, (l, r)) => replace(s, lit(s"[$l][$r]"), lit(s"[$l$r]"))
    }

  /** Symbol count of a bracket-string (tokens the encoding produces). */
  def symbolCount(s: Column): Column = size(symbols(s))

  /** Learn `rounds` merge rules from a (word, freq) word-type table.
    * Deterministic tiebreak: count DESC, then (left, right) ascending.
    * Returns (merge_round, lft, rgt, pair_count) — fewer than `rounds`
    * rows when the corpus runs out of repeated pairs.
    */
  def learn(wordFreq: DataFrame, rounds: Int,
            trace: Option[String] = None): DataFrame = {
    require(rounds > 0, s"need at least one round, got $rounds")
    val spark = wordFreq.sparkSession
    import spark.implicits._

    var state = Materialize(wordFreq.select(
      regexp_replace(col("word"), "(.)", "[$1]").as("s"),
      col("freq")))
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val counts = state
        .select(col("freq"), explode(adjacentPairs(col("s"))).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("freq")).as("cnt"))
      trace.foreach(t => graft.core.PlanTrace.capture(counts, s"${t}_round$r"))
      val best = counts
        .orderBy(col("cnt").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, c))
        state = Materialize(state.withColumn("s",
          replace(col("s"), lit(s"[$a][$b]"), lit(s"[$a$b]"))))
      }
    }
    merges.toSeq.toDF("merge_round", "lft", "rgt", "pair_count")
  }

  /** Apply learned merges to one word (driver-side helper for specs):
    * replays the same bracket-string replaces. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var s = word.map(c => s"[$c]").mkString
    merges.foreach { case (a, b) => s = s.replace(s"[$a][$b]", s"[$a$b]") }
    if (s.isEmpty) Seq.empty
    else s.stripPrefix("[").stripSuffix("]").split("\\]\\[").toSeq
  }
}
