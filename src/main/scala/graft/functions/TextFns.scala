package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the pipeline operators: whitespace
  * tokenization and word n-gram shingling, as pure column expressions
  * (whole-stage-codegen'd; no UDFs), each with its paired DuckDB SQL
  * builder so oracles stay in lockstep.
  *
  * Reference analog: tokenization is the reference's universal map step
  * (mapred/lib/TokenCountMapper.java:41, examples/WordCount.java:25-33);
  * shingling has no reference analog — it underpins the additive
  * dedup/fingerprint operators.
  */
object TextFns {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** DuckDB twin of [[tokens]]. */
  def tokensSql(expr: String): String =
    s"""list_filter(string_split_regex($expr, '\\s+'), x -> x <> '')"""

  /** Distinct word n-gram shingles of a token array; empty when the doc has
    * fewer than n tokens (such docs take no part in shingle-based dedup —
    * mirrored by `len(w) >= n` guards on the oracle side).
    */
  def shingles(toks: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), gram)))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB twin of [[shingles]] over a token-list expression `w`
    * (1-based list indexing there; callers add the `len(w) >= n` guard).
    */
  def shinglesSql(w: String, n: Int): String = {
    val gram = (0 until n).map(j => s"$w[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($w) - ${n - 2}), i -> $gram))"
  }

  /** Word n-grams WITH multiplicity (contrast [[shingles]], which
    * deduplicates for set-similarity) — repetition statistics need every
    * occurrence. Empty when the doc has fewer than n tokens.
    */
  def ngrams(toks: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), gram))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB twin of [[ngrams]]; `range` is empty when len(w) < n, so no
    * guard is needed on the SQL side.
    */
  def ngramsSql(w: String, n: Int): String = {
    val gram = (0 until n).map(j => s"$w[i+$j]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($w) - ${n - 2}), i -> $gram)"
  }
}
