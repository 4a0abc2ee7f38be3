package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's text row-transform mappers, as codegen-friendly column
  * expressions (no UDFs — everything stays inside whole-stage codegen).
  */
object TextMappers {

  /** Whitespace tokenization, dropping empty tokens — StringTokenizer
    * semantics (reference: examples/WordCount.java:25-33,
    * mapred/lib/TokenCountMapper.java:41). One definition engine-wide:
    * delegates to [[graft.functions.TextFns.tokens]].
    */
  def tokens(text: Column): Column = graft.functions.TextFns.tokens(text)

  /** WordCount: tokenize → per-token count. Partial aggregation (the
    * reference's combiner, mapred/MapTask.java:1271) happens automatically
    * in the partial HashAggregate before the shuffle.
    */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** RegexMapper: emit one row per regex match, then count per match
    * (reference: mapred/lib/RegexMapper.java:46-55).
    */
  def regexMatchCount(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("m"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("cnt"))

  /** Grep: regex match-count, then a global descending sort by count — the
    * reference chains TWO MapReduce jobs through a temp dir for this
    * (reference: examples/Grep.java:44-88); here it is one plan, with the
    * global rank assigned scalably by [[TotalOrderSort.rank]] instead of a
    * single-reducer sort.
    */
  def grep(df: DataFrame, textCol: String, pattern: String): DataFrame = {
    val counted = regexMatchCount(df, textCol, pattern)
    TotalOrderSort.rank(counted, Seq(col("cnt").desc, col("m")), rankCol = "rank")
  }
}
