package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** N-way equi-joins with the semantics of the reference's `mapred/join`
  * package (CompositeInputFormat expression language).
  *
  * The reference implements these as map-side sort-merge joins over
  * co-partitioned, identically-sorted inputs
  * (reference: mapred/join/CompositeInputFormat.java:115-118 forces one split
  * per co-partition). On Spark the declarative join lets Catalyst pick the
  * physical strategy: broadcast-hash when a side is small, sort-merge
  * otherwise, with AQE switching at runtime — the co-partitioning trick is
  * subsumed by bucketed tables / exchange reuse and needs no custom operator.
  */
object CompositeJoin {

  /** `inner(...)`: emit a combined row iff EVERY source has the key;
    * duplicate keys yield the positional cross-product
    * (reference: mapred/join/InnerJoinRecordReader.java:41-49).
    */
  def inner(sources: Seq[DataFrame], key: String): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "inner"))

  /** `outer(...)`: full-outer combination; sources missing the key
    * contribute null slots, like TupleWritable's per-slot presence bits
    * (reference: mapred/join/OuterJoinRecordReader.java:41-44,
    * TupleWritable.java:58). Spark's USING-join emits the coalesced key so
    * the chain stays associative.
    */
  def outer(sources: Seq[DataFrame], key: String): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "full_outer"))

  /** `override(...)`: per key, keep rows ONLY from the right-most source
    * that contains the key — "last source wins" upsert precedence, with that
    * source's full cardinality and everything else skipped
    * (reference: mapred/join/OverrideRecordReader.java:49-90).
    *
    * All sources must share a schema (the reference constraint: one value
    * type across children). Implemented as union + per-key max-priority
    * filter: one shuffle on the key, no joins. Output gains a `source_idx`
    * column (0-based position in `sources`).
    */
  def overrideJoin(sources: Seq[DataFrame], key: String): DataFrame = {
    val tagged = sources.zipWithIndex
      .map { case (df, i) => df.withColumn("source_idx", lit(i)) }
      .reduce(_ unionByName _)
    val winner = Window.partitionBy(col(key))
    tagged
      .withColumn("_max_src", max(col("source_idx")).over(winner))
      .filter(col("source_idx") === col("_max_src"))
      .drop("_max_src")
  }
}
