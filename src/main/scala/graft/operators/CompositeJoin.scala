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
  *
  * Like the reference, the join-type vocabulary is OPEN: the reference
  * lets jobs register new identifiers via `mapred.join.define.<ident>`
  * (reference: mapred/join/CompositeInputFormat.java:96-110 scans the conf
  * and adds each class to the expression parser next to the built-in
  * inner/outer/override, :78-88). Here [[define]] registers a
  * `(sources, key) => DataFrame` under an identifier and [[apply]]
  * dispatches on it; the three built-ins pre-populate the registry. For
  * reduce-style types over same-schema sources (the JoinRecordReader
  * subclassing pattern), [[taggedUnion]] is the building block — it is
  * what `override` itself is built from.
  */
object CompositeJoin {

  /** A composite-join type: combine `sources` equi-keyed on `key`. */
  type JoinDef = (Seq[DataFrame], String) => DataFrame

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, JoinDef]()

  /** Register a user-defined join type (`mapred.join.define.<ident>`).
    * Built-in identifiers can be shadowed, matching the reference parser's
    * last-registration-wins behavior.
    */
  def define(ident: String, join: JoinDef): Unit = registry.put(ident, join)

  /** Dispatch a join expression by identifier: the engine half of
    * `<ident>(src1, src2, ...)`.
    */
  def apply(ident: String, sources: Seq[DataFrame], key: String): DataFrame = {
    val j = registry.get(ident)
    require(j != null,
      s"undefined composite join type '$ident' — register it with " +
        s"CompositeJoin.define (defined: ${definedIdents.mkString(", ")})")
    j(sources, key)
  }

  /** Currently registered identifiers (sorted, for error messages/tests). */
  def definedIdents: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSeq.sorted
  }

  /** Union of same-schema sources with a 0-based `source_idx` column — the
    * per-key stream a reference JoinRecordReader subclass iterates
    * (TupleWritable slot position = source_idx). Group this by the key to
    * express any reduce-style user join type.
    */
  def taggedUnion(sources: Seq[DataFrame]): DataFrame =
    sources.zipWithIndex
      .map { case (df, i) => df.withColumn("source_idx", lit(i)) }
      .reduce(_ unionByName _)

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
    val winner = Window.partitionBy(col(key))
    taggedUnion(sources)
      .withColumn("_max_src", max(col("source_idx")).over(winner))
      .filter(col("source_idx") === col("_max_src"))
      .drop("_max_src")
  }

  // the reference's addDefaults (CompositeInputFormat.java:78-88)
  define("inner", inner)
  define("outer", outer)
  define("override", overrideJoin)
}
