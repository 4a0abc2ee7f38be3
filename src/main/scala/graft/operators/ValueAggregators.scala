package graft.operators

import scala.collection.immutable.{TreeMap, TreeSet}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's value-aggregator framework
  * (reference: mapred/lib/aggregate/ValueAggregatorBaseDescriptor.java:40-56)
  * re-expressed for Spark. Six of the eight aggregator types are built-in
  * Catalyst aggregate functions (sum/min/max over longs, doubles, strings);
  * the two with no built-in equivalent are custom `Aggregator[IN,BUF,OUT]`s:
  *
  *  - [[UniqValueCount]] — exact-until-cap distinct count AND distinct set
  *    (reference: lib/aggregate/UniqValueCount.java:28-50, TreeMap-backed);
  *  - [[ValueHistogram]] — per-key frequency table with an exact
  *    min/median/max/avg/stddev-of-frequencies report
  *    (reference: lib/aggregate/ValueHistogram.java:33-120).
  *
  * Scale notes: both are hash-aggregates with map-side partial merge (the
  * reference's combiner, free here). UniqValueCount's buffer is bounded by
  * the cap, so memory per group is O(cap) no matter the data.
  * ValueHistogram's buffer is O(distinct values per key) — exact by
  * contract (the report includes an exact median, which no sketch gives);
  * for unbounded-cardinality keys the engine's `approx_count_distinct` /
  * `percentile_approx` are the documented fallback, not this operator.
  */
object ValueAggregators {

  /** Built-in dispatch table: the six algebraic aggregator types.
    * (reference: LongValueSum.java:28, DoubleValueSum.java:29,
    * LongValueMax/Min.java:28, StringValueMax/Min.java:28)
    */
  val builtins: Map[String, Column => Column] = Map(
    "LongValueSum" -> (c => sum(c.cast("long"))),
    "DoubleValueSum" -> (c => sum(c.cast("double"))),
    "LongValueMax" -> (c => max(c.cast("long"))),
    "LongValueMin" -> (c => min(c.cast("long"))),
    "StringValueMax" -> (c => max(c.cast("string"))),
    "StringValueMin" -> (c => min(c.cast("string"))),
  )

  private val userDefined =
    new java.util.concurrent.ConcurrentHashMap[String, Column => Column]()

  /** Register a user-defined aggregator type — the
    * `UserDefinedValueAggregatorDescriptor` plugin hook (reference:
    * lib/aggregate/UserDefinedValueAggregatorDescriptor.java:37-71 loads a
    * user class by name so jobs can aggregate with types the base
    * descriptor's fixed table doesn't know;
    * ValueAggregatorBaseDescriptor.java:96-120 is that fixed dispatch).
    * Here the "class" is any aggregate Column builder — user `Aggregator`s
    * plug in via `udaf(...)` wrappers just like the builtins.
    */
  def define(tpe: String, agg: Column => Column): Unit =
    userDefined.put(tpe, agg)

  /** The live dispatch table: builtins plus user registrations (which may
    * shadow a builtin, matching plugin-over-default precedence).
    */
  def registered: Map[String, Column => Column] = {
    import scala.jdk.CollectionConverters._
    builtins ++ userDefined.asScala
  }

  final case class UniqOut(uniq_count: Long, items: String)

  /** Exact-until-cap distinct: the buffer keeps the `cap` SMALLEST distinct
    * values (a deterministic subset — keep-smallest is a semilattice, so
    * partial buffers merge to exactly the cap smallest of the union, and
    * `uniq_count = min(true distinct, cap)` exactly, matching the
    * reference's "stop adding past maxNumItems" semantics in a
    * merge-order-independent way).
    */
  final case class UniqValueCount(cap: Int)
      extends Aggregator[String, TreeSet[String], UniqOut] {
    def zero: TreeSet[String] = TreeSet.empty
    def reduce(buf: TreeSet[String], v: String): TreeSet[String] = insert(buf, v)
    def merge(a: TreeSet[String], b: TreeSet[String]): TreeSet[String] =
      b.foldLeft(a)(insert)
    def finish(buf: TreeSet[String]): UniqOut =
      UniqOut(buf.size.toLong, buf.mkString("|"))
    // O(log cap) per record (the List.contains + sorted variant was
    // O(cap²) — fine at cap 10, not at a real cap)
    private def insert(buf: TreeSet[String], v: String): TreeSet[String] = {
      val added = buf + v
      if (added.size > cap) added - added.last else added
    }
    def bufferEncoder: Encoder[TreeSet[String]] = Encoders.kryo[TreeSet[String]]
    def outputEncoder: Encoder[UniqOut] = Encoders.product[UniqOut]
  }

  final case class HistOut(n_distinct: Long, min_freq: Long, median_freq: Double,
                           max_freq: Long, avg_freq: Double, stddev_freq: Double,
                           top_items: String)

  /** Exact per-key value histogram: buffer = value→count map; report =
    * distinct count plus min/median/max/avg/population-stddev of the
    * frequencies and the top-k items by (count desc, value asc) — the
    * reference's report line (ValueHistogram.java:78-120) with the same
    * exact median (mean of the two middles for even cardinality, matching
    * the oracle engine's `median`).
    */
  final case class ValueHistogram(topK: Int = 3)
      extends Aggregator[String, Map[String, Long], HistOut] {
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
      buf.updated(v, buf.getOrElse(v, 0L) + 1L)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
    def finish(buf: Map[String, Long]): HistOut = {
      val freqs = buf.values.toArray.sorted
      val n = freqs.length
      if (n == 0) return HistOut(0L, 0L, 0.0, 0L, 0.0, 0.0, "")
      val median =
        if (n % 2 == 1) freqs(n / 2).toDouble
        else (freqs(n / 2 - 1) + freqs(n / 2)) / 2.0
      // exact integer sums → float tail is order-independent and portable
      // (an engine's streaming stddev (Welford) could differ in the last
      // ULP; n·Σf² − S² is exact, so both sides compute the same double)
      val s = freqs.sum
      val sq = freqs.map(f => f * f).sum
      val mean = s.toDouble / n
      val variance = (n * sq - s * s).toDouble / (n.toDouble * n)
      val top = buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(topK)
        .map { case (v, c) => s"$v:$c" }.mkString("|")
      HistOut(n.toLong, freqs.head, median, freqs.last,
        round6(mean), round6(math.sqrt(variance)), top)
    }
    private def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[HistOut] = Encoders.product[HistOut]
  }
}
