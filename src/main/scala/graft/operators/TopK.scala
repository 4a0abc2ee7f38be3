package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed [[Aggregator]] — the partial-combine
  * answer to "top k rows per key".
  *
  * The window formulation (`row_number() OVER (PARTITION BY key ORDER BY
  * value DESC) <= k`) shuffles EVERY row to its key's reducer and sorts
  * whole groups before discarding all but k — at 100 TB a skewed key drags
  * its entire partition history through one task. This aggregator keeps at
  * most k entries per key per MAP TASK (partial aggregation runs before
  * the exchange), so the shuffle carries ≤ k·partitions rows per key and
  * group size never matters. Entries order by (value DESC, id ASC), so
  * ties break identically in any merge order — the buffer is a bounded
  * semilattice and the result is partitioning-independent.
  *
  * Reference analog: secondary sort + a reducer that emits the first k
  * values of each key group (the reference cannot bound map output —
  * its combiner interface still sees every record;
  * reference src/mapred/org/apache/hadoop/mapred/MapTask.java:1271).
  */
object TopK {

  final case class Entry(price: Double, id: Long)

  final case class TopKAgg(k: Int)
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {

    def zero: List[Entry] = Nil

    // insert preserving (price desc, id asc) order, truncated at k
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      val (hi, lo) = buf.span(b =>
        b.price > e.price || (b.price == e.price && b.id < e.id))
      val merged = hi ::: e :: lo
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }

    def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Entry]): Seq[Entry] = buf

    def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }
}
