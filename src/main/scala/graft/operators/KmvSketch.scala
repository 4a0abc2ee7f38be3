package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values, "bottom-k") distinct-count sketch as a typed
  * [[Aggregator]].
  *
  * The buffer is the sorted set of the k smallest DISTINCT hash values seen
  * so far — a bounded semilattice: insertion order and merge order cannot
  * change the result, so partial aggregation (map-side combine) and any
  * shuffle plan produce the identical sketch. The estimator is the classic
  * bottom-k one: with U the hash universe size, the k-th smallest of n
  * uniform draws sits near k/n · U, so n̂ = (k-1) · U / h_(k). When the
  * group has fewer than k distinct values the sketch IS the distinct set
  * and the count is exact.
  *
  * Exact `COUNT(DISTINCT x)` per group shuffles every distinct value to its
  * group's reducer — at 100 TB a hot group drags its whole vocabulary
  * through one task. The sketch bounds per-group shuffle volume at
  * k·partitions values, like [[TopK.TopKAgg]] bounds top-k.
  *
  * Determinism across engines: hashes come from [[graft.functions
  * .PortableHash.h48]] (first 48 bits of md5) and the estimate is integer
  * division, so a SQL oracle computing the same k-th order statistic gets
  * the bit-identical answer — the sketch is attestable, not just
  * spec-tested. (48-bit headroom: (k-1)·2^48 < 2^63 for k ≤ 32767.)
  *
  * Reference analog: the aggregate framework's UniqValueCount caps its
  * exact value set and reports "≥ cap" beyond it
  * (reference src/core/org/apache/hadoop/mapred/lib/aggregate/
  * UniqValueCount.java:61) — it degrades to a lower bound where KMV keeps
  * an unbiased estimate at the same bounded memory.
  */
object KmvSketch {

  /** Universe size for h48 hashes: 2^48. */
  val H48Universe: Long = 1L << 48

  final case class KmvAgg(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {
    require(k >= 2 && k <= 32767, s"k=$k out of (2, 32767]")

    def zero: List[Long] = Nil

    // sorted-ascending distinct insert, truncated at k
    private def insert(buf: List[Long], h: Long): List[Long] = {
      val (lo, hi) = buf.span(_ < h)
      if (hi.nonEmpty && hi.head == h) buf
      else {
        val merged = lo ::: h :: hi
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    }

    def reduce(buf: List[Long], h: Long): List[Long] = insert(buf, h)
    def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Long]): Seq[Long] = buf

    def bufferEncoder: Encoder[List[Long]] = Encoders.kryo[List[Long]]
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Driver-side estimate from a finished sketch (mirrors the SQL the
    * catalog query and its oracle share): exact below k, else
    * (k-1)·U div h_(k).
    */
  def estimate(sketch: Seq[Long], k: Int): Long =
    if (sketch.size < k) sketch.size.toLong
    else (k - 1).toLong * H48Universe / sketch.last
}
