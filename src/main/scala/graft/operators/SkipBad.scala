package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator

/** Skip-bad-records (reference: mapred/SkipBadRecords.java:51 +
  * SortedRanges.java — re-run map attempts skipping record ranges that
  * crash user code).
  *
  * Spark needs no attempt/range machinery: the transform wraps each record
  * in try/catch, drops throwers, and counts them in an accumulator (the
  * reference surfaces the same signal via its skipped-records counter).
  * Unlike the reference — which loses up to `maxSkipRecords` innocent
  * neighbors per bad record — this skips exactly the failing records.
  */
object SkipBad {

  /** flatMap that skips records whose function throws, counting skips. */
  def flatMapSkipBad[T, U: org.apache.spark.sql.Encoder](
      ds: Dataset[T], skipped: LongAccumulator)(f: T => IterableOnce[U]): Dataset[U] =
    ds.mapPartitions { it =>
      it.flatMap { t =>
        try f(t).iterator.to(Iterable)
        catch { case _: Exception => skipped.add(1L); Iterable.empty[U] }
      }
    }
}
