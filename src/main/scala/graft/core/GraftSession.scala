package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory: every entry point (Verify, Bench, tests)
  * builds through here so configuration is uniform.
  *
  * Settings are chosen to be correct on a real multi-executor cluster, not
  * just `local[n]`:
  *   - AQE on (runtime coalescing + skew-join splitting) — the Spark-native
  *     replacement for the reference's hand-tuned reduce counts
  *     (reference: mapred/JobConf.java setNumReduceTasks) and its lack of
  *     any skew handling.
  *   - `nanosAsLong`: the corpus' `events.ts` column is parquet
  *     TIMESTAMP(NANOS), which Spark cannot represent natively; we read it
  *     as a nanosecond epoch LongType and do time arithmetic in the engine
  *     (see [[Tables.events]]).
  *   - TIMESTAMP_MICROS parquet output so written results round-trip
  *     losslessly into other engines (no INT96 legacy type).
  */
object GraftSession {
  def builder(cpus: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // engine-native Catalyst extensions (SURVEY §4): three custom codegen
      // Expressions (fused portable hash md5_hash48; integer dot product
      // dot_q; vector quantization quantize_q) plus a SQL registration for
      // Spark's own BloomFilterMightContain probe
      .withExtensions { ext =>
        ext.injectFunction(graft.functions.Md5Hash48.registration)
        ext.injectFunction(graft.functions.BloomProbe.registration)
        ext.injectFunction(graft.functions.DotQ.registration)
        ext.injectFunction(graft.functions.QuantizeQ.registration)
      }
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // push wide literal In filters (up to Bm25Store.MaxPruneTerms) into
      // the parquet reader as exact value sets rather than degrading to a
      // min/max range: the stored-index serving path depends on In
      // row-group pruning over the term-sorted postings artifact
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Session for tests / ad-hoc mains. */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
