package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical multi-output writes:
  *
  *  - [[writeRouted]]: route every record to a file derived from its key —
  *    the reference's MultipleOutputFormat.generateFileNameForKeyValue
  *    (mapred/lib/MultipleOutputFormat.java:51) as a `partitionBy` write:
  *    one pass, one file set per route value, and the layout is readable
  *    back with partition pruning (`WHERE route = …` touches one
  *    directory — the exact property the reference's per-key files gave);
  *  - [[writeNamed]]: named side outputs with their own filters — the
  *    reference's MultipleOutputs (mapred/lib/MultipleOutputs.java:283
  *    addNamedOutput / getCollector): each named output is a filtered
  *    write of the same (cached-once) input.
  *
  * Scale: partitionBy with high-cardinality routes fans out to many small
  * files per task — same hazard as the reference's one-writer-per-key.
  * Mitigation is a `repartition(route)` before the write so each route's
  * rows co-locate into one task (noted, left to callers — it adds a
  * shuffle that low-cardinality routes don't need).
  */
object MultiSink {

  /** Partitioned write routed by `routeCol`; returns the read-back frame
    * (route becomes a partition column).
    */
  def writeRouted(df: DataFrame, routeCol: String, path: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(routeCol).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Named side outputs: each (name → predicate) writes `df.filter(pred)`
    * under `path/name`. The input is cached once so N outputs cost one
    * upstream computation plus N filtered scans of the cache.
    */
  def writeNamed(df: DataFrame, outputs: Map[String, Column],
                 path: String): Map[String, String] = {
    df.cache()
    try {
      outputs.map { case (name, pred) =>
        val out = s"$path/$name"
        df.filter(pred).write.mode("overwrite").parquet(out)
        name -> out
      }
    } finally df.unpersist()
  }
}
