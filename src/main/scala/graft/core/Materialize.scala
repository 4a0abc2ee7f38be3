package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative operators
  * ([[graft.operators.ConnectedComponents]], [[graft.operators.PageRank]],
  * [[graft.operators.KMeans]], [[graft.operators.Bm25]], span-dedup).
  *
  * Default is `localCheckpoint(eager = true)`: blocks cached on executors,
  * no distributed-FS round-trip — the fast choice on `local[n]` and the
  * right one when executor loss is acceptable (a lost block fails the job
  * because lineage was truncated). On a real multi-executor cluster where
  * iterative jobs must survive executor loss, set
  * `spark.graft.checkpointDir` to a fault-tolerant directory (HDFS/object
  * store) and every iterative operator switches to reliable
  * `checkpoint(eager = true)` writes there — same semantics, loss-safe.
  *
  * Reference analog: MapReduce materializes EVERY job boundary to HDFS
  * (reference src/mapred/org/apache/hadoop/mapred/ReduceTask.java — reduce
  * output always lands on the distributed FS), which is what makes chained
  * jobs loss-safe but also what makes them slow; this knob recovers that
  * durability only where an operator actually iterates.
  */
object Materialize {
  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
