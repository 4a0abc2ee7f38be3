package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC scan/sink against embedded Derby (reference:
  * mapred/lib/db/DBInputFormat.java:87-115 — per-split
  * `SELECT … ORDER BY … LIMIT len OFFSET start` paging — and
  * DBOutputFormat.java:109-158 — batched INSERTs on commit).
  *
  * Spark's JDBC source gives the same partitioned-read contract through
  * (partitionColumn, lowerBound, upperBound, numPartitions): each executor
  * issues a bounded-range query, the planner's analog of the reference's
  * count-then-page split planning. Writes batch inserts per partition like
  * DBOutputFormat's commit path.
  *
  * Derby runs embedded (same JVM) — right for local[n] and tests; on a
  * real cluster the url switches to a client-server database and nothing
  * else changes. Derby's engine is singleton-per-JVM, which is exactly the
  * local case.
  */
object JdbcIO {

  private def url(dbPath: String) = s"jdbc:derby:$dbPath;create=true"

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  /** Keep Derby's derby.log inside the scratch tree. */
  def init(scratchRoot: String): Unit = {
    if (sys.props.get("derby.stream.error.file").isEmpty)
      sys.props("derby.stream.error.file") = s"$scratchRoot/derby.log"
  }

  def write(df: DataFrame, dbPath: String, table: String): Unit = {
    init(dbPath)
    df.write.mode("overwrite").jdbc(url(dbPath), table, props)
  }

  /** Whole-table read. */
  def read(spark: SparkSession, dbPath: String, table: String): DataFrame =
    spark.read.jdbc(url(dbPath), table, props)

  /** Partitioned read: numPartitions bounded-range queries on partitionCol
    * (DBInputFormat's split paging).
    */
  def readPartitioned(spark: SparkSession, dbPath: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.jdbc(url(dbPath), table, partitionCol, lower, upper,
      numPartitions, props)
}
