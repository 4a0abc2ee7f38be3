package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named query over the corpus plus (when the operator
  * is SQL-expressible) an equivalent DuckDB SQL oracle the driver runs for
  * the t2 correctness gate. Column names must match between `fn`'s output
  * and the oracle (the compare sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in the benchmark's headline mix */
    headline: Boolean = true)

trait QueryModule {
  def defs: Seq[QueryDef]
}
