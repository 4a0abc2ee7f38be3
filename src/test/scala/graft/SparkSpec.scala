package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared one-per-JVM test session (local[4], same config as production
  * entry points via [[GraftSession]]).
  */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
}

trait SparkSpec extends AnyFunSuite {
  // val, not def: `import spark.implicits._` needs a stable identifier
  val spark: SparkSession = TestSession.spark
}
