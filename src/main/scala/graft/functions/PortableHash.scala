package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash primitives computable bit-identically in Spark SQL and in the
  * DuckDB oracle dialect, built on md5 (same lowercase-hex output in every
  * engine). Spark's native hash family (murmur3 `hash`, `xxhash64`, `crc32`)
  * is faster but engine-specific, so every operator whose RESULT depends on
  * hash values (MinHash, SimHash, percent-filters, seeded generators) goes
  * through here; operators where hashing only affects placement (shuffle
  * partitioning) keep Spark's native functions.
  *
  * Reference analog: the reference's content hashes are MD5 too
  * (src/core/org/apache/hadoop/io/MD5Hash.java,
  * mapred/SequenceFileInputFilter.java:195 MD5Filter).
  *
  * Each `Column` builder has a paired `*Sql` builder emitting the DuckDB
  * expression for the same value, so query and oracle cannot drift apart.
  */
object PortableHash {

  /** 48-bit non-negative integer hash: first 12 hex chars of md5.
    * 48 bits keeps every derived product/sum well inside the 2^53 double
    * range, so oracle engines that promote integers through doubles stay
    * exact. Computed by the fused codegen expression [[Md5Hash48]]
    * (value-identical to `conv(substring(md5(c), 1, 12), 16, 10)` — the
    * equivalence is property-tested).
    */
  def h48(c: Column): Column = call_function("md5_hash48", c)

  /** Seeded variant: h48 of "seed:value". */
  def h48(c: Column, seed: Int): Column =
    h48(concat_ws(":", lit(seed.toString), c))

  def h48Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 12))::BIGINT"

  def h48Sql(expr: String, seed: Int): String =
    h48Sql(s"'$seed' || ':' || $expr")

  /** Bit b (0-based, b < 48) of a h48 value. */
  def bit(h: Column, b: Int): Column =
    (shiftrightunsigned(h, b) % 2).cast("int")

  def bitSql(hExpr: String, b: Int): String =
    s"(($hExpr // ${1L << b}) % 2)"
}
