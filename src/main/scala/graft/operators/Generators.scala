package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic distributed data generators + the sort validator — the
  * reference's reproducibility backbone re-expressed on `spark.range`:
  *
  *  - [[teraGen]]: row-id range → (key, filler) records
  *    (reference: examples/terasort/TeraGen.java:186-258 — seeded 100-byte
  *    records from a RangeInputFormat of row ids; our keys derive from md5
  *    of the row id, portable to any oracle engine, rather than the
  *    reference's GF(2) random chain);
  *  - [[randomTextWriter]]: row ids → words drawn from a fixed vocabulary
  *    by hash index (reference: examples/RandomTextWriter.java:97-139);
  *  - [[validateSorted]]: TeraValidate's two checks — global sortedness and
  *    a content checksum (reference: examples/terasort/TeraValidate.java:52-118).
  *
  * Scale: `spark.range(n)` plans one narrow partition per core with no
  * input files (the RangeInputFormat trick); generation is embarrassingly
  * parallel and deterministic per row id, so re-running any partition
  * yields identical bytes (the property the reference gets from seeding
  * per split).
  */
object Generators {

  /** n rows of (id, key: 10 hex chars, value: 78 chars). */
  def teraGen(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id"),
      substring(md5(concat_ws(":", lit("tg"), col("id"))), 1, 10).as("key"),
      substring(concat(
        md5(concat_ws(":", lit("tv0"), col("id"))),
        md5(concat_ws(":", lit("tv1"), col("id"))),
        md5(concat_ws(":", lit("tv2"), col("id")))), 1, 78).as("value"))

  /** Fixed 100-word vocabulary (the reference embeds a 100-word list too). */
  val Vocab: Seq[String] = (0 until 100).map(i => f"w$i%03d")

  /** nRows rows × wordsPerRow words, word = Vocab[h48("rtw:row:i") % 100]. */
  def randomTextWriter(spark: SparkSession, nRows: Long, wordsPerRow: Int): DataFrame = {
    val vocabCol = array(Vocab.map(lit): _*)
    spark.range(nRows)
      .select(col("id"), explode(sequence(lit(0), lit(wordsPerRow - 1))).as("i"))
      .select(col("id"),
        element_at(vocabCol,
          (PortableHash.h48(concat_ws(":", lit("rtw"), col("id"), col("i"))) % 100)
            .cast("int") + 1).as("word"))
  }

  /** TeraValidate over a ranked frame (global rank `rn`, key column):
    * misorders counted via an equi-join of each row with rank rn+1 (scales
    * as a hash join — no single-partition window), plus a portable content
    * checksum. Returns one row (n_rows, misorders, key_checksum).
    */
  def validateSorted(ranked: DataFrame, keyCol: String, rnCol: String): DataFrame = {
    val a = ranked.select(col(rnCol).as("rn_a"), col(keyCol).as("key_a"))
    val b = ranked.select((col(rnCol) - 1).as("rn_a"), col(keyCol).as("key_b"))
    val misorders = a.join(b, "rn_a").where(col("key_a") > col("key_b"))
      .agg(count(lit(1)).as("misorders"))
    val stats = ranked.agg(
      count(lit(1)).as("n_rows"),
      sum(PortableHash.h48(col(keyCol))).as("key_checksum"))
    stats.crossJoin(misorders)
      .select(col("n_rows"), col("misorders"), col("key_checksum"))
  }
}
