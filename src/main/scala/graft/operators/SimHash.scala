package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFns}

/** 48-bit SimHash near-duplicate fingerprinting.
  *
  * fingerprint(doc) = Σ_b 2^b · [ Σ_{s ∈ distinct 2-gram shingles} (bit_b(h48(s)) ? +1 : −1) ≥ 0 ]
  *
  * Features are word BIGRAMS, not bare tokens: token-set features collapse
  * on corpora where most documents share a vocabulary (every pair becomes
  * a near-dup candidate — the degenerate all-pairs case), while bigrams
  * carry word order, so only genuinely similar texts land within a small
  * Hamming radius. Two docs with the same bigram set get the same
  * fingerprint; small edits flip few bits.
  *
  * Scale design: one narrow (id, token) explode, ONE groupBy(id) computing
  * all 48 bit-sums as parallel agg columns (map-side partial agg free), then
  * pure projection to the fingerprint. Pair generation is banded, not
  * all-pairs: the 48 bits split into `Bands` 12-bit segments, and by
  * pigeonhole any pair within Hamming distance ≤ `Bands`−1 shares at least
  * one EXACT segment → candidates come from an equi-join on (band, segment
  * value), then verify with bit_count(xor) — so the banding is lossless for
  * radius ≤ 3, and engine output equals a brute-force oracle.
  *
  * 48 bits (not 64) keeps every value inside the portable-hash range
  * (see [[PortableHash.h48]]).
  */
object SimHash {
  val Bits = 48
  val Bands = 4
  val BandBits: Int = Bits / Bands // 12
  val MaxHamming: Int = Bands - 1  // banding is lossless up to this radius

  val FeatureN = 2 // word-bigram features

  /** (id, fingerprint): 48-bit SimHash per document. Docs with fewer than
    * [[FeatureN]] tokens have no features and drop out (oracle mirrors).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(TextFns.shingles(col("toks"), FeatureN)).as("tok"))
    val h = toks.withColumn("h", PortableHash.h48(col("tok")))
    val bitSums = (0 until Bits).map(b =>
      sum(when(PortableHash.bit(col("h"), b) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sums = h.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until Bits).map(b =>
      when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("id"), fp.as("fingerprint"))
  }

  /** Pairs (a < b) with Hamming distance ≤ maxDist (must be ≤ [[MaxHamming]]
    * for the banded candidate generation to be lossless).
    */
  def nearPairs(fps: DataFrame, maxDist: Int = MaxHamming): DataFrame = {
    require(maxDist <= MaxHamming,
      s"banded generation is only lossless up to Hamming $MaxHamming")
    val segs = (0 until Bands).map { s =>
      struct(lit(s).as("band"),
        (shiftrightunsigned(col("fingerprint"), s * BandBits) % (1L << BandBits))
          .as("seg"))
    }
    val banded = fps.select(col("id"), col("fingerprint"),
        explode(array(segs: _*)).as("bs"))
      .select(col("id"), col("fingerprint"),
        col("bs.band").as("band"), col("bs.seg").as("seg"))
    val x = banded.select(col("band"), col("seg"),
      col("id").as("a"), col("fingerprint").as("fa"))
    val y = banded.select(col("band"), col("seg"),
      col("id").as("b"), col("fingerprint").as("fb"))
    x.join(y, Seq("band", "seg")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("fa"), col("fb")).distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxDist)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("hamming"))
  }

  /** DuckDB oracle: same fingerprints, brute-force all-pairs Hamming filter
    * (equal to the banded plan because banding is lossless at this radius).
    */
  def nearPairsSql(table: String, id: String, text: String,
                   maxDist: Int = MaxHamming): String = {
    val w = TextFns.tokensSql(text)
    val sh = TextFns.shinglesSql("w", FeatureN)
    val h = PortableHash.h48Sql("tok")
    s"""WITH toks AS (
       |  SELECT id, unnest(shingles) AS tok FROM (
       |    SELECT $id AS id, $sh AS shingles
       |    FROM (SELECT $id, $w AS w FROM $table)
       |    WHERE len(w) >= $FeatureN)
       |), hashes AS (
       |  SELECT id, $h AS h FROM toks
       |), bitsums AS (
       |  SELECT id, b,
       |    CASE WHEN sum(CASE WHEN (h // (2**b)::BIGINT) % 2 = 1
       |                       THEN 1 ELSE -1 END) >= 0
       |         THEN (2**b)::BIGINT ELSE 0 END AS bitval
       |  FROM hashes CROSS JOIN range($Bits) t(b) GROUP BY id, b
       |), fp AS (
       |  SELECT id, sum(bitval)::BIGINT AS fingerprint FROM bitsums GROUP BY id
       |)
       |SELECT a.id AS doc_a, b.id AS doc_b,
       |       bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
       |FROM fp a JOIN fp b ON a.id < b.id
       |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= $maxDist""".stripMargin
  }
}
