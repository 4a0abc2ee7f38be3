package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFns}

/** MinHash + banded LSH near-duplicate detection over a text corpus.
  *
  * Scale design (the whole point — this must hold at 100 TB):
  *   1. shingle:    one narrow (id, shingle) exploded frame, distinct per doc;
  *   2. signature:  ONE shuffle, groupBy(id) computing all `NumHashes`
  *                  min-hashes as parallel agg columns (partial aggregation
  *                  gives map-side combining for free);
  *   3. banding:    signatures → `Bands` (band, band_key) rows per doc;
  *   4. candidates: self-equi-join on (band, band_key) — candidate pairs are
  *                  generated ONLY within hash buckets, never all-pairs; the
  *                  explain plan must show an equi-join (SortMergeJoin /
  *                  shuffled hash), not a cartesian product;
  *   5. verify:     exact Jaccard via inverted-index joins restricted to the
  *                  candidate set (two hash joins + one aggregate).
  *
  * Hot keys: a shingle shared by millions of docs would skew step 4's
  * buckets; band keys hash r full signature components so bucket sizes track
  * true near-duplicate cluster sizes, and AQE skew-join splitting handles
  * pathological clusters.
  *
  * The min-hash family is (a_i · h32(shingle) + b_i) mod P over one
  * md5-derived base hash (constants fixed at build time from md5 of the
  * permutation index) — portable to any oracle engine and one hash
  * evaluation per shingle (see [[PortableHash]] for the policy).
  *
  * Parameters b=8, r=3 give an LSH S-curve with ~50% capture at Jaccard
  * (1/b)^(1/r) ≈ 0.5; candidates are then verified EXACTLY, so precision is
  * 1.0 and only recall is probabilistic (the documented LSH trade-off).
  */
object MinHashLsh {
  val NumHashes = 24
  val Bands = 8
  val RowsPerBand = 3
  require(Bands * RowsPerBand == NumHashes)

  /** (id, shingle): distinct word n-gram shingles per document.
    *
    * Two-step projection on purpose: the token array materializes as a
    * column BEFORE the shingle lambda touches it. Passing `tokens(text)`
    * straight into [[TextFns.shingles]] would capture the split+filter
    * expression tree inside the transform lambda, re-tokenizing the whole
    * text for every element_at — O(tokens²) per document (measured: ~2×
    * the whole dedup pipeline's cost at sf0.1).
    */
  def explodeShingles(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(TextFns.shingles(col("toks"), n)).as("shingle"))

  /** Permutation family: sig_i(s) = (a_i · h32(s) + b_i) mod P over one
    * md5-derived 32-bit base hash. ONE md5 per (id, shingle) row and 24
    * codegen multiply-adds, instead of 24 md5 evaluations (measured ~2× on
    * the whole pipeline). a_i is odd and < 2^31 so a·h < 2^63 — no overflow
    * in any 64-bit engine, so the oracle arithmetic is bit-identical.
    */
  val P: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  val PermA: IndexedSeq[Long] =
    (0 until NumHashes).map(i => (hex12ToLong(s"a:$i") % (1L << 31)) | 1L)
  val PermB: IndexedSeq[Long] =
    (0 until NumHashes).map(i => hex12ToLong(s"b:$i") % P)

  private def hex12ToLong(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Per-id signature columns h0..h{NumHashes-1}. */
  def signatures(exploded: DataFrame): DataFrame = {
    // first 8 hex chars of md5 = first 4 digest bytes = top 32 of the fused
    // 48-bit codegen hash — one digest, no hex/substring/conv string churn
    val base = shiftrightunsigned(graft.functions.PortableHash.h48(col("shingle")), 16)
    val withBase = exploded.withColumn("h32", base)
    val mins = (0 until NumHashes).map(i =>
      min((lit(PermA(i)) * col("h32") + lit(PermB(i))) % P).as(s"h$i"))
    withBase.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** (id, band, band_key): one row per LSH band. */
  def bandKeys(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", rows: _*)).as("band_key"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band bucket. */
  def candidates(banded: DataFrame): DataFrame = {
    val x = banded.select(col("band"), col("band_key"), col("id").as("a"))
    val y = banded.select(col("band"), col("band_key"), col("id").as("b"))
    x.join(y, Seq("band", "band_key")).where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact Jaccard for the given (a, b) pairs via inverted-index joins on the
    * exploded shingle frame — never materializes shingle sets per pair.
    */
  def verifyJaccard(pairs: DataFrame, exploded: DataFrame): DataFrame = {
    val sizes = exploded.groupBy("id").agg(count(lit(1)).as("n"))
    val exA = exploded.select(col("id").as("a"), col("shingle"))
    val exB = exploded.select(col("id").as("b"), col("shingle"))
    pairs.join(exA, "a").join(exB, Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared"))).as("jaccard_raw"))
  }

  /** Full pipeline: banded candidate generation, exact-Jaccard verification,
    * threshold filter. The filter is on the UNROUNDED Jaccard (as in the
    * oracle); rounding is for output only.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, threshold: Double): DataFrame = {
    // the exploded frame feeds three subplans; measured: persisting it
    // costs more than recomputing the narrow tokenize+explode (same
    // finding as SetSimJoin.jaccardPairs), so recompute stands
    val ex = explodeShingles(docs, idCol, textCol, shingleN)
    val cand = candidates(bandKeys(signatures(ex)))
    verifyJaccard(cand, ex).where(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard_raw"), 6).as("jaccard"))
  }

  // ---- DuckDB oracle twins (brute-force at small SF, same definitions) ----

  /** Oracle SQL: signatures+bands via unnest/cross-join-range, candidate
    * pairs via band self-join, exact Jaccard via the same inverted index.
    * `table`/`id`/`text` name the source; output (doc_a, doc_b, jaccard).
    */
  def nearDupSql(table: String, id: String, text: String, shingleN: Int,
                 threshold: Double): String = {
    val w = TextFns.tokensSql(text)
    val sh = TextFns.shinglesSql("w", shingleN)
    val perms = (0 until NumHashes)
      .map(i => s"(${i}, ${PermA(i)}, ${PermB(i)})").mkString(", ")
    s"""WITH sh AS (
       |  SELECT $id AS id, $sh AS shingles
       |  FROM (SELECT $id, $w AS w FROM $table)
       |  WHERE len(w) >= $shingleN
       |), e AS (
       |  SELECT id, unnest(shingles) AS shingle, len(shingles) AS n FROM sh
       |), sig AS (
       |  SELECT id, p.i, min((p.a * eh.h32 + p.b) % $P) AS h
       |  FROM (SELECT id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32
       |        FROM e) eh
       |  CROSS JOIN (VALUES $perms) p(i, a, b)
       |  GROUP BY id, p.i
       |), bands AS (
       |  SELECT id, i // $RowsPerBand AS band,
       |         md5(string_agg(h::VARCHAR, '|' ORDER BY i)) AS band_key
       |  FROM sig GROUP BY id, i // $RowsPerBand
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.band_key = y.band_key AND x.id < y.id
       |), shared AS (
       |  SELECT c.a, c.b, count(*) AS shared,
       |         any_value(ea.n) AS na, any_value(eb.n) AS nb
       |  FROM cand c
       |  JOIN e ea ON ea.id = c.a
       |  JOIN e eb ON eb.id = c.b AND eb.shingle = ea.shingle
       |  GROUP BY c.a, c.b
       |)
       |SELECT a AS doc_a, b AS doc_b,
       |       round(shared::DOUBLE / (na + nb - shared), 6) AS jaccard
       |FROM shared WHERE shared::DOUBLE / (na + nb - shared) >= $threshold""".stripMargin
  }
}
