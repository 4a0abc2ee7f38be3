package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, expressed as TWO ordinary hash
  * aggregations — no custom state, no UDAF:
  *
  *   rows → (key, register j, rank r) → max per (key, j) → fold per key
  *
  * Both levels partial-aggregate map-side: the first collapses every
  * partition to ≤ m rows per key before its shuffle, the second folds m
  * register rows into one — so per-key shuffle volume is bounded at
  * m·partitions rows no matter how many distinct values flow in. That is
  * the same bounded-semilattice contract as [[KmvSketch]] (registers are a
  * max-semilattice; merge order cannot change the result), just carried by
  * Catalyst's own HashAggregate instead of a typed buffer.
  *
  * KMV vs HLL in this catalog: KMV keeps k=64 hash VALUES (512 B/group,
  * supports set algebra — see the kmv_set_ops query); HLL keeps m=64
  * 6-bit RANKS (~48 B/group, union-only). Same ~13% (1.04/√64) error.
  *
  * Determinism / attestability: hashes are [[graft.functions.PortableHash
  * .h48]]; the register index is the top p=6 bits, the rank field the next
  * W=32 bits (rank = leading zeros + 1, so rank ∈ [1, 33]); the estimator
  * is pure integer arithmetic — Σ 2^(−Mj) is carried as the exact integer
  * T = Σ 2^(33−Mj) (common denominator 2^33) and the α_m bias constant as
  * the exact rational 709/1000, so a DuckDB oracle computing the same
  * chain is bit-identical. Max headroom: α·m²·2^33 ≈ 2.5·10^16 and
  * 1000·T ≤ 1000·2^39 ≈ 5.5·10^14, both far inside int64. The 32-bit rank
  * field saturates near m·2^32 ≈ 3·10^11 distinct per group — beyond any
  * per-group cardinality this engine targets (document counts at 100 TB
  * are ~10^11 TOTAL).
  *
  * Small-range branch: below 2.5·m the raw estimator biases high, so when
  * raw ≤ 160 and V > 0 registers are empty the classic linear-counting
  * fallback m·ln(m/V) applies — precomputed here as a 63-entry integer
  * table (V is an integer in [1, 63], so the float ln happens ONCE at
  * build time in this file, never per-row in either engine).
  *
  * Reference analog: the aggregate framework's UniqValueCount caps its
  * exact value set and degrades to a "≥ cap" lower bound (reference
  * src/core/org/apache/hadoop/mapred/lib/aggregate/UniqValueCount.java:61);
  * HLL holds an unbiased estimate at 48 bytes per group forever.
  */
object HllSketch {

  /** Registers m = 2^P. */
  val P: Int = 6
  val M: Int = 1 << P

  /** Rank-field width in bits; rank ∈ [1, W + 1]. */
  val W: Int = 32

  /** α_64 = 0.709 (Flajolet et al. 2007) as a ×1000 integer. */
  val Alpha1000: Long = 709

  /** α·m²·2^(W+1−...): numerator of the raw estimate, exact. */
  val EstNum: Long = Alpha1000 * M * M * (1L << (W + 1))

  /** Linear-counting table: round(m · ln(m / V)) for V = 1..m−1. */
  val LcTable: Seq[Long] =
    (1 until M).map(v => math.round(M.toDouble * math.log(M.toDouble / v)))

  /** Raw-estimate threshold below which linear counting takes over. */
  val LcThreshold: Long = 5L * M / 2

  /** (register, rank) columns from a non-negative 48-bit hash column. */
  def register(hv: Column): Column = shiftrightunsigned(hv, 48 - P)

  def rank(hv: Column): Column = {
    val v = shiftrightunsigned(hv, 48 - P - W) % lit(1L << W)
    when(v === 0, W + 1).otherwise(lit(W + 1) - length(bin(v)))
  }

  /** Register table df(keyCol, hv) → (keyCol, j, mj) — the sketch's
    * merge-level representation. Registers form a max-monoid: the sketch
    * of any UNION of slices is the per-register max of their register
    * tables, so rollups (see the hll_merge catalog query) merge these 64
    * rows per key instead of rescanning raw data.
    */
  def registersByKey(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol), register(col("hv")).as("j"), rank(col("hv")).as("r"))
      .groupBy(col(keyCol), col("j")).agg(max(col("r")).as("mj"))

  /** Fold a register table (keyCol, j, mj) into (keyCol, est_distinct). */
  def estimateRegisters(regs: DataFrame, keyCol: String): DataFrame = {
    val lcArr = array(LcTable.map(lit): _*)
    regs
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("pres"),
        expr(s"sum(shiftleft(CAST(1 AS BIGINT), ${W + 1} - mj))").as("tpres"))
      // T = Σ_pres 2^(W+1−Mj) + (m − pres)·2^(W+1): empty registers carry
      // rank 0, i.e. a full-weight 2^(W+1) term of the Σ 2^(−M) harmonic sum
      .withColumn("raw",
        expr(s"$EstNum div (1000 * (tpres + ($M - pres) * ${1L << (W + 1)}))"))
      .select(col(keyCol),
        when(col("raw") <= LcThreshold && col("pres") < M,
          element_at(lcArr, (lit(M) - col("pres")).cast("int")))
          .otherwise(col("raw")).cast("long").as("est_distinct"))
  }

  /** Full pipeline: df(keyCol, hv) → (keyCol, est_distinct). */
  def distinctByKey(df: DataFrame, keyCol: String): DataFrame =
    estimateRegisters(registersByKey(df, keyCol), keyCol)

  /** DuckDB twin of the whole chain, for oracle authors. `hvSql` must be
    * the portable 48-bit hash expression over the attested column.
    */
  def distinctByKeySql(table: String, keyCol: String, hvSql: String,
                       where: String = "TRUE"): String = {
    val lcList = LcTable.mkString("[", ", ", "]")
    s"""WITH hll_h AS (
       |  SELECT $keyCol AS k, $hvSql AS hv FROM $table WHERE $where
       |), hll_f AS (
       |  SELECT k, hv // ${1L << (48 - P)} AS j,
       |         (hv // ${1L << (48 - P - W)}) % ${1L << W} AS v
       |  FROM hll_h
       |), hll_r AS (
       |  SELECT k, j,
       |         CASE WHEN v = 0 THEN ${W + 1}
       |              ELSE ${W + 1} - length(bin(v)) END AS r
       |  FROM hll_f
       |), hll_m AS (
       |  SELECT k, j, max(r) AS mj FROM hll_r GROUP BY k, j
       |), hll_a AS (
       |  SELECT k, count(*) AS pres,
       |         CAST(sum(1::BIGINT << (${W + 1} - mj)) AS BIGINT) AS tpres
       |  FROM hll_m GROUP BY k
       |), hll_e AS (
       |  SELECT k, pres,
       |         $EstNum // (1000 * (tpres + ($M - pres) * ${1L << (W + 1)})) AS raw
       |  FROM hll_a
       |)
       |SELECT k AS $keyCol,
       |  CAST(CASE WHEN raw <= $LcThreshold AND pres < $M
       |            THEN ($lcList)[$M - pres] ELSE raw END AS BIGINT)
       |    AS est_distinct
       |FROM hll_e""".stripMargin
  }
}
