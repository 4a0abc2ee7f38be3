package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality-superior alternative to
  * [[ZOrder]]'s Morton interleave. The Z curve's diagonal jumps put cells
  * (255,0)→(0,1) adjacent on the curve but 255 apart in space, which costs
  * min/max file-skipping selectivity at every jump; the Hilbert curve is
  * CONTINUOUS (every curve step moves exactly one cell), so equal-size
  * curve ranges tile the key space into more compact boxes and a 2-D box
  * predicate overlaps fewer row-groups. Same deployment shape as ZOrder:
  * compute the curve value, range-partition + sort by it, drop it.
  *
  * The map is the classic quadrant-rotation recurrence (Hilbert 1891; the
  * standard iterative xy→d formulation), UNROLLED into pure column
  * arithmetic — `order` aliased projection rounds of when/xor/shift per
  * row, fully codegen-able, no UDF and no lookup-table join. Each round
  * inspects one bit plane (s = 2^k), adds the quadrant's curve offset
  * s²·((3·rx)⊕ry), and rotates/reflects the sub-quadrant frame for the
  * next round.
  *
  * Correctness is pinned two ways in HilbertSpec: the column pipeline
  * equals the scalar reference on the FULL 2^16 domain, and the scalar
  * reference satisfies the defining curve property — consecutive d values
  * are Manhattan-adjacent cells (true of no other ordering, so it rules
  * out every rotated/flipped/Morton impostor).
  */
object HilbertCurve {

  /** Append curve-index column `out` = d(x, y), both inputs in
    * [0, 2^order). Each unroll round is its OWN aliased projection: the
    * rotation recurrence references the previous round's x and y several
    * times, so inlining it into one Column tree multiplies the sub-trees
    * ~6× per round (6^order nodes — the order-8 tree overflowed the
    * analyzer's stack). As separate multi-referenced, non-cheap aliases,
    * CollapseProject keeps the projections distinct and the plan stays
    * linear in `order`; codegen then fuses the whole chain into one
    * WholeStageCodegen stage anyway, so the per-row cost is identical.
    */
  def withIndex(df: DataFrame, order: Int, x0: Column, y0: Column,
                out: String): DataFrame = {
    require(order >= 1 && order <= 16, s"order $order out of [1, 16]")
    val (hx, hy, hd, hrx, hry) = ("_hx", "_hy", "_hd", "_hrx", "_hry")
    var cur = df
      .withColumn(hx, x0.cast("long"))
      .withColumn(hy, y0.cast("long"))
      .withColumn(hd, lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      cur = cur
        .withColumn(hrx,
          when(col(hx).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn(hry,
          when(col(hy).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .select(col("*"),
          (col(hd) + lit(s * s) *
            (lit(3L) * col(hrx)).bitwiseXOR(col(hry))).as(hd + "2"),
          // rotate/reflect the frame: if ry == 0, swap x/y (reflected
          // through s−1 when rx == 1)
          when(col(hry) === 0,
            when(col(hrx) === 1, lit(s - 1) - col(hy)).otherwise(col(hy)))
            .otherwise(col(hx)).as(hx + "2"),
          when(col(hry) === 0,
            when(col(hrx) === 1, lit(s - 1) - col(hx)).otherwise(col(hx)))
            .otherwise(col(hy)).as(hy + "2"))
        .drop(hx, hy, hd, hrx, hry)
        .withColumnRenamed(hx + "2", hx)
        .withColumnRenamed(hy + "2", hy)
        .withColumnRenamed(hd + "2", hd)
      s >>= 1
    }
    cur.withColumnRenamed(hd, out).drop(hx, hy)
  }

  /** Scalar reference (specs + curve-property checks only). */
  def xy2dRef(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Scalar inverse (curve-property checks only). */
  def d2xyRef(order: Int, d0: Long): (Long, Long) = {
    val n = 1L << order
    var t = d0; var x = 0L; var y = 0L
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
