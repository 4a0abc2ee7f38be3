package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * min/max-stat file skipping. Sorting a table by ONE column makes that
  * column's parquet row-group stats selective and every other column's
  * useless; interleaving the bits of two columns gives BOTH dimensions
  * locality, so a filter on either (or a box on both) overlaps only a
  * small fraction of files. This is the layout trick behind every
  * "OPTIMIZE ... ZORDER BY" lakehouse command, built here from plain
  * column arithmetic — the curve value is computed per row, the table is
  * range-partitioned + sorted by it, and the value itself is dropped
  * before the write (the layout is the product, not the column).
  *
  * At 100 TB: layout is THE cheap scan accelerator — a z-ordered fact
  * table turns a 2-D box predicate into O(box volume) row-groups read
  * instead of O(table), with zero query-side changes (parquet pushdown
  * does the skipping from stats alone).
  *
  * All ops are codegen'd integer arithmetic (shiftleft/and/or) — no UDF.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` so bit i lands at position 2i (the
    * classic mask-and-shift Morton spreading, 5 rounds).
    */
  private def spread(c: Column): Column = {
    var v = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code interleaving two non-negative 32-bit columns:
    * x occupies even bits, y odd bits.
    */
  def morton(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Scale `c` from its observed [lo, hi] range onto 0..255 — the rank
    * normalization both dims need before interleaving (unscaled, the
    * wider dimension's high bits dominate the curve and the layout
    * degenerates to a single-column sort). lo/hi come from a stats pass
    * (or parquet footer min/max at scale); the fp division is exact for
    * any key below 2^45.
    */
  def scaleTo256(c: Column, lo: Long, hi: Long): Column =
    floor(((c.cast("long") - lit(lo)) * lit(256L)) /
      lit(hi - lo + 1L)).cast("long")

  /** Reference scalar implementation (specs only). */
  def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
