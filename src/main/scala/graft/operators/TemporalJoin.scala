package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event logs: as-of (most-recent-prior) and bucketized
  * range (band) joins.
  *
  * Neither is a built-in Spark join shape; both are expressed here as
  * compositions that keep the candidate space bounded at any scale:
  *
  *  - As-of: NO join at all. Tag both sides, union, and run one running
  *    `last(_, ignoreNulls)` window per key — a single shuffle of
  *    |left|+|right| rows on the join key, then a filter back to left rows.
  *    This is the merge-scan an ASOF JOIN does natively (DuckDB's
  *    `ASOF JOIN`, our oracle), laid onto Spark's sort-window machinery.
  *    At 100 TB each user's timeline sorts once inside its partition; no
  *    per-row probe, no range explosion.
  *
  *  - Range/band join: equi-join on a coarse time bucket sized to the band
  *    radius. Each left row fans out to the 3 candidate buckets that can
  *    contain a match (radius == bucket width ⇒ provably exactly 3), the
  *    right side keeps its single home bucket, and the exact predicate
  *    re-filters pairs after the equi-join. Candidates are bounded by bucket
  *    occupancy — never |L|×|R| — and AQE handles hot buckets as ordinary
  *    join skew.
  */
object TemporalJoin {

  /** Most-recent-prior join: for every left row, the latest right row with
    * the same `key` and `time` ≤ the left row's `time` (ties at equal time
    * match — ASOF `>=` semantics).
    *
    * `right` must be unique per (key, time) — pre-aggregate duplicates or
    * the choice among them is undefined (our catalog query keeps
    * max(event_id), mirrored in the oracle).
    *
    * `payload` columns are carried from the right side; everything else in
    * `left` passes through unchanged. `leftTie`/`rightTie` (an id column on
    * each side) make the union's sort total so the plan is deterministic
    * under retries — the RESULT is already order-independent (left rows
    * carry null payload, so `last(_, ignoreNulls)` never reads a peer left
    * row; right rows are unique per (key, time)), the total order just
    * keeps the physical sort stable.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      leftTie: String,
      rightTie: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // One unioned schema: left rows carry null payload, right rows carry
    // null left-only columns. side=0 sorts right rows first at equal time,
    // which is exactly the >= (inclusive) as-of contract.
    val taggedRight = right.select(
      Seq(col(key), col(time), lit(0).as("side"), col(rightTie).as("tie")) ++
        payload.map(c => col(c).as(s"asof_$c")) ++
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(time), lit(1).as("side"), col(leftTie).as("tie")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
        leftCols.filterNot(c => c == key || c == time).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("side"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select((Seq(col(key), col(time), col("side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        payload.map(c => last(col(s"asof_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c"))): _*)
      .where(col("side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }

  /** Earliest-subsequent join — the FORWARD mirror of [[asOfJoin]]: for
    * every left row, the earliest right row with the same `key` and
    * `time` ≥ the left row's `time` (equal time matches — ASOF `<=`
    * contract). Same single-shuffle tagged-union design with the window
    * frame reversed: `first(_, ignoreNulls)` over [current row, unbounded
    * FOLLOWING], left rows sorting before right rows at equal time so an
    * exactly-simultaneous right row is inside the left row's frame. Same
    * uniqueness contract: `right` unique per (key, time).
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      leftTie: String,
      rightTie: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = right.select(
      Seq(col(key), col(time), lit(1).as("side"), col(rightTie).as("tie")) ++
        payload.map(c => col(c).as(s"asof_$c")) ++
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(time), lit(0).as("side"), col(leftTie).as("tie")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
        leftCols.filterNot(c => c == key || c == time).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("side"), col("tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    taggedRight.unionByName(taggedLeft)
      .select((Seq(col(key), col(time), col("side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        payload.map(c => first(col(s"asof_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c"))): _*)
      .where(col("side") === 0)
      .select(leftCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }

  /** Bucketized band join: all (left, right) pairs with
    * |left.time − right.time| ≤ `radius`, produced as an equi-join on
    * `time div radius` with the left side exploded to its 3 candidate
    * buckets. Returns the joined frame (left columns + `payload` right
    * columns) with EXACT left-outer multiplicity: one row per matching
    * pair, plus exactly one null-payload row per matchless left row.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      time: String,
      radius: Long,
      payload: Seq[String]): DataFrame = {
    // Integer `div`, not float `/`: epoch-µs magnitudes make double division
    // round across bucket borders (same pitfall as events_window_agg).
    val bin: Column = expr(s"$time div ${radius}L")
    // Per-row identity, internal only: restores exact outer multiplicity
    // after the 3-bucket explode.
    val lid = left.withColumn("band_lid", monotonically_increasing_id())
    val l = lid.withColumn("band_bin",
      explode(array(bin - 1, bin, bin + 1)))
    val r = right.select(
      Seq(bin.as("band_bin"), col(time).as("band_rt")) ++
        payload.map(c => col(c).as(s"band_$c")): _*)
    // Inner join + anti-join complement, NOT a bare left-outer over the
    // exploded frame: a left-outer emits a null companion row for every
    // matchless candidate bucket (up to 2 extra per MATCHED left row, 3
    // per unmatched one) — invisible to null-ignoring aggregates but
    // wrong for any caller counting rows or reading pairs. A right row
    // lives in exactly one bucket, so the inner leg yields each pair
    // once; the complement leg shuffles only the narrow lid projection.
    val matched = l.join(r,
        l("band_bin") === r("band_bin") &&
          abs(col(time) - col("band_rt")) <= radius)
      .drop("band_bin", "band_rt")
    val unmatched = lid
      .join(matched.select("band_lid").distinct(), Seq("band_lid"), "left_anti")
      .select(Seq(col("*")) ++ payload.map(c =>
        lit(null).cast(right.schema(c).dataType).as(s"band_$c")): _*)
    matched.unionByName(unmatched).drop("band_lid")
  }
}
