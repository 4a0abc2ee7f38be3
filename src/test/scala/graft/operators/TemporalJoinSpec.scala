package graft.operators

import graft.SparkSpec

/** Hand-checked as-of and band-join semantics on tiny frames. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before each left time") {
    // user 1: clicks at t=10,20,30; user 2: no clicks at all.
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L))
      .toDF("user_id", "ts", "rid")
    val left = Seq(
      (1L, 1L, 5L),   // before any click -> null
      (2L, 1L, 20L),  // exactly at a click -> inclusive match (rid=200)
      (3L, 1L, 25L),  // between 20 and 30 -> rid=200
      (4L, 1L, 99L),  // after all -> rid=300
      (5L, 2L, 50L))  // user with no clicks -> null
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoin
      .asOfJoin(left, right, key = "user_id", time = "ts",
        payload = Seq("rid"), leftTie = "event_id", rightTie = "rid")
      .select("event_id", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(1L -> -1L, 2L -> 200L, 3L -> 200L, 4L -> 300L, 5L -> -1L))
  }

  test("bandJoin yields exactly the pairs within the radius, keeping unmatched left rows") {
    // Radius 10: matches at distance 10 (inclusive), across bucket borders.
    val left = Seq((1L, 100L), (2L, 119L), (3L, 500L)).toDF("lid", "ts")
    val right = Seq((90L, 1.0), (110L, 2.0), (109L, 4.0), (131L, 8.0))
      .toDF("ts", "v")
    val out = TemporalJoin
      .bandJoin(left, right, time = "ts", radius = 10L, payload = Seq("v"))
      .groupBy($"lid").sum("band_v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
    // lid 1 (t=100): 90,110 in range, 109 at d=9 in range -> 1+2+4=7
    // lid 2 (t=119): 110 (d=9), 109 (d=10 inclusive), 131 at d=12 out -> 6
    // lid 3 (t=500): nothing -> null-sum => 0
    assert(out === Map(1L -> 7.0, 2L -> 6.0, 3L -> 0.0))
  }

  test("bandJoin multiplicity is exact: one row per pair, one per matchless left") {
    // a matched left row must NOT also emit null companion rows from its
    // matchless candidate buckets (the naive exploded left-outer does)
    val left = Seq((1L, 100L), (2L, 500L)).toDF("lid", "ts")
    val right = Seq((90L, 1.0), (110L, 2.0)).toDF("ts", "v")
    val rows = TemporalJoin
      .bandJoin(left, right, time = "ts", radius = 10L, payload = Seq("v"))
      .collect()
    assert(rows.length == 3, rows.mkString("; "))  // 2 pairs + 1 unmatched
    assert(rows.count(_.isNullAt(2)) == 1)
  }

  test("bandJoin never produces a pair outside the radius nor drops one inside (randomized)") {
    val rnd = new scala.util.Random(7)
    val ls = (1L to 60L).map(i => (i, rnd.nextLong(1000)))
    val rs = (1L to 80L).map(i => (i + 1000L, rnd.nextLong(1000)))
    val expected = (for {
      (li, lt) <- ls; (ri, rt) <- rs if math.abs(lt - rt) <= 37
    } yield (li, ri)).toSet
    val got = TemporalJoin
      .bandJoin(ls.toDF("lid", "ts"), rs.toDF("rid", "ts"),
        time = "ts", radius = 37L, payload = Seq("rid"))
      .where($"band_rid".isNotNull)
      .select("lid", "band_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }
}
