package graft.core

import graft.SparkSpec

class SharedSpec extends SparkSpec {
  import spark.implicits._

  test("memo caches by (session, label, dir) and builds once") {
    var builds = 0
    def frame = { builds += 1; Seq(1L, 2L).toDF("x") }
    val a = Shared.memo(spark, "sharedspec_once", "/d1")(frame)
    val b = Shared.memo(spark, "sharedspec_once", "/d1")(frame)
    val c = Shared.memo(spark, "sharedspec_once", "/d2")(frame)
    assert(builds === 2) // d1 built once, d2 its own
    assert(a.count() === 2 && (b eq a) && c.count() === 2)
  }

  test("memo is re-entrant: a memoized frame may build from another memo") {
    // regression: computeIfAbsent-based memo threw
    // IllegalStateException("Recursive update") on exactly this nesting
    // (keep-best <- components <- shingle graph), and only when a consumer
    // happened to run before the builder — order-dependent, so the memo
    // must be safe by construction
    val out = Shared.memo(spark, "sharedspec_outer", "/d") {
      val inner = Shared.memo(spark, "sharedspec_inner", "/d") {
        Seq(1L, 2L, 3L).toDF("x")
      }
      inner.filter($"x" > 1)
    }
    assert(out.count() === 2)
    // the inner frame was cached by the nested call, not rebuilt
    var rebuilt = false
    val inner2 = Shared.memo(spark, "sharedspec_inner", "/d") {
      rebuilt = true; Seq.empty[Long].toDF("x")
    }
    assert(!rebuilt && inner2.count() === 3)
  }

  test("drainBuilds reports labels built since last drain, then empties") {
    Shared.drainBuilds()
    Shared.memo(spark, "sharedspec_drain_a", "/d")(Seq(1L).toDF("x"))
    Shared.memo(spark, "sharedspec_drain_a", "/d")(Seq(1L).toDF("x")) // hit
    Shared.memo(spark, "sharedspec_drain_b", "/d")(Seq(1L).toDF("x"))
    // other suites may memo-build concurrently in this JVM — assert only
    // on this test's own labels
    val built = Shared.drainBuilds().filter(_.startsWith("sharedspec_drain"))
    assert(built === Seq("sharedspec_drain_a", "sharedspec_drain_b"))
    assert(Shared.drainBuilds().filter(_.startsWith("sharedspec_drain")).isEmpty)
  }
}
