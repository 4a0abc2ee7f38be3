package graft.operators

import graft.SparkSpec

/** Pins [[BpeMerges]] semantics the oracle compare can't isolate: the
  * position-wise pair count, the greedy non-overlapping merge, the
  * deterministic tiebreak, and exhaustion behavior.
  */
class BpeMergesSpec extends SparkSpec {
  import spark.implicits._

  private def learn(wf: Seq[(String, Long)], rounds: Int) =
    BpeMerges.learn(wf.toDF("word", "freq"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("hand-checked three rounds: counts, merge, and new-symbol pairing") {
    // round 1: (a,a) = 2·3 = 6 beats (a,b) = 3+2 = 5 → "aaab" → aa|a|b
    // round 2: (a,b) = 5 beats (aa,a) = 3 → ab merges everywhere
    // round 3: only (aa,ab) = 3 remains
    val got = learn(Seq(("aaab", 3L), ("ab", 2L)), 3)
    assert(got == Seq(
      (1, "a", "a", 6L),
      (2, "a", "b", 5L),
      (3, "aa", "ab", 3L)))
  }

  test("position-wise counting: 'aaa' holds two (a,a) pairs") {
    val got = learn(Seq(("aaa", 1L)), 1)
    assert(got == Seq((1, "a", "a", 2L)))
  }

  test("greedy merge is non-overlapping: 'aaa' becomes aa|a, then aa+a") {
    val got = learn(Seq(("aaa", 1L)), 2)
    assert(got == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("tiebreak is (count desc, left, right) ascending") {
    // (a,b) and (c,d) both count 2 → (a,b) wins lexicographically
    val got = learn(Seq(("ab", 2L), ("cd", 2L)), 1)
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("stops early when no pairs remain") {
    val got = learn(Seq(("ab", 5L)), 4)
    assert(got == Seq((1, "a", "b", 5L))) // round 2 finds single symbols only
  }

  test("segment replays learned merges greedily") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    assert(BpeMerges.segment("aaab", merges) == Seq("aaab"))
    assert(BpeMerges.segment("aab", merges) == Seq("aa", "b"))
    assert(BpeMerges.segment("abab", merges) == Seq("ab", "ab"))
    assert(BpeMerges.segment("", merges) == Seq.empty)
  }

  test("result is partitioning-independent") {
    val wf = Seq(("spark", 4L), ("spartan", 2L), ("park", 7L), ("ark", 1L))
    val one = BpeMerges.learn(wf.toDF("word", "freq").repartition(1), 4)
      .collect().toSeq
    val many = BpeMerges.learn(wf.toDF("word", "freq").repartition(7), 4)
      .collect().toSeq
    assert(one == many)
  }
}
