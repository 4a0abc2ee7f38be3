package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property spec for the shared k×k integer Markov iteration kernel —
  * the one implementation behind BOTH `markov_stationary` (forward push)
  * and `attribution_markov` (backward pull).
  */
class MarkovKernelSpec extends AnyFunSuite {

  private val edges = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L),
    ("b", "c", 2L), ("c", "a", 5L))
  private val outdeg = edges.groupBy(_._1)
    .map { case (a, es) => a -> es.map(_._3).sum } // a→4, b→4, c→5

  test("term-wise truncating division matches the brute-force definition") {
    val v = Map("a" -> 103L, "b" -> 77L, "c" -> 31L)
    val got = MarkovKernel.round(edges, outdeg,
      key = (_, b) => b, v = (a, _) => v(a))
    // each term truncates BEFORE the sum: b ← (3·103)/4; a ← (2·77)/4 + (5·31)/5
    assert(got === Map(
      "b" -> 3L * 103 / 4,
      "c" -> (1L * 103 / 4 + 2L * 77 / 4),
      "a" -> (2L * 77 / 4 + 5L * 31 / 5)))
    // and differs from divide-after-sum where truncation order matters:
    // c's terms truncate 25.75→25 and 38.5→38 (63), where (103+154)/4 = 64
    assert(got("c") !== (1L * 103 + 2L * 77) / 4)
  }

  test("order-free: any edge permutation produces identical sums") {
    val v = Map("a" -> 999L, "b" -> 123L, "c" -> 456L)
    val base = MarkovKernel.round(edges, outdeg,
      key = (a, _) => a, v = (_, b) => v(b))
    edges.permutations.take(24).foreach { perm =>
      assert(MarkovKernel.round(perm, outdeg,
        key = (a, _) => a, v = (_, b) => v(b)) === base)
    }
  }

  test("forward push conserves pushed mass up to per-term truncation") {
    val pi = Map("a" -> (1L << 20), "b" -> (1L << 20), "c" -> (1L << 20))
    val w = MarkovKernel.round(edges, outdeg,
      key = (_, b) => b, v = (a, _) => pi(a))
    val pushed = w.values.sum
    val exact = 3L << 20 // three unit-mass sources, row-stochastic rows
    assert(pushed <= exact && pushed >= exact - edges.size) // ≤1 ulp/term
  }

  test("backward pull: absorbing values propagate one hop per round") {
    // chain s → m → t, t absorbing at M; after 1 round m sees M·(n/deg),
    // s sees 0; after 2 rounds s sees the composed product
    val ch = Seq(("s", "m", 1L), ("m", "t", 3L), ("m", "x", 1L))
    val od = Map("s" -> 1L, "m" -> 4L)
    val M = 1000000L
    def value(h: Map[String, Long])(b: String): Long =
      if (b == "t") M else h.getOrElse(b, 0L)
    var h = Map.empty[String, Long]
    h = Seq("s", "m").map(a => a -> MarkovKernel.round(ch, od,
      key = (a2, _) => a2, v = (_, b) => value(h)(b)).getOrElse(a, 0L)).toMap
    assert(h === Map("s" -> 0L, "m" -> 3L * M / 4))
    h = Seq("s", "m").map(a => a -> MarkovKernel.round(ch, od,
      key = (a2, _) => a2, v = (_, b) => value(h)(b)).getOrElse(a, 0L)).toMap
    assert(h("s") === 1L * (3L * M / 4) / 1)
  }

  test("keys with no contributing edges are absent, not zero") {
    val got = MarkovKernel.round(Seq(("a", "b", 1L)), Map("a" -> 1L),
      key = (a, _) => a, v = (_, _) => 10L)
    assert(got === Map("a" -> 10L))
    assert(!got.contains("b"))
  }
}
