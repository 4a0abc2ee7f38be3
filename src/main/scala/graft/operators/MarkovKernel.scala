package graft.operators

/** The exact-integer k×k Markov iteration kernel shared by
  * `markov_stationary` (forward power iteration: push mass ALONG edges,
  * group by destination) and `attribution_markov` (backward value
  * iteration: pull absorption value AGAINST edges, group by source).
  *
  * Contract (the oracle-parity device both consumers' DuckDB CTE replays
  * depend on): each edge (a, b, n) contributes the TERM-WISE truncating
  * integer division `(n · v(a,b)) div outdeg(a)` to its group's sum.
  * Truncating per term — not summing rationals and dividing once — makes
  * the sum order-free, so a driver-side fold over an unordered collect()
  * and a SQL `sum((n * p) // rs)` over any join order are bit-identical.
  *
  * Driver-side on purpose: the transition table is bounded by the
  * event-type vocabulary squared ((k+2)² cells), never data-sized — the
  * distributed pass is the ONE corpus scan that aggregates it.
  */
object MarkovKernel {

  /** One iteration round: Σ over each group's edges of
    * `(n · v(a, b)) div outdeg(a)`.
    *
    * @param edges  transition counts (a, b, n); bounded (k² cells)
    * @param outdeg row sums Σ_b n(a, b) — the division's denominator is
    *               always the SOURCE state's out-degree
    * @param key    group key per edge: `(a, b) => b` for a forward push,
    *               `(a, b) => a` for a backward pull
    * @param v      value read per edge: `pi(a)` forward, `value(b)` backward
    * @return group key → term sum; keys with no contributing edge are
    *         absent (readers default them to 0)
    */
  def round(edges: Iterable[(String, String, Long)],
            outdeg: Map[String, Long],
            key: (String, String) => String,
            v: (String, String) => Long): Map[String, Long] =
    edges.groupBy(e => key(e._1, e._2)).map { case (k, es) =>
      k -> es.iterator.map(e => e._3 * v(e._1, e._2) / outdeg(e._1)).sum
    }
}
