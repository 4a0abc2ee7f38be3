package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a (src, dst) edge frame —
  * label every node with the smallest node id in its component.
  *
  * The near-dup passes ([[MinHashLsh]], [[SimHash]], [[SetSimJoin]],
  * [[graft.catalog.LlmPipeline.spanDedup]]) emit PAIRS; turning pairs into
  * dedup CLUSTERS (pick one canonical doc per group, drop the rest) is a
  * connected-components problem — A~B and B~C must collapse to one cluster
  * even when A and C were never compared.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each phase
  * rewires edges toward per-neighborhood minima:
  *   - large-star: every node's LARGER neighbors reconnect to the minimum
  *     of its closed neighborhood;
  *   - small-star: every node and its SMALLER neighbors reconnect to that
  *     minimum.
  * Because the graph itself is rewired (not just labels propagated along
  * fixed edges), chains collapse in O(log n) rounds — the plain
  * propagate-along-edges variant needs O(diameter) rounds (measured on the
  * sf0.01 4-gram graph: 14 rounds vs 5). At fixpoint the edge set is a
  * forest of stars, each pointing at its component's minimum — the labels.
  *
  * Scale shape: a phase is one groupBy-min over edge endpoints plus one
  * equi-join of the edge frame against that min table, then a distinct —
  * all partial-agg-friendly shuffles on node id; no per-node adjacency list
  * is ever materialized (the hot-node collect_list trap), so a node with
  * 10M neighbors costs 10M rows, not one 10M-element array. Per-round
  * results are re-materialized with lineage truncated
  * ([[graft.core.Materialize]] — local blocks by default, reliable
  * checkpoint dir via `spark.graft.checkpointDir` for executor-loss safety
  * on a real cluster). The loop is driver-orchestrated but every step is a
  * distributed shuffle — nothing data-sized is ever collected.
  */
object ConnectedComponents {

  /** @param nodes single-column frame of node ids (column `id`)
    * @param edges two-column frame (`src`, `dst`), undirected (one
    *              direction suffices; orientation is normalized internally)
    * @return frame (`id`, `component`) — component = min node id reachable
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
          trace: Option[String] = None): DataFrame = {
    // normalize to directed (hi → lo), drop self-loops and duplicates
    var e = graft.core.Materialize(edges
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct())
    // fixpoint signature: (count, order-independent Σ xxhash64(hi,lo)).
    // Both frames are distinct sets, so equal signatures ⇔ equal sets up
    // to a 2⁻⁶⁴-ish hash-sum collision — acceptable for a convergence
    // check whose worst miss is one extra identical round or an early
    // exit on an astronomically unlikely collision. ONE partial-agg job
    // (no exchange of the 2·|E| rows) replaces the previous
    // union-distinct-count set-equality proof, which re-shuffled both
    // frames every round. The decimal cast keeps the sum exact under
    // ANSI (int64 sum of hashes would overflow-throw).
    def signature(df: DataFrame): (Long, BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)"))).head()
      (r.getLong(0), Option(r.getDecimal(1)).map(BigDecimal(_)).orNull)
    }
    var (cnt, sig) = signature(e)
    var iter = 0
    var converged = cnt == 0
    while (!converged && iter < maxIter) {
      // exactly ONE star round per materialization: a round's output feeds
      // its own union/join branches, so an unmaterialized round gets its
      // subtree REPLANNED per branch (no cross-branch CSE in Catalyst) —
      // stacking two rounds before the checkpoint re-executed round 1 up
      // to 4× and measured ~50% slower at sf0.1
      val round = starRound(e)
      val next = graft.core.Materialize(round)
      trace.foreach(t =>
        graft.core.PlanTrace.capture(round, s"${t}_round${iter + 1}"))
      val (nextCnt, nextSig) = signature(next)
      // fixpoint: star edges reproduce themselves
      converged = nextCnt == cnt && nextSig == sig
      e = next
      cnt = nextCnt
      sig = nextSig
      iter += 1
    }
    // at fixpoint each non-min node carries exactly one star edge; the
    // groupBy-min also makes the maxIter-backstop exit well-defined
    nodes.select(col("id"))
      .join(e.groupBy(col("hi")).agg(min(col("lo")).as("component"))
        .withColumnRenamed("hi", "id"),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** One large-star + small-star pass over a directed (hi → lo) edge frame. */
  private def starRound(e: DataFrame): DataFrame = {
    // large-star: u's closed-neighborhood min m(u); each larger neighbor
    // v > u reconnects as (v, m(u)). No distinct: duplicate edges cannot
    // change small-star's min aggregate and the round-final distinct
    // dedups — one fewer exchange per round.
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .union(e.select(col("lo").as("u"), col("hi").as("v")))
    val mL = sym.groupBy(col("u"))
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    val large = sym.join(mL, "u")
      .filter(col("v") > col("u")).filter(col("v") =!= col("m"))
      .select(col("v").as("hi"), col("m").as("lo"))
    // small-star: u and its smaller neighbors reconnect to
    // m(u) = min of {u} ∪ smaller-neighbors
    val mS = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    large.join(mS, "hi")
      .filter(col("lo") =!= col("m"))
      .select(col("lo").as("hi"), col("m").as("lo"))
      .union(mS.select(col("hi"), col("m").as("lo")))
      .filter(col("hi") =!= col("lo"))
      .distinct()
  }
}
