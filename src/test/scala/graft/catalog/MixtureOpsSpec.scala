package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFns

class MixtureOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("temperature_mix: sqrt weights up-sample low-resource languages") {
    val rows = MixtureOps.temperatureMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val total = rows.values.map(_._1).sum
    rows.foreach { case (_, (n, w, rate, exp)) =>
      assert(w === math.sqrt(n.toDouble * 1000000).floor.toLong)
      assert(exp === n * rate / 1000)
    }
    val (nMin, _, rateMin, _) = rows.minBy(_._2._1)._2
    val (nMax, _, rateMax, _) = rows.maxBy(_._2._1)._2
    // α=1/2 compresses: smallest language's share of the mixture exceeds its
    // proportional share; the largest language's share shrinks
    assert(rateMin >= 1000L * nMin / total,
      s"low-resource rate $rateMin under proportional ${1000L * nMin / total}")
    assert(rateMax <= 1000L * nMax / total + 1)
  }

  test("dsir_weights: one row per doc; flat-vocab corpus scores flat") {
    val docs = Tables.documents(spark, dir)
    val got = MixtureOps.dsirWeights(spark, dir)
    assert(got.count() === docs.count(), "one weight row per document")
    // the driver corpus shares one vocabulary across languages with
    // near-proportional frequencies — DSIR correctly reports ≈0 signal
    val span = got.agg(max(abs(col("weight_bits")))).head().getLong(0)
    assert(span <= 64L, s"flat corpus should quantize near zero, saw $span")
  }

  test("dsirWeightFrame: separates target-like docs on a skewed hand corpus") {
    import spark.implicits._
    // target dialect (docs 0-3) and raw-only dialect (docs 4-7) share one
    // connective ("the") but otherwise use disjoint vocabularies
    val tgt = Seq("alpha beta the gamma alpha", "beta gamma the alpha beta",
      "gamma alpha the beta gamma", "alpha gamma the beta alpha")
    val other = Seq("delta epsilon the zeta delta", "epsilon zeta the delta zeta",
      "zeta delta the epsilon zeta", "delta zeta the epsilon delta")
    val docs = (tgt ++ other).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = MixtureOps.dsirWeightFrame(docs, col("doc_id") < 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tgtMin = (0L to 3L).map(w).min
    val otherMax = (4L to 7L).map(w).max
    assert(tgtMin > otherMax,
      s"every target doc ($tgtMin) must outscore every raw-only doc ($otherMax)")
    assert(otherMax < 0L, "raw-only dialect is penalized below zero")
  }

  test("source_calibrate: bands partition each source with ordered edges") {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = MixtureOps.sourceCalibrate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (src, bands) =>
      assert(bands.map(_._3).sum === perSource(src))
      bands.foreach { case (_, b, _, _, _) => assert(b >= 0L && b <= 9L) }
      val sorted = bands.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, _, _, _, hiPrev), (_, _, _, lo, _)) =>
        assert(lo >= hiPrev, s"$src: band edges overlap ($lo < $hiPrev)")
      }
    }
  }

  test("prefix_dup: per-source counts reconcile with a direct recount") {
    val pre = Tables.documents(spark, dir)
      .select(col("source"),
        concat_ws(" ", slice(TextFns.tokens(col("text")), 1, 8)).as("p"))
    val share = pre.groupBy("p").count()
    val direct = pre.join(share, "p")
      .groupBy("source")
      .agg(sum(when(col("count") > 1, 1L).otherwise(0L)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = MixtureOps.prefixDup(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet === direct.keySet)
    rows.foreach { r =>
      val (src, nDocs, nTempl, nTemplates) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTempl === direct(src))
      assert(nTempl <= nDocs)
      assert(nTemplates <= math.max(nTempl, 1L),
        "each counted template has at least one templated doc in the source")
    }
    assert(rows.map(_.getLong(2)).sum > 0L, "corpus has prefix-dup groups")
  }

  test("vocab_growth: cumulative counts close over the whole corpus") {
    val docs = Tables.documents(spark, dir)
    val vocab = docs
      .select(explode(TextFns.tokens(col("text"))).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    val rows = MixtureOps.vocabGrowth(spark, dir).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(3)).sum === vocab, "new types partition the vocab")
    assert(rows.last.getLong(4) === vocab, "final cumulative = total vocab")
    var (ct, ctok) = (0L, 0L)
    rows.foreach { r =>
      ct += r.getLong(3); ctok += r.getLong(2)
      assert(r.getLong(4) === ct)
      assert(r.getLong(5) === ctok)
    }
    // Heaps: later deciles contribute fewer new types than the first
    assert(rows.last.getLong(3) < rows.head.getLong(3))
  }

  test("minhash_est_audit: pair count matches the exact frame, error bounded") {
    val r = LlmPipeline.minhashEstAudit(spark, dir).head()
    val (n, mean, max) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = LlmPipeline.ngramJaccard(spark, dir).count()
    assert(n === exact, "audits exactly the exact-Jaccard pair set")
    assert(n > 0L)
    assert(mean <= max && max <= 1000L)
    // K=24 signature: per-pair sd ≈ √(j(1−j)/24) ≤ ~102‰ — the MEAN abs
    // error over the ≥0.5-Jaccard pair set sits well inside 250‰
    assert(mean <= 250L, s"mean estimate error $mean‰ implausibly large")
  }

  test("waterfill_budget: allocation feasible, maximal, and supply-capped") {
    val rows = MixtureOps.waterfillBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val budget = rows.head._5
    val level = rows.head._4
    val total = rows.map(_._3).sum
    assert(total <= budget, "allocation must fit the budget")
    rows.foreach { case (_, supply, alloc, l, b) =>
      assert(l === level && b === budget)
      assert(alloc === math.min(supply, level), "alloc = min(supply, level)")
    }
    // maximality: raising the level by 1 must overflow the budget —
    // unless every source is already fully allocated
    val atLevelPlus = rows.map { case (_, s, _, _, _) =>
      math.min(s, level + 1)
    }.sum
    val allSaturated = rows.forall { case (_, s, a, _, _) => a === s }
    assert(allSaturated || atLevelPlus > budget,
      "water level must be the largest feasible integer")
  }
}
