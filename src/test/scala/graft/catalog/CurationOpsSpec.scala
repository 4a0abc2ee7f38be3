package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.VectorOps

class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("cdc_apply: latest-wins picks seq 2, deletes drop, inserts add status N") {
    val snap = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("pc"))
    // hand-derived expected final state: ≡1 rows get +222 (seq 2 wins over
    // seq 1's +111), ≡4 rows vanish, ≡7 rows spawn an extra 'N' row at +5
    val kept = snap.where(pmod(col("k"), lit(9)) =!= 4)
      .withColumn("pc", when(pmod(col("k"), lit(9)) === 1, col("pc") + 222)
        .otherwise(col("pc")))
      .select(col("status"), col("pc"))
    val spawned = snap.where(pmod(col("k"), lit(9)) === 7)
      .select(lit("N").as("status"), (col("pc") + 5).as("pc"))
    val expect = kept.unionByName(spawned)
      .groupBy("status").agg(count(lit(1)).as("n"), sum("pc").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = CurationOps.cdcApply(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    assert(got.contains("N"))
  }

  test("changeLegs: one-scan log equals the literal four-union change log") {
    val snap = CurationOps.cdcSnapshot(spark, dir)
      .withColumnRenamed("price_cents", "pc")
      .select(col("k"), col("status"), col("pc").as("price_cents"))
    def unionForm: org.apache.spark.sql.DataFrame = {
      val u1 = snap.where(pmod(col("k"), lit(9)) === 1)
        .select(col("k"), col("status"),
          (col("price_cents") + 111).as("price_cents"),
          lit(1L).as("seq"), lit("U").as("op"))
      val u2 = snap.where(pmod(col("k"), lit(9)) === 1)
        .select(col("k"), col("status"),
          (col("price_cents") + 222).as("price_cents"),
          lit(2L).as("seq"), lit("U").as("op"))
      val del = snap.where(pmod(col("k"), lit(9)) === 4)
        .select(col("k"), col("status"), col("price_cents"),
          lit(1L).as("seq"), lit("D").as("op"))
      val ins = snap.where(pmod(col("k"), lit(9)) === 7)
        .select((col("k") + 1000000000L).as("k"), lit("N").as("status"),
          (col("price_cents") + 5).as("price_cents"),
          lit(1L).as("seq"), lit("I").as("op"))
      u1.unionByName(u2).unionByName(del).unionByName(ins)
    }
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sorted.toSeq
    // legs only (ivm_agg / snapshot_diff form)
    assert(key(CurationOps.changeLegs(snap, withSnapshot = false)) ===
      key(unionForm))
    // with the snapshot riding along as the seq-0 insert leg (cdc_apply)
    val snapLeg = snap.select(col("k"), col("status"), col("price_cents"),
      lit(0L).as("seq"), lit("I").as("op"))
    assert(key(CurationOps.changeLegs(snap, withSnapshot = true)) ===
      key(unionForm.unionByName(snapLeg)))
    // names and types identical to the union form (nullability flags
    // differ: legs pass through `when(...)`, so the planner marks them
    // nullable — values are never null, as the row comparison above pins)
    assert(CurationOps.changeLegs(snap, withSnapshot = false).schema
      .map(f => (f.name, f.dataType)) ===
      unionForm.schema.map(f => (f.name, f.dataType)))
  }

  test("pad_efficiency: caps are powers of two and the slot algebra closes") {
    val rows = CurationOps.padEfficiency(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cap, nDocs, sumTok, padded, wasteBp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((cap & (cap - 1)) === 0L, s"cap $cap not a power of two")
      assert(cap <= 512L)
      assert(padded === cap * nDocs - sumTok, s"slot algebra broken at cap $cap")
      assert(wasteBp === (10000L * padded) / (cap * nDocs))
      // an unclamped bucket's docs all exceed cap/2, so waste < 50%
      if (cap < 512L) assert(wasteBp < 5000L, s"cap $cap waste $wasteBp bp")
    }
  }

  test("code_detect: rollup reconciles with a direct recount") {
    val direct = Tables.documents(spark, dir)
      .select(col("lang"), length(col("text")).cast("long").as("chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), """[{}();=<>\[\]#]""", "")))
          .cast("long").as("symbols"))
      .groupBy("lang").agg(sum("chars").as("c"), sum("symbols").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    CurationOps.codeDetect(spark, dir).collect().foreach { r =>
      val (lang, nDocs, nCodey, bp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (c, s) = direct(lang)
      assert(bp === (10000L * s) / math.max(c, 1L))
      assert(nCodey >= 0L && nCodey <= nDocs)
    }
  }

  test("hapax_rate: histogram identities hold per language") {
    CurationOps.hapaxRate(spark, dir).collect().foreach { r =>
      val (vocab, hapax, occ, bp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hapax <= vocab)
      assert(occ >= vocab) // every type occurs at least once
      assert(bp === (10000L * hapax) / vocab)
    }
  }

  test("tokenizer_fertility: every whitespace token yields >= 1 subword token") {
    CurationOps.tokenizerFertility(spark, dir).collect().foreach { r =>
      val (words, sub, fert) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(sub >= words, "BPE-ish matches cover every non-space char run")
      assert(fert >= 1000L)
    }
  }

  test("graph_modularity: bounds and edge accounting") {
    val r = LlmPipeline.graphModularity(spark, dir).head()
    val (m, intra, sumD2, qMilli) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(intra >= 0L && intra <= m)
    // sum of per-community degree sums is 2m, so Cauchy-Schwarz gives
    // sum_d2 >= (2m)^2 / n_langs; and Q <= 1 always
    assert(sumD2 >= (4L * m * m) / 5L)
    assert(qMilli === (1000L * (4L * m * intra - sumD2)) / (4L * m * m))
    assert(qMilli <= 1000L)
  }

  test("simhash_recall_audit: column arithmetic is self-consistent") {
    val r = LlmPipeline.simhashRecallAudit(spark, dir).head()
    val (nExact, nSim, nMissed, nExtra, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nMissed <= nExact)
    assert(nExtra <= nSim)
    // |sim ∩ exact| counted from either side agrees
    assert(nSim - nExtra === nExact - nMissed)
    assert(recall === (if (nExact == 0) 1000L
                       else (1000L * (nExact - nMissed)) / nExact))
  }

  test("dp_noisy_counts: noise bounded, clamped at zero, true counts private") {
    val trueCounts = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = CurationOps.dpNoisyCounts(spark, dir).collect()
    assert(rows.length === trueCounts.size)
    rows.foreach { r =>
      val (et, noisy, bound) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(bound === 5L)
      assert(noisy >= 0L, "non-negativity clamp")
      assert(math.abs(noisy - trueCounts(et)) <= bound,
        s"$et: |$noisy - ${trueCounts(et)}| exceeds ±$bound")
    }
    // the release must actually perturb at least one cell (else the seed
    // degenerated to all-zero noise and the query silently leaks true counts)
    assert(rows.exists(r => r.getLong(1) != trueCounts(r.getString(0))))
  }

  test("ann_recall_audit: hit algebra closes and LSH recall is high") {
    val r = LlmPipeline.annRecallAudit(spark, dir).head()
    val (nQ, nExact, nHits, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nQ > 0L)
    assert(nExact > 0L && nExact <= nQ * 10L)
    assert(nHits <= nExact, "hits are a subset of the exact top-k")
    assert(recall === (1000L * nHits) / nExact)
    assert(recall >= 900L, s"SRP-LSH recall $recall‰ below the 0.9 pin")
  }

  test("dedup_rate_by_source: every doc accounted, rate algebra closes") {
    val rows = LlmPipeline.dedupRateBySource(spark, dir).collect()
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === total,
      "per-source doc counts must partition the corpus")
    rows.foreach { r =>
      val (nDocs, nDup, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDup >= 0L && nDup <= nDocs)
      assert(bp === (10000L * nDup) / nDocs)
    }
  }

  test("mmrSelect: diversity beats an exact duplicate on a hand geometry") {
    // query is the id-min row (id 0, along x). id 1 and id 2 are exact
    // duplicates at rel 0.8; id 3 is orthogonal to them at rel 0.6.
    // pick1 = id 1 (rel tie broken by id). For pick 2:
    //   dup id 2: 0.7·0.8 − 0.3·1.0 = 0.26
    //   id 3:     0.7·0.6 − 0.3·0.0 = 0.42  → diversity wins
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(0.8f, 0.6f)), (3L, Seq(0.6f, -0.8f)),
    ).toDF("vec_id", "embedding")
    val got = VectorOps.mmrSelect(vecs, "vec_id", "embedding", k = 3,
      lambdaPct = 70).collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 3L, 2L))
    // 5e-3 tolerance: quantize() floors, so negative components land one
    // 1e-6 step low and cosines drift a few millionths off the hand values
    assert(math.abs(got(1).getDouble(2) - 0.42) < 5e-3)
    assert(math.abs(got(2).getDouble(2) - 0.26) < 5e-3)
  }

  test("mmr_rerank: k picks, distinct, scores non-increasing after pick 1") {
    val rows = LlmPipeline.mmrRerank(spark, dir).collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(1)).distinct.length === 8)
    val scores = rows.sortBy(_.getInt(0)).map(_.getDouble(2)).drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "greedy MMR scores must be non-increasing from pick 2 on")
  }

  test("gopher_rules: census partitions the corpus; pass + fails consistent") {
    val rows = CurationOps.gopherRules(spark, dir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, dir).count())
    assert(rows.map(_.getLong(7)).sum === 258L) // DuckDB-derived n_pass
    rows.foreach { r =>
      // a doc passing all rules cannot exceed docs minus the worst fail
      val fails = (2 to 6).map(r.getLong)
      assert(r.getLong(7) <= r.getLong(1) - fails.max,
        s"n_pass inconsistent with per-rule fails in ${r.getString(0)}")
    }
  }

  test("readability: run censuses exact; FK grade matches hand formula") {
    val rows = CurationOps.readability(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // DuckDB-derived at sf0.001; synthetic docs carry no [.!?], so the
    // 1-sentence floor binds everywhere (the floor device itself under test)
    assert(rows.head === (("de", 71L, 4070L, 71L, 5776L, 23512481L)))
    rows.foreach { case (_, _, w, s, y, fk) =>
      val hand = math.round(1e6 * (0.39 * w / s + 11.8 * y / w - 15.59))
      assert(fk === hand, "fk_grade_u must equal the formula on the totals")
    }
  }

  test("mcnemar: discordant cells + continuity-corrected statistic") {
    val r = CurationOps.mcnemarTest(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((500L, 95L, 72L, 2898204L)))
  }

  test("content_chunk_dedup: every doc chunks; dup algebra closes") {
    val rows = CurationOps.contentChunkDedup(spark, dir).collect()
    assert(rows.length === 20)
    val docs = Tables.documents(spark, dir).count()
    // ≥ 1 chunk per document (all corpus docs have tokens)
    assert(rows.map(_.getLong(1)).sum >= docs)
    rows.foreach { r =>
      val (n, d, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d >= 1 && d <= n)
      assert(bp === 10000 * (n - d) / n)
    }
  }

  test("mojibake_scan: clean synthetic corpus — zero damage, full census") {
    val rows = CurationOps.mojibakeScan(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(1))
      // occurrences can only be zero when no doc is flagged damaged
      if (r.getLong(2) + r.getLong(3) + r.getLong(4) === 0L)
        assert(r.getLong(5) === 0L)
    }
  }

  test("dim_truncation_audit: hit algebra closes; full-dim self-overlap sane") {
    val r = LlmPipeline.dimTruncationAudit(spark, dir).collect().head
    val (nq, nf, nh, pm) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(nf === nq * 10, "k=10 rows per query in the full leg")
    assert(nh <= nf && pm === 1000 * nh / nf)
    assert(pm > 0, "16 of 64 dims must retain SOME neighborhood signal")
  }

  test("dedup_threshold_sweep: monotone in the threshold; base row = pair frame") {
    val rows = LlmPipeline.dedupThresholdSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(500L, 600L, 700L, 800L, 900L))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3,
        "a stricter threshold cannot implicate more pairs or docs")
    }
    val basePairs = LlmPipeline.ngramJaccard(spark, dir).count()
    assert(rows.head._2 === basePairs, "t=0.5 row IS the memoized pair frame")
  }

  test("snapshot_diff: census reconciles with the mod-9 log construction") {
    val rows = CurationOps.snapshotDiff(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val snap = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def mod(k: Long, m: Long) = ((k % 9) + 9) % 9 == m
    val byStatus = snap.groupBy(_._2)
    rows.filter(_._1 != "N").foreach { case (st, added, removed, changed, unch) =>
      val ks = byStatus.getOrElse(st, Array.empty).map(_._1)
      assert(added === 0L, "only the synthetic 'N' status gains rows")
      assert(removed === ks.count(mod(_, 4)).toLong)
      assert(changed === ks.count(mod(_, 1)).toLong)
      assert(unch === ks.length - removed - changed)
    }
    val nRow = rows.find(_._1 == "N").get
    assert(nRow._2 === snap.count(e => mod(e._1, 7)).toLong)
    assert((nRow._3, nRow._4, nRow._5) === ((0L, 0L, 0L)))
  }

  test("ivm_agg: incremental delta algebra equals the full CDC recompute") {
    val inc = CurationOps.ivmAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = CurationOps.cdcApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full, "base ⊎ delta must equal re-aggregating the merged state")
  }

  test("late_data_audit: matches a sequential watermark replay") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"),
        graft.functions.PortableHash.h48(col("event_id").cast("string")) % 97)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val arrival = ev.sortBy { case (id, _, h) => (id / 100, h, id) }
    var hw = Long.MinValue
    val buckets = scala.collection.mutable.Map.empty[String, (Long, Long)]
    arrival.foreach { case (_, ts, _) =>
      val late = if (hw == Long.MinValue) 0L else math.max(hw - ts, 0L)
      val b = if (late == 0) "on_time"
      else if (late <= 60L * 1000000000L) "within_1m"
      else if (late <= 3600L * 1000000000L) "within_1h"
      else if (late <= 86400L * 1000000000L) "within_1d" else "later"
      val (n, mx) = buckets.getOrElse(b, (0L, 0L))
      buckets(b) = (n + 1, math.max(mx, late))
      hw = math.max(hw, ts)
    }
    val got = CurationOps.lateDataAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === buckets.toMap)
    assert(got.size > 1, "the interleave must actually produce late rows")
  }

  test("source_overlap_matrix: matches brute-force prefix-key recount") {
    val prefixes = Tables.documents(spark, dir)
      .select(col("source"), lower(col("text")).as("t")).collect()
      .map(r => (r.getString(0),
        r.getString(1).split("\\s+").filter(_.nonEmpty).take(8).mkString(" ")))
      .distinct
    val byKey = prefixes.groupBy(_._2).values
      .flatMap { g =>
        val ss = g.map(_._1).distinct.sorted
        for (i <- ss.indices; j <- (i + 1) until ss.length) yield (ss(i), ss(j))
      }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val got = CurationOps.sourceOverlapMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === byKey)
  }
}
