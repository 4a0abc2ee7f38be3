package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class TrainingOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("psi_drift: contributions are sign-correct and totals conserve") {
    val rows = TrainingOps.psiDrift(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ne = rows.map(_.getLong(1)).sum
    val na = rows.map(_.getLong(2)).sum
    // every event lands in exactly one (bin, period) cell
    assert(ne + na === Tables.events(spark, dir).count())
    rows.foreach { r =>
      // (pa-pe) and ln(pa/pe) share a sign (ln is monotone), so each
      // bin's contribution is ≥ 0 up to the micro-rounding grain
      assert(r.getLong(3) >= -1L)
    }
  }

  test("stratified_kfold: fold sizes within each label differ by ≤ 1") {
    val rows = TrainingOps.stratifiedKfold(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val perLabel = rows.groupBy(_._1)
    perLabel.foreach { case (_, fs) =>
      assert(fs.length === 5)
      val ns = fs.map(_._3)
      assert(ns.max - ns.min <= 1)
    }
    // membership closes: fold id-sums add up to the label's full id-sum
    val want = Tables.embeddings(spark, dir).groupBy(col("label"))
      .agg(sum(col("vec_id")).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    perLabel.foreach { case (l, fs) =>
      assert(fs.map(_._4).sum === want(l))
    }
  }

  test("ngram_novelty matches a brute-force replay of the definition") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val grams = docs.flatMap { case (id, t) =>
      val tk = t.split(" ")
      tk.sliding(5).filter(_.length == 5).map(g => (id, g.mkString(" ")))
        .toSeq.distinct
    }
    val firstDoc = grams.groupBy(_._2).map { case (g, xs) =>
      g -> xs.map(_._1).min
    }
    val want = grams.groupBy(_._1).map { case (id, xs) =>
      val novel = xs.count(x => firstDoc(x._2) == id)
      id -> ((xs.length.toLong, novel.toLong, 1000L * novel / xs.length))
    }
    val got = TrainingOps.ngramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
  }

  test("label_noise_audit: a planted wrong-label point is flagged suspect") {
    // tight blob of label 0 with one label-9 plant at an audited id (id%10=0)
    val emb = (0L to 20L).map { i =>
      val lbl = if (i == 10L) 9 else 0
      (i, Array(1.0f, 0.001f * i), lbl)
    }.toDF("vec_id", "embedding", "label")
    val got = graft.operators.VectorOps.bruteForceTopK(
      emb, emb.where(col("vec_id") === 10L), "vec_id", "embedding", 10)
    assert(got.count() === 10L) // audit machinery sanity
    val rows = TrainingOps.labelNoiseAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val suspect = r.getInt(4)
      val own = r.getInt(1); val maj = r.getInt(2); val votes = r.getLong(3)
      assert(suspect === (if (own != maj && votes >= 6) 1 else 0))
    }
  }

  test("bradley_terry: a dominant type outranks the dominated on a hand corpus") {
    // strengths over the real corpus: conservation and determinism
    val rows = TrainingOps.bradleyTerry(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val k = rows.length
    val total = rows.map(_._4).sum
    // renormalization pins Σs to k·M up to k truncations per round
    assert(math.abs(total - k * 1000000L) <= 8L * k)
    // more wins per game must not be outranked by strictly fewer: check the
    // extreme pair (best win-rate vs worst) — monotone in the MM fit
    val byRate = rows.sortBy(r => -(r._2.toDouble / r._3))
    assert(byRate.head._4 >= byRate.last._4)
    // deterministic
    val again = TrainingOps.bradleyTerry(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("span_corruption: span algebra closes and the mask rate is ~15%") {
    val rows = TrainingOps.spanCorruption(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length.toLong === Tables.documents(spark, dir).count())
    rows.foreach { case (_, nTok, nMask, nSpans) =>
      // each masked span contributes 1..SpanLen masked tokens
      assert(nMask >= nSpans && nMask <= nSpans * 3)
      assert(nMask <= nTok)
    }
    val tokTotal = rows.map(_._2).sum
    val maskTotal = rows.map(_._3).sum
    assert(maskTotal * 1000 / tokTotal >= 100L &&
      maskTotal * 1000 / tokTotal <= 200L)
  }

  test("multi_epoch_schedule: allocation algebra closes per source") {
    val rows = TrainingOps.multiEpochSchedule(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avail, target, epochs, alloc, short) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(epochs === math.min(4L, (target + avail - 1) / avail))
      assert(alloc === math.min(target, epochs * avail))
      assert(short === target - alloc && short >= 0)
      // a shortfall can only arise at the epoch cap
      if (short > 0) assert(epochs === 4L)
    }
  }

  test("fleiss_kappa matches a driver-side replay of the three raters") {
    val docs = Tables.documents(spark, dir).select(col("text")).collect()
      .map(_.getString(0))
    val n1s = docs.map { t =>
      val tk = t.split(" ")
      val n = tk.length.toLong
      val nd = tk.distinct.length.toLong
      val stp = tk.count(Set("the", "a", "of", "to", "in")).toLong
      (if (n >= 55) 1 else 0) + (if (1000 * nd / n >= 550) 1 else 0) +
        (if (1000 * stp / n >= 60) 1 else 0)
    }
    val nItems = n1s.length.toLong
    val s1 = n1s.map(_.toLong).sum
    val agree = n1s.map(v => v.toLong * (v - 1) + (3L - v) * (2L - v)).sum
    val pBar = agree / (6e0 * nItems)
    val p1 = s1 / (3e0 * nItems)
    val pE = p1 * p1 + (1e0 - p1) * (1e0 - p1)
    val r = TrainingOps.fleissKappa(spark, dir).head()
    assert(r.getLong(0) === nItems && r.getLong(1) === s1)
    assert(r.getLong(2) === math.round(1e6 * pBar))
    assert(r.getLong(3) === math.round(1e6 * pE))
    assert(r.getLong(4) === math.round(1e6 * (pBar - pE) / (1e0 - pE)))
  }

  test("leakage_audit: overlap is bounded and the user census closes") {
    val rows = TrainingOps.leakageAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    val distinctUsers = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (t, tr, te, ov) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ov <= math.min(tr, te))
      // every user is in train, test or both: |train ∪ test| = tr+te−ov
      assert(tr + te - ov === distinctUsers(t))
    }
  }

  test("target_encode_oof: encoding excludes exactly the row's own fold") {
    val ev = Tables.events(spark, dir).select(col("event_type"),
        col("event_id"), expr("CAST(round(value * 100e0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def fold(id: Long): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md5.take(6).map(b => f"$b%02x").mkString, 16)
      (h % 5).toInt
    }
    val got = TrainingOps.targetEncodeOof(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val byType = ev.groupBy(_._1)
    byType.foreach { case (t, xs) =>
      val byFold = xs.groupBy(e => fold(e._2))
      val nT = xs.length.toLong
      val sT = xs.map(_._3).sum
      byFold.foreach { case (f, fs) =>
        val (n, oof) = got((t, f))
        assert(n === fs.length.toLong)
        assert(oof === (sT - fs.map(_._3).sum) / math.max(nT - n, 1L))
      }
    }
  }

  test("recency_weights: newest week at full mass, weights halve by week") {
    val rows = TrainingOps.recencyWeights(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, wSum, wMean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(wMean <= 1000000L && wMean >= 0L)
      assert(wSum <= n * 1000000L)
      assert(wMean === wSum / n)
    }
  }

  test("conformal_interval: q95 covers ≥95% of calibration by construction") {
    val rows = TrainingOps.conformalInterval(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir).select(col("event_type"),
        col("event_id"), expr("CAST(round(value * 100e0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (t, nCal, center, q95) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val cal = ev.filter(e => e._1 == t && e._2 % 2 == 0).map(_._3)
      assert(cal.length.toLong === nCal)
      assert(center === cal.sum / cal.length) // truncating mean
      val within = cal.count(c => math.abs(c - center) <= q95)
      assert(within * 100 >= cal.length * 95)
      // and q95 is the SMALLEST such residual (tight, not just valid)
      val below = cal.count(c => math.abs(c - center) <= q95 - 1)
      assert(below.toLong < (nCal * 95 + 99) / 100)
    }
  }

  test("brier_score: per-cell squared-error algebra closes") {
    val rows = TrainingOps.brierScore(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val (p, n, nPos, sumSq, brierU) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val pm = p * 100
      // sq per row depends only on (p_deci, y): negatives pm², positives (1000−pm)²
      assert(sumSq === (n - nPos) * pm * pm + nPos * (1000 - pm) * (1000 - pm))
      assert(brierU === sumSq / n)
    }
  }

  test("ips_policy_eval: estimates recompute from per-type counts; ESS ≤ N") {
    val r = TrainingOps.ipsPolicyEval(spark, dir).collect().head
    val (n, k, naive, ips, ess) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    val perType = Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).map { case (_, es) => (es.length.toLong, es.map(_._2).sum) }
      .toSeq
    assert(k === perType.length.toLong)
    assert(n === perType.map(_._1).sum)
    assert(naive === 1000000L * perType.map(_._2).sum / n)
    assert(ips === perType.map { case (na, sa) => 1000000L * sa / (k * na) }.sum)
    assert(ess <= 1000L * n, "effective sample size cannot exceed N")
    val handEss = math.round(1000.0 * k * k /
      perType.map { case (na, _) => 1.0 / na }.sum)
    assert(ess === handEss)
  }

  test("cluster_prune: cluster sizes partition the corpus; purity consistent") {
    val rows = TrainingOps.clusterPrune(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      val (purity, kept) = (r.getLong(3), r.getLong(4))
      assert(purity > 0 && purity <= 10000)
      assert(kept === (if (purity >= 2500) 1L else 0L))
    }
  }

  test("curriculum_order: round-robin deal — shard counts differ by ≤1") {
    val rows = TrainingOps.curriculumOrder(spark, dir).collect()
    assert(rows.length === 8)
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, "rank mod S must deal evenly")
    assert(ns.sum === Tables.documents(spark, dir).count())
    val total = Tables.documents(spark, dir)
      .agg(sum(col("doc_id"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === total, "id sums must partition")
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(5)))
  }

  test("rolling_origin_cv: train grows with origin; warm+cold = test users") {
    val rows = TrainingOps.rollingOriginCv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(40L, 60L, 80L))
    // a later origin can only see MORE training history
    assert(rows(0)._2 < rows(1)._2 && rows(1)._2 < rows(2)._2)
    // warm/cold recount from raw events per origin
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    rows.foreach { case (pct, _, _, _, warm, cold) =>
      val t = d0 + (d1 - d0) * pct / 100
      val testUsers = ev.filter(e => e._2 >= t && e._2 < t + 5).map(_._1).toSet
      val trainUsers = ev.filter(_._2 < t).map(_._1).toSet
      assert(warm === (testUsers & trainUsers).size.toLong)
      assert(cold === (testUsers -- trainUsers).size.toLong)
    }
  }

  test("uplift_by_segment: arms partition users; uplift recomputes from cells") {
    val rows = Analytics.upliftBySegment(spark, dir).collect()
    assert(rows.length === 3)
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum === users)
    rows.foreach { r =>
      val (ut, ct, uc, cc, bp) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(ct <= ut && cc <= uc)
      assert(bp === 10000 * ct / math.max(ut, 1) - 10000 * cc / math.max(uc, 1))
    }
  }

  test("novel_user_rate: day-1 all new; new totals equal the user census") {
    val rows = Analytics.novelUserRate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.head._3 === rows.head._2, "every first-day active is new")
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum === users,
      "each user is new exactly once across all days")
    rows.foreach { case (_, act, nw, ret, pm) =>
      assert(nw + ret === act)
      assert(pm === 1000 * nw / act)
    }
  }

  test("inter_event_time_dist: gap count = events − users; buckets log2") {
    val rows = Analytics.interEventTimeDist(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val events = Tables.events(spark, dir).count()
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum === events - users,
      "every user contributes exactly (their events − 1) gaps")
    assert(rows.forall(_._1 >= 0))
  }

  test("cluster_medoids: each medoid maximizes its cluster's similarity sum") {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x * 1e6).toLong).toArray).toMap
    val assign = LlmPipeline.kmeansCluster(spark, dir)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def cosU(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      math.round(1e6 * dot /
        (math.sqrt(a.map(x => x * x).sum.toDouble) *
          math.sqrt(b.map(x => x * x).sum.toDouble)))
    }
    val byCluster = assign.groupBy(_._2)
    val expect = byCluster.map { case (cl, members) =>
      val ids = members.map(_._1)
      val best = ids.map { a =>
        (a, ids.filter(_ != a).map(b => cosU(vecs(a), vecs(b))).sum)
      }.maxBy { case (a, s) => (s, -a) }
      (cl, best._1, ids.length.toLong, best._2 / (ids.length - 1))
    }.toSet
    val got = TrainingOps.clusterMedoids(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
  }

  test("prop_ztest: z recomputes from the exact arm cells") {
    val r = Analytics.propZtest(spark, dir).collect().head
    val (nt, ct, nc, cc, z) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(ct <= nt && cc <= nc && nt > 0 && nc > 0)
    if (ct + cc > 0 && ct + cc < nt + nc) {
      val p = (ct + cc).toDouble / (nt + nc)
      val hand = math.round(1000.0 * (ct.toDouble / nt - cc.toDouble / nc) /
        math.sqrt(p * (1 - p) * (1.0 / nt + 1.0 / nc)))
      assert(z === hand)
    } else assert(z === 0L)
  }

  test("sprt_monitor: cumulative LLR recomputes; decisions respect the bands") {
    val rows = Analytics.sprtMonitor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1)
    val bound = math.round(1e6 * math.log(19.0))
    var (cumC, cumM) = (0L, 0L)
    rows.foreach { case (_, n, c, llr, dec) =>
      cumC += c; cumM += n - c
      val hand = math.round(1e6 *
        (cumC * math.log(0.12 / 0.10) + cumM * math.log(0.88 / 0.90)))
      assert(llr === hand)
      val expDec = if (llr >= bound) "reject_h0"
      else if (llr <= -bound) "accept_h0" else "continue"
      assert(dec === expDec)
    }
  }

  test("quant_error_audit: distortion non-negative, mean ≤ max, all labels") {
    val rows = TrainingOps.quantErrorAudit(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(3))
      // int8 over 64 dims distorts cosine by well under 1%
      assert(r.getLong(3) < 10000L, s"int8 distortion implausibly large: $r")
    }
  }
}
