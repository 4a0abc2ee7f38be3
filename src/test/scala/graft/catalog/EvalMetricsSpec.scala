package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[EvalMetrics]] readouts against independent brute-force
  * replicas on the sf0.001 corpus: the AUC rank-sum against O(P·N) pair
  * enumeration, confusion/kappa/chi² against driver-side recounts, and
  * the lagged ACF against a BigInt series replay — exact equality
  * everywhere, never tolerance.
  */
class EvalMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (score, pos) per document, collected once for the replicas. */
  private lazy val docs: Array[(Long, Boolean)] =
    graft.core.Tables.documents(spark, dir)
      .select(TextAnalysis.classifierScore, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("auc_rank: equals the O(P*N) pair-enumeration AUC") {
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    // 2 per concordant pair, 1 per tied pair
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val den2 = 2L * pos.length * neg.length
    val got = EvalMetrics.aucRank(spark, dir).head()
    assert(got.getLong(0) === pos.length.toLong)
    assert(got.getLong(1) === neg.length.toLong)
    assert(got.getLong(2) === num2)
    assert(got.getLong(3) === den2)
    assert(got.getLong(4) === (BigInt(10000) * num2 / den2).toLong)
    // the score must actually separate: a degenerate 0.5 AUC would make
    // this whole eval family vacuous on the corpus
    assert(got.getLong(4) !== 5000L)
  }

  test("eval_confusion: counters and F1 match a driver-side recount") {
    val tp = docs.count(d => d._2 && d._1 > 0).toLong
    val fp = docs.count(d => !d._2 && d._1 > 0).toLong
    val fn = docs.count(d => d._2 && d._1 <= 0).toLong
    val tn = docs.count(d => !d._2 && d._1 <= 0).toLong
    val got = EvalMetrics.evalConfusion(spark, dir).head()
    assert(got.getLong(0) === docs.length.toLong)
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      === ((tp, fp, fn, tn)))
    assert(got.getLong(5) === (if (tp + fp == 0) 0L else 10000 * tp / (tp + fp)))
    assert(got.getLong(6) === (if (tp + fn == 0) 0L else 10000 * tp / (tp + fn)))
    assert(got.getLong(7) ===
      (if (2 * tp + fp + fn == 0) 0L else 20000 * tp / (2 * tp + fp + fn)))
  }

  test("calibration_bins: bins partition the corpus and recount exactly") {
    val rows = EvalMetrics.calibrationBins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).sum === docs.length.toLong)
    // Scala `/` on Long truncates toward zero — same as Spark `div`
    val expect = docs.groupBy(d => d._1 / 500L).map { case (b, ds) =>
      b -> (ds.length.toLong, ds.count(_._2).toLong, ds.map(_._1).sum)
    }
    rows.foreach { case (b, n, np, rateBp, meanMilli) =>
      val (en, enp, esum) = expect(b)
      assert(n === en && np === enp, s"bin $b counts")
      assert(rateBp === 10000 * enp / en, s"bin $b rate")
      assert(meanMilli === 1000 * esum / en, s"bin $b mean")
    }
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("chi2_tokens: top-k set and scores match brute force over all tokens") {
    val tokDocs = graft.core.Tables.documents(spark, dir)
      .select(col("lang") === "en",
        array_distinct(graft.functions.TextFns.tokens(lower(col("text")))))
      .collect().map(r => (r.getBoolean(0), r.getSeq[String](1).toSet))
    val p = tokDocs.count(_._1).toLong
    val nAll = tokDocs.length.toLong - p
    val perTok = tokDocs.flatMap { case (pos, ts) => ts.map(_ -> pos) }
      .groupBy(_._1).map { case (t, xs) =>
        (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
      }
    def chi2(a: Long, b: Long): Long = {
      val (c, d) = (p - a, nAll - b)
      val den = BigInt(a + b) * (c + d) * p * nAll
      if (den == 0) 0L
      else {
        val adbc = BigInt(a) * d - BigInt(b) * c
        (BigInt(1000) * (p + nAll) * adbc * adbc / den).toLong
      }
    }
    val expect = perTok.toSeq.map { case (t, a, b) => (t, a, b, chi2(a, b)) }
      .sortBy { case (t, _, _, s) => (-s, t) }.take(20)
    val got = EvalMetrics.chi2Tokens(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("cohen_kappa: equals the BigInt cross-multiplied replica") {
    val pairs = graft.core.Tables.documents(spark, dir)
      .select(TextAnalysis.classifierScore > 0, col("n_chars") >= 300L)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val a = pairs.count(x => x._1 && x._2).toLong
    val b = pairs.count(x => x._1 && !x._2).toLong
    val c = pairs.count(x => !x._1 && x._2).toLong
    val d = pairs.count(x => !x._1 && !x._2).toLong
    val n = BigInt(a + b + c + d)
    val pe = BigInt(a + b) * (a + c) + BigInt(c + d) * (b + d)
    val expected =
      if (n * n - pe == 0) 0L
      else (BigInt(10000) * (n * (a + d) - pe) / (n * n - pe)).toLong
    val got = EvalMetrics.cohenKappa(spark, dir).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((a, b, c, d)))
    assert(got.getLong(4) === (a + b + c + d))
    assert(got.getLong(5) === expected)
  }

  test("ndcg_eval: per-query NDCG matches a driver-side replay of the ranking") {
    // independent replay: collect the ranked lists and doc/query term sets,
    // re-grade relevance, and recompute DCG/IDCG with the same discounts
    val ranked = graft.catalog.LlmPipeline.bm25TopK(spark, dir) // warms shared index
    assert(ranked.count() > 0)
    val docTerms = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(graft.functions.TextFns.tokens(col("text"))))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // the audit batch modulus: greatest(n div budget, 1) with budget = 8
    // (the auditSample contract ndcg_eval uses)
    val ndcgMod = math.max(docTerms.size.toLong / 8L, 1L)
    val qTerms = docTerms.collect {
      case (id, ts) if id % ndcgMod == 0 =>
        id -> graft.core.Tables.documents(spark, dir)
          .filter(col("doc_id") === id)
          .select(array_distinct(slice(graft.functions.TextFns.tokens(col("text")), 1, 5)))
          .head().getSeq[String](0).toSet
    }
    val disc = (1 to 10).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val got = EvalMetrics.ndcgEval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // recompute from the ndcg query's own ranking (k=10): rebuild it via the
    // same operator to get (query_id, doc_id, rank) rows
    val ranked10 = {
      val docs = graft.core.Tables.documents(spark, dir)
      val queries = docs.filter(col("doc_id") % ndcgMod === 0)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(slice(
            graft.functions.TextFns.tokens(col("text")), 1, 5))).as("term"))
      graft.operators.Bm25.topK(docs, queries, 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    }
    val byQuery = ranked10.groupBy(_._1)
    assert(got.length === byQuery.size)
    got.foreach { case (q, totalGain, dcg, idcg, bp) =>
      val rows = byQuery(q).map { case (_, d, rk) =>
        val rel = (docTerms(d) & qTerms(q)).size
        ((1L << rel) - 1, rk)
      }
      val expDcg = rows.map { case (g, rk) => g * disc(rk - 1) }.sum
      val expIdcg = rows.map(_._1).sortBy(-_).zipWithIndex
        .map { case (g, i) => g * disc(i) }.sum
      assert(totalGain === rows.map(_._1).sum, s"query $q gain")
      assert(dcg === expDcg, s"query $q dcg")
      assert(idcg === expIdcg, s"query $q idcg")
      assert(bp === (if (expIdcg == 0) 0L else 10000L * expDcg / expIdcg))
    }
  }

  test("gini_concentration: equals the BigInt rank-formula replica") {
    val xs = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(r => r.getLong(1)).sorted
    val n = BigInt(xs.length)
    val s = xs.map(BigInt(_)).sum
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = (BigInt(10000) * (2 * six - (n + 1) * s) / (n * s)).toLong
    val got = EvalMetrics.giniConcentration(spark, dir).head()
    assert(got.getLong(0) === xs.length.toLong)
    assert(got.getLong(1) === xs.map(BigInt(_)).sum.toLong)
    assert(got.getLong(2) === expected)
    // sanity: a revenue distribution is concentrated but not degenerate
    assert(got.getLong(2) > 0 && got.getLong(2) < 10000)
  }

  test("bootstrap_ci: equals a full driver-side Poisson-bootstrap replay") {
    def h48(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val P = 2147483647L
    val cdf = {
      var p = math.exp(-1.0); var cum = 0.0
      (0 to 8).map { k => if (k > 0) p = p / k; cum += p; math.floor(cum * P.toDouble).toLong }
    }
    def pois(u: Long): Long = {
      val i = cdf.indexWhere(u < _)
      if (i < 0) 9L else i.toLong
    }
    // the perm family, re-derived independently of EvalMetrics' constants
    val permA = (0 until 32).map(b => (h48(s"boot:a:$b") % (1L << 31)) | 1L)
    val permB = (0 until 32).map(b => h48(s"boot:b:$b") % P)
    val orders = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (0 until 32).map { b =>
      var nw = BigInt(0); var sw = BigInt(0)
      orders.foreach { case (k, c) =>
        val h32 = h48(s"$k") >>> 16
        val w = pois((permA(b) * h32 + permB(b)) % P)
        nw += w; sw += BigInt(w) * c
      }
      if (nw == 0) 0L else (BigInt(1000) * sw / nw).toLong
    }.sorted
    val got = EvalMetrics.bootstrapCi(spark, dir).head()
    val s = orders.map(o => BigInt(o._2)).sum
    assert(got.getLong(0) === orders.length.toLong)
    assert(got.getLong(1) === (BigInt(1000) * s / orders.length).toLong)
    assert(got.getLong(2) === means(1))  // rank 2 of 32, ascending
    assert(got.getLong(3) === means(30)) // rank 31 of 32
    assert(got.getLong(4) === 32L)
    // the interval must bracket the point estimate on this corpus
    assert(got.getLong(2) <= got.getLong(1) && got.getLong(1) <= got.getLong(3))
    assert(got.getLong(2) < got.getLong(3))
  }

  test("chi2_drift: equals the BigInt per-cell replica") {
    val rows = graft.core.Tables.orders(spark, dir)
      .select(year(col("o_orderdate").cast("timestamp")), col("o_orderpriority"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
      .filter(r => r._1 == 1995 || r._1 == 1996)
    val cells = rows.groupBy(_._2).map { case (p, xs) =>
      (p, xs.count(_._1 == 1995).toLong, xs.count(_._1 == 1996).toLong)
    }.toSeq
    val ra = cells.map(_._2).sum; val rb = cells.map(_._3).sum
    val n = BigInt(ra + rb)
    val chi2 = cells.map { case (_, oa, ob) =>
      val cj = BigInt(oa + ob)
      val da = BigInt(oa) * n - BigInt(ra) * cj
      val db = BigInt(ob) * n - BigInt(rb) * cj
      (BigInt(1000) * da * da) / (n * ra * cj) +
        (BigInt(1000) * db * db) / (n * rb * cj)
    }.sum.toLong
    val got = EvalMetrics.chi2Drift(spark, dir).head()
    assert(got.getLong(0) === ra)
    assert(got.getLong(1) === rb)
    assert(got.getLong(2) === cells.length.toLong)
    assert(got.getLong(3) === cells.length.toLong - 1)
    assert(got.getLong(4) === chi2)
  }

  test("acf_daily: equals the BigInt series replay, and lags are 1..7") {
    val daily = graft.core.Tables.orders(spark, dir)
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (day, xs) => (day, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1).map(_._2).map(BigInt(_))
    val n = BigInt(daily.length)
    val s = daily.sum
    val den = daily.map(x => (x * n - s) * (x * n - s)).sum
    def acf(k: Int): Long = {
      val num = daily.indices.dropRight(k)
        .map(t => (daily(t) * n - s) * (daily(t + k) * n - s)).sum
      if (den == 0) 0L else (BigInt(1000) * num / den).toLong
    }
    val got = EvalMetrics.acfDaily(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (1L to 7L))
    got.foreach { case (lag, nDays, milli) =>
      assert(nDays === daily.length.toLong)
      assert(milli === acf(lag.toInt), s"lag $lag")
    }
  }

  test("lift_table: full-corpus cutoff has lift exactly 1000; cum monotone") {
    val rows = EvalMetrics.liftTable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(-_._1)
    // cum columns must be running sums in score-desc order
    assert(rows.map(_._2).sum === rows.last._4)
    assert(rows.map(_._3).sum === rows.last._5)
    rows.indices.drop(1).foreach { i =>
      assert(rows(i)._4 === rows(i - 1)._4 + rows(i)._2)
      assert(rows(i)._5 === rows(i - 1)._5 + rows(i)._3)
    }
    // keeping everything = base rate (milli cross-multiply is exact here)
    val (_, _, _, cumN, cumPos, lift) = rows.last
    assert(lift === 1000L * cumPos * cumN / (cumN * cumPos))
    assert(lift === 1000L)
    // every cutoff's lift recomputes from its own cumulative cells (the
    // curve itself need not be monotone for a miscalibrated scorer —
    // sf0.001's top cell genuinely under-enriches, and that's the point
    // of publishing the table)
    rows.foreach { case (_, _, _, cn, cp, l) =>
      assert(l === 1000L * cp * cumN / (cn * cumPos))
    }
  }

  test("mrr_eval: algebra closes and first hits respect the k-cut") {
    val r = EvalMetrics.mrrEval(spark, dir).collect().head
    val (nq, hit, rrSum, mrr) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(hit <= nq && mrr === rrSum / nq)
    // each hit contributes 1e6/rank with rank in [1, 10]
    assert(rrSum >= hit * 100000L && rrSum <= hit * 1000000L)
    assert(nq > 50, "the fixed audit budget must yield a real batch")
  }

  test("hill_tail: matches driver-side recompute over the top order stats") {
    val cents = graft.core.Tables.events(spark, dir)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val top = cents.take(201)
    val ref = top.last
    val lnU = top.filter(_ > ref)
      .map(x => math.round(1e6 * math.log(x.toDouble / ref)))
    val r = Analytics.hillTail(spark, dir).collect().head
    assert(r.getLong(0) === lnU.length.toLong)
    assert(r.getLong(1) === ref)
    assert(r.getLong(2) === lnU.sum)
    assert(r.getLong(3) === lnU.sum / lnU.length)
  }

  test("seasonality_strength: matches driver moments; bounded in [0, 1e6]") {
    val daily = graft.core.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = BigInt(daily.length)
    val s = daily.map(d => BigInt(d._2)).sum
    val q = daily.map(d => BigInt(d._2) * d._2).sum
    val ssbRaw = daily.groupBy(_._1 % 7).values.map { g =>
      val sw = g.map(d => BigInt(d._2)).sum
      sw * sw / g.length
    }.sum
    val hand = (BigInt(1000000) * (ssbRaw - s * s / n) / (q - s * s / n)).toLong
    val r = Analytics.seasonalityStrength(spark, dir).collect().head
    assert(r.getLong(0) === daily.length.toLong)
    assert(r.getLong(1) === hand)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= 1000000L)
  }

  test("pass_at_k: matches the exact combinatorial estimator; monotone in k") {
    val tasks = graft.core.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase" && col("value") >= 150.0)
          .cast("long")).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def passU(n: Long, c: Long, k: Long): Long = {
      val num = (0L until k).map(i => n - c - i).product
      val den = (0L until k).map(i => n - i).product
      1000000L - 1000000L * num / den
    }
    val got = EvalMetrics.passAtK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 5L))
    got.foreach { case (k, nTasks, mean) =>
      val eligible = tasks.filter(_._1 >= k)
      assert(nTasks === eligible.length.toLong)
      assert(mean === eligible.map { case (n, c) => passU(n, c, k) }.sum
        / eligible.length)
    }
    // pass@k is non-decreasing in k for every task, hence for the mean
    assert(got(0)._3 <= got(1)._3 && got(1)._3 <= got(2)._3)
  }

  test("mase_eval: matches brute-force lag series on daily totals") {
    val daily = graft.core.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    def sae(lag: Int) =
      (lag until daily.length).map(i => math.abs(daily(i) - daily(i - lag)))
        .map(BigInt(_)).sum
    val r = EvalMetrics.maseEval(spark, dir).collect().head
    assert(r.getLong(0) === sae(7).toLong)
    assert(r.getLong(1) === (daily.length - 7).toLong)
    assert(r.getLong(2) === sae(1).toLong)
    assert(r.getLong(3) === (daily.length - 1).toLong)
    assert(BigInt(r.getLong(4)) ===
      1000 * sae(7) * (daily.length - 1) / (sae(1) * (daily.length - 7)))
  }
}
