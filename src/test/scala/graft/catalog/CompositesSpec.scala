package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CompositesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curation_funnel: stages are monotone and consistent with the parts") {
    val rows = Composites.curationFunnel(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // docs and tokens can only shrink through the gates
    for (s <- 1 to 3) {
      assert(rows(s.toLong)._2 <= rows(s - 1L)._2)
      assert(rows(s.toLong)._3 <= rows(s - 1L)._3)
    }
    // stage 0 is the raw corpus
    assert(rows(0L)._2 === Tables.documents(spark, dir).count())
    // packing neither drops nor invents docs or tokens
    assert(rows(4L)._2 === rows(3L)._2)
    assert(rows(4L)._3 === rows(3L)._3)
    // shard census present exactly at the packed stage
    for (s <- 0 to 3) assert(rows(s.toLong)._4 === 0L)
    assert(rows(4L)._4 >= 1L)
    // stage 1 pass count equals the standalone gopher_rules pass census
    val gopherPass = CurationOps.gopherRules(spark, dir)
      .agg(sum(col("n_pass"))).collect()(0).getLong(0)
    assert(rows(1L)._2 === gopherPass)
  }

  test("curation_funnel: exact-dedup stage equals distinct admitted content keys") {
    val d = CurationOps.gopherDocStats(Tables.documents(spark, dir))
      .where(CurationOps.gopherAdmit)
    val distinctKeys = d.select(col("content_key")).distinct().count()
    val rows = Composites.curationFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(2L) === distinctKeys)
  }

  test("active_learning_loop: roster grows by the batch each round") {
    val rows = Composites.activeLearningLoop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        // next round's labeled set = previous labeled + previous acquisition
        assert(b._2 === a._2 + a._3)
      case _ => ()
    }
    rows.foreach { r =>
      // a full batch is acquired while the pool is larger than the batch,
      // errors are bounded by the acquisition count, and each k=3 NN vote
      // margin lies in {0, 1, 3} (0 on a 1-1-1 label split)
      assert(r._3 >= 1L && r._3 <= 8L)
      assert(r._4 >= 0L && r._4 <= r._3)
      assert(r._5 >= 0L && r._5 <= 3L * r._3)
    }
  }

  test("retrieval_pipeline: picks are distinct, ordered and relevance-anchored") {
    val rows = Composites.retrievalPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, ps) =>
      // per query: contiguous pick orders from 1, no doc picked twice
      assert(ps.map(_._3).sorted.toSeq === (1L to ps.length.toLong))
      assert(ps.map(_._2).distinct.length === ps.length)
      // the first pick is pure relevance: max rel_u (doc-id tie-break),
      // and carries no MMR score; later picks do
      val p1 = ps.find(_._3 == 1L).get
      assert(p1._4 === ps.map(_._4).max)
      assert(p1._5.isEmpty)
      ps.filter(_._3 > 1L).foreach { p =>
        assert(p._5.nonEmpty)
        // mmr = (70·rel − 30·maxSim) div 100 with cosines in [−1, 1] micro
        assert(p._5.get <= (70L * p._4 + 30L * 1000000L) / 100L)
        assert(p._5.get >= (70L * p._4 - 30L * 1000000L) / 100L - 1L)
      }
      // cosine in micro units can never exceed 1.0
      assert(ps.forall(_._4 <= 1000000L))
    }
  }

  test("token_budget_pipeline: allocation and packing conserve") {
    val rows = Composites.tokenBudgetPipeline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, supply, alloc, nPicked, pickedTok, nShards) =>
      // picked tokens never exceed the allocation, which never exceeds
      // the source's own supply
      assert(pickedTok <= alloc && alloc <= supply)
      // a source that picked docs touches at least one shard, at most one
      // per doc
      if (nPicked > 0) assert(nShards >= 1L && nShards <= nPicked)
      else assert(nShards === 0L)
    }
    // the water level treats sources equally: every source either keeps
    // everything (alloc == supply) or sits at the common level
    val capped = rows.filter(r => r._3 < r._2).map(_._3)
    assert(capped.distinct.length <= 1)
    // global conservation: Σalloc ≤ budget = Σsupply div 2
    assert(rows.map(_._3).sum <= rows.map(_._2).sum / 2)
    // selection matches the standalone waterfill allocations row for row
    val wf = MixtureOps.waterfillBudget(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { r => assert(wf(r._1) === r._3) }
  }

  test("split_hygiene_pipeline: partition closes and removal matches decontaminate") {
    val rows = Composites.splitHygienePipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // folds partition the train slice: every row is −1 or 0..4, no dups
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall(r => r._1 >= -1L && r._1 < 5L))
    val nTrain = Tables.documents(spark, dir)
      .where(col("doc_id") % 97 =!= 0).count()
    assert(rows.map(_._2).sum === nTrain)
    // the removed row equals the standalone decontaminate census total
    val removed = rows.find(_._1 == -1L).map(_._2).getOrElse(0L)
    val decon = LlmPipeline.decontaminate(spark, dir)
      .agg(sum(col("n_contaminated"))).collect()(0).getLong(0)
    assert(removed === decon)
    // leaky docs only ever appear in real folds, bounded by the fold size
    rows.foreach { r =>
      if (r._1 == -1L) assert(r._4 === 0L)
      else assert(r._4 >= 0L && r._4 <= r._2)
    }
  }

  test("active_learning_loop: seed matches the audit-sample budget contract") {
    import graft.operators.VectorOps
    val emb = Tables.embeddings(spark, dir)
    val seedN = VectorOps.auditSample(emb, "vec_id", 10L).count()
    val first = Composites.activeLearningLoop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(first(1L) === seedN)
  }

  test("privacy_release_pipeline: census and noisy release match a replay") {
    val got = Composites.privacyReleasePipeline(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\d{3}-\\d{3}-\\d{4}".r
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val replay = docs.map { case (id, src, text) =>
      val aug = text +
        (if (id % 7 == 0) s" contact user$id@mail.example.com now" else "") +
        (if (id % 11 == 0) f" call 415-555-${id % 10000}%04d today" else "") +
        (if (id % 13 == 0) s" host ${id % 256}.0.2.${id % 100} up" else "")
      val nPii = email.findAllIn(aug).size + phone.findAllIn(aug).size +
        ip.findAllIn(aug).size
      val clean = ip.replaceAllIn(
        phone.replaceAllIn(
          email.replaceAllIn(aug, "[EMAIL]"), "[PHONE]"), "[IP]")
      (src, nPii, clean.length.toLong)
    }.groupBy(_._1)
    assert(got.keySet === replay.keySet)
    replay.foreach { case (src, rows) =>
      val piiDocs = rows.count(_._2 > 0).toLong
      val noisy = math.max(piiDocs + h48(s"43:$src") % 11 - 5, 0L)
      assert(got(src) === ((rows.length.toLong, rows.map(_._2.toLong).sum,
        rows.map(_._3).sum, noisy, 5L, "NONE_DETERMINISTIC_NOISE")),
        s"source $src")
    }
  }

  test("tokenizer_train_pipeline: fertility matches a pure-Scala BPE replay") {
    val got = Composites.tokenizerTrainPipeline(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent replay: learn rules with the operator (already pinned by
    // BpeMergesSpec), then re-apply them with plain Scala string folding
    val docs = Tables.documents(spark, dir)
    val trainFreq = docs.where(col("doc_id") % 2 === 0)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val rules = graft.operators.BpeMerges.learn(trainFreq, 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules.length === 6)
    def enc(w: String): Int = {
      val bracket = w.map(c => s"[$c]").mkString
      val merged = rules.foldLeft(bracket) { case (s, (l, r)) =>
        s.replace(s"[$l][$r]", s"[$l$r]")
      }
      merged.count(_ == '[')
    }
    val words = docs
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySource = words.groupBy(_._1)
    assert(got.keySet === bySource.keySet)
    bySource.foreach { case (src, ws) =>
      val nTypes = ws.length.toLong
      val nWords = ws.map(_._3).sum
      val nSym = ws.map(w => w._3 * enc(w._2)).sum
      assert(got(src) === ((nTypes, nWords, nSym, 1000L * nSym / nWords)),
        s"source $src")
    }
  }

  test("media_curation_pipeline: census matches the generative-form replay") {
    val rows = Composites.mediaCurationPipeline(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    // driver replay from the closed generative form (no Multimodal code)
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val replay = ids.map { id =>
      val w = 4 + id % 5; val h = 3 + id % 4; val len = 3 * w * h
      val sum = (0L until len).map(i => (id + i) % 251).sum
      val meanMilli = 1000 * sum / len
      val admit = w * h >= 20 && meanMilli >= 100000L && meanMilli <= 150000L
      (35 + len, admit)
    }
    assert(rows(0L)._1 === ids.length.toLong)
    assert(rows(0L)._2 === replay.map(_._1).sum)
    assert(rows(1L)._1 === replay.count(_._2).toLong)
    assert(rows(1L)._2 === replay.filter(_._2).map(_._1).sum)
    // both gate arms actually bite at this SF
    assert(rows(1L)._1 > 0L && rows(1L)._1 < rows(0L)._1)
    // packing conserves and produces shards
    assert(rows(2L)._1 === rows(1L)._1)
    assert(rows(2L)._2 === rows(1L)._2)
    assert(rows(2L)._3 >= 1L)
  }

  test("ann_index_refresh: algebra closes; prebuilt codebook = default path") {
    import graft.operators.VectorOps
    val r = Composites.annIndexRefresh(spark, dir).head()
    val emb = Tables.embeddings(spark, dir)
    assert(r.getLong(0) + r.getLong(1) === emb.count(), "base+delta = corpus")
    assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
    assert(r.getLong(5) <= r.getLong(4), "hits <= exact")
    assert(r.getLong(6) === 1000L * r.getLong(5) / r.getLong(4))
    // the new prebuilt-centroid parameter: passing the default seed set
    // explicitly must reproduce the default path rank-for-rank
    val q = VectorOps.auditSample(emb, "vec_id", 10L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(3))).toSet
    val dflt = rows(VectorOps.ivfTopK(emb, q, "vec_id", "embedding", 25, 5, 3))
    val pre = rows(VectorOps.ivfTopK(emb, q, "vec_id", "embedding", 25, 5, 3,
      centroids = Some(emb.where(col("vec_id") % 25 === 1))))
    assert(pre === dflt)
  }

  test("eval_protocol_pipeline: census, metric and CI match a driver replay") {
    import graft.functions.PortableHash
    import graft.operators.MinHashLsh
    val row = Composites.evalProtocolPipeline(spark, dir).head()
    val docs = Tables.documents(spark, dir)
    val pool = docs.filter(col("doc_id") % 97 === 0)
    assert(row.getLong(0) === pool.count())
    // compromised set, re-derived with a different join shape (distinct
    // train hash set inner-joined, no broadcast hint)
    val sh = MinHashLsh.explodeShingles(docs, "doc_id", "text", 8)
      .select(col("id"), PortableHash.h48(col("shingle")).as("hs"))
    val comp = sh.filter(col("id") % 97 === 0)
      .join(sh.filter(col("id") % 97 =!= 0).select(col("hs")).distinct(), "hs")
      .select(col("id")).distinct()
    assert(row.getLong(1) === comp.count())
    // at this SF every source's clean count is under the quota, so the
    // selection is exactly the clean pool — assert the precondition first
    val clean = pool.join(comp.withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
    val perSource = clean.groupBy(col("source")).count().collect()
    assert(perSource.forall(_.getLong(1) <= 20L), "precondition: quota binds")
    // correctness bits via the catalog's own deterministic classifier
    val graded = clean.select(col("doc_id"),
        when((TextAnalysis.classifierScore > 0) === (col("lang") === "en"), 1L)
          .otherwise(0L).as("correct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row.getLong(2) === graded.size.toLong)
    val nCorrect = graded.values.sum
    assert(row.getLong(3) === nCorrect)
    assert(row.getLong(4) ===
      (if (graded.isEmpty) 0L else 1000000L * nCorrect / graded.size))
    // full driver-side bootstrap replay: md5-based h48, the Poisson
    // inverse-CDF table, per-replicate weighted accuracy, rank-picks
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val pcdf = {
      var p = math.exp(-1.0); var cum = 0.0
      (0 to 8).map { k =>
        if (k > 0) p = p / k
        cum += p
        math.floor(cum * 1e6).toLong
      }
    }
    def wOf(u: Long): Long = {
      val i = pcdf.indexWhere(u < _)
      if (i < 0) 9L else i.toLong
    }
    val accs = (0 until 32).map { b =>
      var nw = 0L; var cw = 0L
      graded.foreach { case (id, c) =>
        val w = wOf(h48(s"$b:$id") % 1000000L)
        nw += w; cw += w * c
      }
      (b, if (nw == 0) 0L else 1000000L * cw / nw)
    }
    val sorted = accs.sortBy(t => (t._2, t._1))
    assert(row.getLong(5) === sorted(1)._2, "ci_lo = rank-2 replicate")
    assert(row.getLong(6) === sorted(30)._2, "ci_hi = rank-31 replicate")
    assert(row.getLong(7) === 32L)
  }
}
