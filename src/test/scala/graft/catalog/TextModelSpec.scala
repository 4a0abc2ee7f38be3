package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[TextAnalysis.bigramNextToken]] and [[TextAnalysis.nbClassify]]
  * against driver-side brute force over the sf0.001 corpus — the
  * distributed shuffles must reproduce the textbook definitions exactly
  * (integer micro-unit scores included).
  */
class TextModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, Array[String])] =
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").filter(_.nonEmpty)))
      .toSeq

  test("bigram_next_token: matches brute-force bigram argmax") {
    val bigrams = docs().flatMap(d => d._3.sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val counts = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val outflow = counts.toSeq.groupBy(_._1._1)
      .map { case (p, vs) => p -> vs.map(_._2).sum }
    val top = outflow.toSeq.sortBy { case (p, t) => (-t, p) }.take(30)
    val expect = top.map { case (p, tot) =>
      val (nxt, n) = counts.collect { case ((`p`, b), n) => (b, n) }
        .toSeq.sortBy { case (b, n) => (-n, b) }.head
      (p, nxt, n, tot, math.round(1000000.0 * n / tot))
    }.toSet
    val rows = TextAnalysis.bigramNextToken(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(rows === expect)
  }

  test("nb_classify: matches brute-force multinomial naive Bayes") {
    val all = docs()
    val train = all.filter(_._1 % 5 != 0)
    val test = all.filter(_._1 % 5 == 0)
    val vocab = train.flatMap(_._3).distinct.size
    val nTrain = train.size
    val classTok = train.groupBy(_._2).map { case (c, ds) =>
      val toks = ds.flatMap(_._3)
      c -> (toks.size.toLong, ds.size,
        toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong })
    }
    val expect = test.map { case (id, lang, toks) =>
      val perDocTok = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val best = classTok.toSeq.map { case (c, (t, nd, cnts)) =>
        val prior = math.round(1000000.0 * math.log(nd.toDouble / nTrain))
        val s = perDocTok.map { case (tok, dc) =>
          dc * math.round(1000000.0 *
            math.log((cnts.getOrElse(tok, 0L) + 1.0) / (t + vocab)))
        }.sum
        (c, prior + s)
      }.sortBy { case (c, s) => (-s, c) }.head
      (id, lang, best._1, best._2)
    }.toSet
    val rows = TextAnalysis.nbClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(rows === expect)
  }

  test("bigram_accuracy: matches brute-force held-out top-1 hit rate") {
    val perDoc = docs().map(d => (d._1, d._3))
    val trainBg = perDoc.filter(_._1 % 5 != 0).flatMap(_._2.sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val model = trainBg.groupBy(_._1).map { case (p, vs) =>
      p -> vs.groupBy(_._2).map { case (b, v) => (b, v.size) }.toSeq
        .sortBy { case (b, n) => (-n, b) }.head._1
    }
    val testBg = perDoc.filter(_._1 % 5 == 0).flatMap(_._2.sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val hits = testBg.count { case (p, n) => model.get(p).contains(n) }
    val r = TextAnalysis.bigramAccuracy(spark, dir).head()
    assert(r.getLong(0) === testBg.size.toLong)
    assert(r.getLong(1) === hits.toLong)
    assert(r.getLong(2) === math.round(1000000.0 * hits / testBg.size))
  }

  test("nb_classify: one prediction per held-out doc, log-scores negative") {
    // note on accuracy: the synthetic corpus draws every lang's text from
    // ONE shared vocabulary, so `lang` is not text-derivable by design —
    // the operator's contract here is exact reproducibility of train +
    // inference (pinned above), not classification skill
    val rows = TextAnalysis.nbClassify(spark, dir).collect()
    val held = docs().count(_._1 % 5 == 0)
    assert(rows.length === held)
    assert(rows.map(_.getLong(0)).distinct.length === held)
    rows.foreach { r =>
      assert(r.getLong(3) < 0L, "a summed log-probability must be negative")
    }
  }
}
