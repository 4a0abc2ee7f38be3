package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("MinHash-LSH finds a planted near-duplicate and reports exact Jaccard") {
    val docs = Seq(
      (0L, base),
      (1L, base + " x"), // one extra token → high but <1 Jaccard
      (2L, "completely different words entirely unrelated content here now then"),
    ).toDF("doc_id", "text")
    val out = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, j) = out.head
    assert((a, b) == (0L, 1L))
    // exact Jaccard of the 3-shingle sets, rounded to 6 decimals in output
    assert(math.abs(j - 11.0 / 12.0) < 1e-6)
  }

  test("identical token sequences get identical signatures (Jaccard 1.0)") {
    val docs = Seq((0L, base), (1L, base.replace(" ", "   "))).toDF("doc_id", "text")
    val out = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 3, 0.99).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("signatures are deterministic across runs") {
    val docs = Seq((0L, base)).toDF("doc_id", "text")
    def sig() = MinHashLsh.signatures(
      MinHashLsh.explodeShingles(docs, "doc_id", "text", 3)).head().toSeq
    assert(sig() == sig())
  }

  test("LSH candidates never include docs sharing no shingle (precision of buckets)") {
    val rnd = new Random(11)
    val vocabA = (0 until 30).map(i => s"a$i")
    val vocabB = (0 until 30).map(i => s"b$i")
    def doc(v: Seq[String]) = (1 to 20).map(_ => v(rnd.nextInt(v.size))).mkString(" ")
    val docs = ((0 until 5).map(i => (i.toLong, doc(vocabA))) ++
      (5 until 10).map(i => (i.toLong, doc(vocabB)))).toDF("doc_id", "text")
    val cands = MinHashLsh.candidates(MinHashLsh.bandKeys(MinHashLsh.signatures(
      MinHashLsh.explodeShingles(docs, "doc_id", "text", 3))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // disjoint vocabularies → disjoint shingles → no shared minhash band
    assert(cands.forall { case (a, b) => (a < 5) == (b < 5) })
  }

  test("span dedup charges later docs for 8-grams owned by earlier ones") {
    val nine = "a b c d e f g h i" // two 8-gram spans: a..h and b..i
    val docs = Seq(
      (0L, nine),                    // owns both spans
      (1L, nine),                    // full duplicate → every span owned earlier
      (2L, "j k l m n o p q r"))     // disjoint vocabulary → no dup spans
      .toDF("doc_id", "text")
    val out = graft.catalog.LlmPipeline.spanDedupFrame(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, 0.0), (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0)))
  }

  test("shared-span extent: longest run exact, islands summed, disjoint docs absent") {
    // a 20-token span S shared verbatim by docs 0 and 1, embedded in
    // unrelated prefixes/suffixes; doc 2 shares nothing. 13 consecutive
    // matching 8-gram starts → span = 13 + 7 = 20 tokens.
    val s = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, (1 to 9).map(i => s"p$i").mkString(" ") + " " + s),
      (1L, s + " " + (1 to 9).map(i => s"q$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.catalog.LlmPipeline.dupSpanExtentFrame(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 20L, 13L)))
  }

  test("shared-span extent: two separate shared runs report max span, total grams") {
    // two shared runs of 10 and 12 tokens (3 and 5 matching 8-gram starts)
    // separated by doc-unique interludes → span = 12, n_matched_grams = 8
    val r1 = (1 to 10).map(i => s"r$i").mkString(" ")
    val r2 = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, r1 + " " + (1 to 8).map(i => s"x$i").mkString(" ") + " " + r2),
      (1L, r2 + " " + (1 to 8).map(i => s"y$i").mkString(" ") + " " + r1))
      .toDF("doc_id", "text")
    val out = graft.catalog.LlmPipeline.dupSpanExtentFrame(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 12L, 8L)))
  }

  test("shared-span extent: boilerplate gram carried by >50 docs is dropped") {
    // 52 docs all embedding the same 8-token phrase inside unique filler:
    // df = 52 > 50 → the gram pairs nobody, so no output rows at all
    val phrase = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = (0 until 52).map(d =>
      (d.toLong, s"u${d}a u${d}b " + phrase + s" v${d}a v${d}b"))
      .toDF("doc_id", "text")
    assert(graft.catalog.LlmPipeline.dupSpanExtentFrame(docs).count() == 0L)
  }

  test("SimHash: same token set → Hamming 0; banded pairs equal brute force") {
    val rnd = new Random(5)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0L until 14L).map { i =>
      (i, (1 to 10).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (14L -> base) :+ (15L -> (base + " "))
    val df = docs.toDF("doc_id", "text")
    val fps = SimHash.fingerprints(df, "doc_id", "text")
    val banded = SimHash.nearPairs(fps, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over collected fingerprints
    val fp = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == brute)
    assert(banded.exists { case (a, b, h) => a == 14L && b == 15L && h == 0 })
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the benchmark slice") {
    // doc 0 (0 % 97 == 0) is the benchmark; doc 1 embeds one of its
    // 8-grams verbatim, docs 2 and 3 share at most 7 consecutive tokens
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, "evalset", evalText),
      (1L, "web", "prefix words " + evalText.split(" ").take(8).mkString(" ") + " suffix"),
      (2L, "web", evalText.split(" ").take(7).mkString(" ") + " different tail words here"),
      (3L, "books", "entirely unrelated training content with many plain words")
    ).toDF("doc_id", "source", "text")
    val out = graft.catalog.LlmPipeline.decontamFrame(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("web", 2L, 1L), ("books", 1L, 0L)))
  }

  test("shard packing: lossless, deterministic, per-shard sums ≤ budget + one doc") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.catalog.LlmPipeline.shardPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    val out = run()
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(out.length == nDocs, "packing dropped or duplicated docs")
    assert(out.map(_._1).distinct.length == out.length, "doc assigned twice")
    // every doc in shard k STARTS inside window k, so a shard holds at most
    // one budget of starts plus its last doc's overhang
    val budget = 2048L
    out.groupBy(t => (t._3, t._4)).foreach { case ((b, s), docs) =>
      val total = docs.map(_._2).sum
      val biggest = docs.map(_._2).max
      assert(total <= budget + biggest,
        s"bucket $b shard $s holds $total tokens (> budget + largest doc)")
    }
    assert(out.toSeq == run().toSeq, "packing is not deterministic")
  }

  test("repetition signals: exact dup-word and top-bigram fractions, short-doc edge") {
    val docs = Seq(
      // toks = [a,a,a,b]: dup = (4-2)/4 = 0.5; bigrams [a a, a a, a b] → 2/3
      (0L, "a a a b"),
      // all-distinct tokens: dup 0; 4 distinct bigrams → top 1/4
      (1L, "one two three four five"),
      // single token: no bigrams → both fractions 0, unflagged
      (2L, "solo"),
      (3L, ""),
    ).toDF("doc_id", "text")
    val out = graft.catalog.TextAnalysis.repetitionFrame(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 0.5, 0.666667, 1),
      (1L, 0.0, 0.25, 1), // top_bigram 0.25 > 0.18 — tiny docs trip the ratio
      (2L, 0.0, 0.0, 0),
      (3L, 0.0, 0.0, 0)))
  }
}
