package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{PortableHash, TextFns}

/** Text-analysis operators for training-data curation: language ID
  * (stopword-overlap heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and min-k document fingerprinting.
  *
  * All pure column expressions — whole-stage codegen'd, one scan of
  * `documents`, no UDFs — so each op is a map-only pass at any scale.
  */
object TextAnalysis extends QueryModule {

  // ---- language ID --------------------------------------------------------
  /** Tiny per-language stopword profiles; langId scores each doc by the
    * fraction of its tokens found in each profile and predicts the argmax
    * (ties broken alphabetically — deterministic). An n-gram character
    * model would be the production upgrade; the plumbing (per-doc scoring,
    * argmax, confusion-matrix rollup) is identical.
    */
  private val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "von"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "that", "for", "on"),
    "es" -> Seq("el", "los", "las", "y", "una", "por", "con", "para", "como", "del"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du", "dans", "pour", "au", "vous"),
  )

  private def stopFrac(toks: Column, words: Seq[String]): Column = {
    val inList = (t: Column) =>
      words.map(w => t === lit(w)).reduce(_ || _)
    when(size(toks) > 0,
      size(filter(toks, inList)).cast("double") / size(toks)).otherwise(lit(0.0))
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), toks.as("w"))
      .select(Seq(col("doc_id"), col("lang")) ++
        StopwordProfiles.map { case (l, ws) => stopFrac(col("w"), ws).as(s"s_$l") }: _*)
    val best = greatest(StopwordProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    // first-alphabetical language reaching the max score wins the tie
    val predictedAlpha = StopwordProfiles.reverse.foldLeft(lit("und"): Column) {
      case (rest, (l, _)) => when(col(s"s_$l") === best, lit(l)).otherwise(rest)
    }
    scored.select(col("lang"), predictedAlpha.as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n_docs"))
  }

  private val langIdSql = {
    def frac(words: Seq[String]) = {
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CASE WHEN len(w) > 0 THEN len(list_filter(w, t -> list_contains($lst, t)))::DOUBLE / len(w) ELSE 0.0 END"
    }
    val scores = StopwordProfiles.map { case (l, ws) => s"${frac(ws)} AS s_$l" }.mkString(",\n    ")
    val best = "greatest(" + StopwordProfiles.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val pred = StopwordProfiles.map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${TextFns.tokensSql("text")} AS w FROM documents
       |), scored AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM toks
       |)
       |SELECT lang, $pred AS predicted, count(*) AS n_docs
       |FROM scored GROUP BY 1, 2""".stripMargin
  }

  // ---- quality scoring ----------------------------------------------------
  /** Per-doc quality signals: token count, mean token length, punctuation
    * ratio, English-stopword ratio, and a blended [0,1] score. The blend is
    * a deterministic stand-in for a learned quality model; the signals are
    * the standard pretraining-corpus filters (C4/Gopher-style length and
    * symbol heuristics).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))
    val en = StopwordProfiles.toMap.apply("en")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), toks.as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        round(aggregate(col("w"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / greatest(size(col("w")), lit(1)), 6).as("mean_tok_len"),
        round(nPunct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
        round(stopFrac(col("w"), en), 6).as("stop_ratio"),
        round(
          least(size(col("w")).cast("double") / 100, lit(1.0)) * 0.4 +
            (lit(1.0) - nPunct.cast("double") / greatest(nChars, lit(1))) * 0.3 +
            least(stopFrac(col("w"), en) * 5, lit(1.0)) * 0.3,
          6).as("quality"))
  }

  private val qualityScoreSql = {
    val en = StopwordProfiles.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text, ${TextFns.tokensSql("text")} AS w,
       |    len(text) AS n_chars,
       |    len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, w, n_chars, n_punct,
       |    CASE WHEN len(w) > 0
       |      THEN len(list_filter(w, x -> list_contains($en, x)))::DOUBLE / len(w)
       |      ELSE 0.0 END AS stop_frac
       |  FROM t
       |)
       |SELECT doc_id,
       |  len(w) AS n_tokens,
       |  round(list_sum(list_transform(w, x -> len(x)))::DOUBLE
       |        / greatest(len(w), 1), 6) AS mean_tok_len,
       |  round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
       |  round(stop_frac, 6) AS stop_ratio,
       |  round(least(len(w)::DOUBLE / 100, 1.0) * 0.4 +
       |        (1.0 - n_punct::DOUBLE / greatest(n_chars, 1)) * 0.3 +
       |        least(stop_frac * 5, 1.0) * 0.3, 6) AS quality
       |FROM s""".stripMargin
  }

  // ---- token distribution drift -------------------------------------------
  /** Token-distribution drift between two corpus slices (the train/serve
    * or batch-over-batch data-quality check): for each token, the
    * cross-multiplied rate difference |na·NB − nb·NA| — zero iff the
    * token's relative frequency matches across slices, and EXACT integer
    * math (the na/NA − nb/NB float form would diverge across engines).
    * One pass: tokens tagged by slice, ONE vocab-bounded conditional
    * aggregate, 1-row totals broadcast back, top-20 by (score DESC, word)
    * as TakeOrdered — no full sort. int64 holds to ~10⁹·10⁹ token
    * products; lift `score` to decimal(38,0) beyond that.
    */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select((col("lang") === "en").cast("int").as("in_a"),
        explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word") =!= "")
    val counts = toks.groupBy(col("word"))
      .agg(sum(col("in_a").cast("long")).as("na"),
        sum(lit(1L) - col("in_a")).as("nb"))
    val totals = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    counts.crossJoin(broadcast(totals))
      .select(col("word"), col("na"), col("nb"),
        abs(col("na") * col("tb") - col("nb") * col("ta")).as("drift_score"))
      .orderBy(col("drift_score").desc, col("word"))
      .limit(20)
  }

  private val tokenDriftSql =
    """WITH toks AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a,
      |         unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents
      |), c AS (
      |  SELECT word, CAST(sum(in_a) AS BIGINT) AS na,
      |         CAST(sum(1 - in_a) AS BIGINT) AS nb
      |  FROM toks WHERE word <> '' GROUP BY word
      |), t AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
      |  FROM c
      |)
      |SELECT word, na, nb, CAST(abs(na * tb - nb * ta) AS BIGINT) AS drift_score
      |FROM c CROSS JOIN t
      |ORDER BY drift_score DESC, word LIMIT 20""".stripMargin

  // ---- BPE merge learning -------------------------------------------------
  private[catalog] val BpeRounds = 6

  /** The per-round CTE block of [[bpeMergesSql]] (`p_r`/`c_r`/`b_r`/`w_r`
    * for r = 1..rounds, chained off a `w0` bracket-string CTE) — factored
    * so [[Composites.tokenizerTrainPipeline]]'s oracle learns its rules
    * through the EXACT same device (counts, tiebreak, greedy replace).
    */
  private[catalog] def bpeRoundCtesSql(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT unnest(list_transform(range(1, len(l)),
         |                i -> [l[i], l[i + 1]])) AS p, freq
         |  FROM (SELECT string_split(trim(s, '[]'), '][') AS l, freq
         |        FROM w${r - 1})
         |),
         |c$r AS (
         |  SELECT p[1] AS lft, p[2] AS rgt, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM p$r GROUP BY 1, 2
         |),
         |b$r AS (SELECT lft, rgt, cnt FROM c$r ORDER BY cnt DESC, lft, rgt LIMIT 1),
         |w$r AS (
         |  SELECT replace(w.s, '[' || b.lft || '][' || b.rgt || ']',
         |                 '[' || b.lft || b.rgt || ']') AS s, w.freq
         |  FROM w${r - 1} w CROSS JOIN b$r b
         |)""".stripMargin
    }.mkString(",\n")

  /** Tokenizer training: the first [[BpeRounds]] BPE merge rules over the
    * corpus ([[graft.operators.BpeMerges]]). Classic BPE learns on WORD
    * TYPES — the only corpus-sized op is the (word, freq) aggregate; each
    * round then counts adjacent symbol pairs over the vocabulary-bounded
    * type table (map-side combine, pair-type-sized shuffle) and collects
    * one argmax row. The oracle replays all rounds as chained CTEs using
    * the same bracket-string merge device, so every count and tiebreak is
    * bit-identical. Words are restricted to `[a-z0-9]+` on both sides
    * (tokenizer hygiene: the bracket encoding reserves `[`/`]`).
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val wordFreq = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    graft.operators.BpeMerges.learn(wordFreq, BpeRounds, trace = Some("bpe_merges"))
  }

  private val bpeMergesSql = {
    val rounds = bpeRoundCtesSql(BpeRounds)
    val out = (1 to BpeRounds)
      .map(r => s"SELECT $r AS merge_round, lft, rgt, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT regexp_replace(word, '(.)', '[\\1]', 'g') AS s, freq
       |  FROM (
       |    SELECT word, count(*) AS freq
       |    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
       |          FROM documents)
       |    WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |    GROUP BY word
       |  )
       |),
       |$rounds
       |$out""".stripMargin
  }

  // ---- hashed linear classifier -------------------------------------------
  /** Number of weight buckets in the hashed classifier — the model IS a
    * fixed table of `ClassifierBuckets` integer weights, reached by
    * hashing tokens (the "hashing trick"), so model size is constant in
    * vocabulary size.
    */
  private val ClassifierBuckets = 4096
  private val ClassifierSeed = 7

  /** Hashed-feature linear classifier inference (the fastText-style
    * quality gate pretraining pipelines run per document): each token
    * hashes to one of [[ClassifierBuckets]] buckets, each bucket carries a
    * deterministic integer weight in [-1000, 1000] (derived from the
    * seeded portable hash — a stand-in for trained weights, same shapes
    * and dataflow), and a document's score is the sum of its tokens'
    * bucket weights. Inference is MAP-ONLY: the weight lookup is pure
    * hash arithmetic inside a higher-order `transform`/`aggregate` over
    * the split array — no explode, no join against a weight table, no
    * per-doc shuffle; the only exchange is the final per-source rollup
    * (|sources| rows). Integer weights end-to-end make the oracle replay
    * bit-identical.
    *
    * Reference analog: the aggregate framework's per-record descriptor
    * dispatch (src/core/.../lib/aggregate/ValueAggregatorBaseDescriptor
    * .java) — a fixed function applied per record, aggregated once.
    */
  /** Per-document score of the hashed classifier — shared between the
    * inference rollup here and [[EvalMetrics]]' evaluation readouts
    * (AUC / confusion / calibration), which grade exactly this model.
    */
  private[catalog] def classifierScore: Column = {
    val toks = TextFns.tokens(lower(col("text")))
    val weight = (t: Column) => {
      val bucket = (PortableHash.h48(t) % ClassifierBuckets).cast("string")
      (PortableHash.h48(bucket, ClassifierSeed) % 2001) - 1000
    }
    aggregate(transform(toks, weight), lit(0L), (acc, x) => acc + x)
  }

  /** DuckDB twin of [[classifierScore]] (an expression over `text`). */
  private[catalog] val classifierScoreSql: String = {
    val bucket = s"CAST(${PortableHash.h48Sql("t")} % $ClassifierBuckets AS VARCHAR)"
    val weight = s"(${PortableHash.h48Sql(s"'$ClassifierSeed' || ':' || $bucket")} % 2001) - 1000"
    s"coalesce(list_sum(list_transform(${TextFns.tokensSql("lower(text)")}, t -> $weight)), 0)"
  }

  def qualityClassify(spark: SparkSession, dir: String): DataFrame = {
    val score = classifierScore
    Tables.documents(spark, dir)
      .select(col("source"), score.as("score"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(col("score")).cast("long").as("total_score"))
  }

  private val qualityClassifySql = {
    s"""WITH scored AS (
       |  SELECT source, $classifierScoreSql AS score
       |  FROM documents
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(score) AS BIGINT) AS total_score
       |FROM scored GROUP BY source""".stripMargin
  }

  // ---- token counting -----------------------------------------------------
  /** Corpus token statistics per source: whitespace tokens and a BPE-ish
    * regex segmentation (alpha runs | digit runs | single symbols) — the
    * usual quick token-budget estimate before running a real tokenizer.
    */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        size(TextFns.tokens(col("text"))).as("ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("bpe"),
        length(col("text")).as("chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"), sum(col("chars")).as("n_chars"))

  private val tokenCountSql =
    s"""SELECT source, count(*) AS n_docs,
       |  sum(len(${TextFns.tokensSql("text")}))::BIGINT AS ws_tokens,
       |  sum(len(regexp_extract_all(text, '$BpePattern')))::BIGINT AS bpe_tokens,
       |  sum(len(text))::BIGINT AS n_chars
       |FROM documents GROUP BY source""".stripMargin

  // ---- document fingerprinting (min-k sketch) -----------------------------
  /** Content fingerprint: md5 over the k smallest md5s of the doc's word
    * 5-gram shingles (a min-k sketch — robust to small edits at the doc
    * tail, unlike a full-content hash). Docs with fewer than 5 tokens fall
    * back to the normalized-content hash.
    */
  private val FpShingleN = 5
  private val FpK = 3

  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    // tokens materialize as a column first — see MinHashLsh.explodeShingles
    // for why inlining the token expression into the lambdas is O(tokens²)
    val hashes = array_sort(transform(
      TextFns.shingles(col("toks"), FpShingleN), s => md5(s)))
    val fallback = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= FpShingleN,
          md5(concat_ws("|", slice(hashes, 1, FpK))))
          .otherwise(fallback).as("fingerprint"))
  }

  private val docFingerprintSql = {
    val w = TextFns.tokensSql("text")
    val sh = TextFns.shinglesSql("w", FpShingleN)
    s"""WITH t AS (SELECT doc_id, text, $w AS w FROM documents)
       |SELECT doc_id,
       |  CASE WHEN len(w) >= $FpShingleN
       |    THEN md5(array_to_string(list_sort(list_transform($sh, s -> md5(s)))[1:$FpK], '|'))
       |    ELSE md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |  END AS fingerprint
       |FROM t""".stripMargin
  }

  // ---- repetition signals (Gopher-style quality filters) ------------------
  /** Per-doc repetition signals — the canonical curation filters for
    * machine-generated / boilerplate text that length and stopword ratios
    * miss: `dup_word_frac` (fraction of token occurrences that repeat an
    * earlier token) and `top_bigram_frac` (fraction of word-bigram
    * occurrences taken by the single most frequent bigram). `flagged`
    * applies the usual thresholds.
    *
    * Scale shape: both signals are PER-DOCUMENT statistics, so the whole
    * operator is one map-only projection — no shuffle anywhere. The bigram
    * mode is the longest equal-run of the doc's sorted bigram array
    * (array_sort + one linear `aggregate` lambda, O(n log n) per row): an
    * earlier explode → groupBy(doc, bigram) → groupBy(doc) draft shuffled
    * every bigram occurrence in the corpus twice and benched 13.4 s at
    * sf0.1 against 0.5 s for this shape — per-key statistics should never
    * leave their row.
    */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    repetitionFrame(Tables.documents(spark, dir))

  /** Frame-level core of [[repetitionSignals]] — takes any (doc_id, text)
    * frame so the spec can assert exact fractions on handcrafted docs.
    */
  def repetitionFrame(documents: DataFrame): DataFrame = {
    // longest equal-run over the sorted bigrams = max bigram multiplicity;
    // "" never equals a real token pair, so the first element starts run=1
    val topC = aggregate(
      array_sort(col("bg")),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val dupFrac = when(size(col("toks")) > 0,
      (size(col("toks")) - size(array_distinct(col("toks")))).cast("double") /
        size(col("toks"))).otherwise(0.0)
    val topFrac = when(size(col("bg")) > 0,
      topC.cast("double") / size(col("bg"))).otherwise(0.0)
    documents
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), TextFns.ngrams(col("toks"), 2).as("bg"))
      .select(col("doc_id"),
        round(dupFrac, 6).as("dup_word_frac"),
        round(topFrac, 6).as("top_bigram_frac"))
      .withColumn("flagged",
        (col("dup_word_frac") > 0.3 || col("top_bigram_frac") > 0.18).cast("int"))
  }

  private val repetitionSignalsSql = {
    val w = TextFns.tokensSql("text")
    val sh = TextFns.ngramsSql("w", 2)
    // the oracle's bigram mode is an O(n²) list comprehension — fine for
    // correctness checking at sf0.01, NOT the engine shape
    s"""WITH t AS (SELECT doc_id, $w AS w FROM documents),
       |g AS (SELECT doc_id, w, $sh AS bg FROM t),
       |j AS (
       |  SELECT doc_id,
       |    round(CASE WHEN len(w) > 0
       |      THEN (len(w) - len(list_distinct(w)))::DOUBLE / len(w)
       |      ELSE 0.0 END, 6) AS dup_word_frac,
       |    round(CASE WHEN len(bg) > 0
       |      THEN list_max(list_transform(list_distinct(bg),
       |             x -> len(list_filter(bg, y -> y = x))))::DOUBLE / len(bg)
       |      ELSE 0.0 END, 6) AS top_bigram_frac
       |  FROM g
       |)
       |SELECT doc_id, dup_word_frac, top_bigram_frac,
       |  (dup_word_frac > 0.3 OR top_bigram_frac > 0.18)::INT AS flagged
       |FROM j""".stripMargin
  }

  // ---- token surprisal (unigram-LM quality signal) ------------------------
  /** Per-doc mean token surprisal in bits — the portable stand-in for the
    * unigram-LM perplexity filter (CCNet-style: docs whose tokens are
    * uniformly high-surprisal are noise; uniformly low-surprisal are
    * boilerplate). True −log₂p needs libm logs, whose low bits differ
    * across engines, so surprisal is computed as
    * floor(log₂ total) − floor(log₂ tf) via `length(bin(x)) − 1` — pure
    * integer/string ops, bit-identical everywhere, within 1 bit of the
    * real value (plenty for a filter threshold).
    *
    * Scale shape: one term-count aggregation (shuffle on term with partial
    * agg), then the token stream joins the count table on term — the
    * count side arrives pre-partitioned by term from its own aggregation,
    * so only the token stream reshuffles; the per-doc rollup is the final
    * shuffle. The corpus-total is a 1-row broadcast.
    */
  def tokenSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    val tc = ex.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val tot = ex.agg(count(lit(1)).as("total"))
    ex.join(tc, "term").crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (length(bin(col("total"))) - length(bin(col("n")))).cast("long").as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
      .withColumn("avg_bits_q",
        floor(col("sum_bits").cast("double") * 1000000 / col("n_tokens")))
  }

  private val tokenSurprisalSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $w AS w FROM documents
       |), e AS (
       |  SELECT doc_id, unnest(w) AS term FROM t
       |), tc AS (
       |  SELECT term, count(*)::BIGINT AS n FROM e GROUP BY term
       |), tot AS (
       |  SELECT count(*)::BIGINT AS total FROM e
       |), s AS (
       |  SELECT e.doc_id, (len(bin(tot.total)) - len(bin(tc.n)))::BIGINT AS bits
       |  FROM e JOIN tc ON e.term = tc.term CROSS JOIN tot
       |)
       |SELECT doc_id, count(*) AS n_tokens, sum(bits)::BIGINT AS sum_bits,
       |  floor(sum(bits)::DOUBLE * 1000000 / count(*))::BIGINT AS avg_bits_q
       |FROM s GROUP BY doc_id""".stripMargin
  }

  // ---- bigram conditional surprisal ---------------------------------------
  /** Bigram-LM surprisal — the conditional upgrade of [[tokenSurprisal]]:
    * per doc, Σ −log₂ P(w₂|w₁) with the same integer floor-log₂ device
    * (len∘bin), so both engines sum identical integers. C(w₁) is counted
    * over bigram-FIRST positions (each doc's last token excluded), which
    * keeps C(w₁) = Σ_w₂ C(w₁w₂) — a proper conditional. The count tables
    * are vocabulary-sized (vocab and bigram-type entries, never
    * corpus-sized) — but bigram TYPES on a web-scale corpus still run to
    * billions of rows, so neither table carries a broadcast hint: both
    * joins are plain equi-joins and AQE promotes a side to broadcast only
    * when its measured size genuinely fits. The corpus-side pass is one
    * positional explode + one per-doc aggregate.
    */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val pairs = transform(sequence(lit(1), size(col("w")) - 1),
      i => struct(element_at(col("w"), i).as("w1"),
        concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))
          .as("bg")))
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.bg"))
    val uc = ex.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val bc = ex.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    ex.join(bc, "bg").join(uc, "w1")
      .select(col("doc_id"),
        (length(bin(col("c1"))) - length(bin(col("c12")))).cast("long").as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
  }

  private val bigramSurprisalSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $w AS w FROM documents
       |), e AS (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i])) AS w1,
       |    unnest(list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i + 1])) AS bg
       |  FROM t WHERE len(w) >= 2
       |), uc AS (
       |  SELECT w1, count(*)::BIGINT AS c1 FROM e GROUP BY w1
       |), bc AS (
       |  SELECT bg, count(*)::BIGINT AS c12 FROM e GROUP BY bg
       |), s AS (
       |  SELECT e.doc_id,
       |    (len(bin(uc.c1)) - len(bin(bc.c12)))::BIGINT AS bits
       |  FROM e JOIN bc USING (bg) JOIN uc USING (w1)
       |)
       |SELECT doc_id, count(*) AS n_bigrams, sum(bits)::BIGINT AS sum_bits
       |FROM s GROUP BY doc_id""".stripMargin
  }

  // ---- per-document keyword -----------------------------------------------
  /** Each document's most DISTINGUISHING token — the tf·idf idea with no
    * floats: rank a doc's terms by (tf DESC, df ASC, term ASC). The
    * lexicographic triple is exactly the tf·idf ordering wherever tf·idf
    * orders strictly, and (unlike log-based idf) is bit-identical across
    * engines. Two hash aggregates (tf, df — both vocabulary-bounded) + one
    * window partitioned by doc over that doc's ≤|vocab| distinct terms;
    * the df side broadcasts.
    */
  def docKeyword(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    val tf = ex.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = ex.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("term").as("keyword"), col("tf"), col("df"))
  }

  private val docKeywordSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH e AS (
       |  SELECT doc_id, unnest(w) AS term
       |  FROM (SELECT doc_id, $w AS w FROM documents)
       |), tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(*)::BIGINT AS df
       |  FROM (SELECT DISTINCT doc_id, term FROM e) GROUP BY term
       |)
       |SELECT doc_id, term AS keyword, tf, df FROM (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
       |  FROM tf JOIN df USING (term))
       |WHERE rk = 1""".stripMargin
  }

  // ---- TextRank corpus keywords -------------------------------------------
  private val TrIters = 3
  private val TrTopK = 20

  /** TextRank (Mihalcea & Tarau 2004) corpus keywords: integer PageRank
    * ([[graft.operators.PageRank]] — same Scale / rational-damping /
    * fixed-round determinism contract) over the word co-occurrence graph.
    * Adjacent content words (length ≥ 4, lowercased) form an edge per
    * OCCURRENCE — keeping multiplicity in the edge list means
    * `rank div deg` contributions reproduce co-occurrence weighting with
    * no weight column. The pair frame is a map-only window-2 transform
    * over each token array (no positional self-join on the corpus);
    * nodes are vocabulary-bounded, edges corpus-linear, and each rank
    * round is the PageRank two-shuffle shape the oracle replays as
    * chained CTEs. Top-[[TrTopK]] by (rank DESC, word) via TakeOrdered —
    * deterministic tie-break, no global window.
    */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(TextFns.tokens(lower(col("text"))).as("t"))
    val adj = t.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS src, element_at(t, i + 1) AS dst))"))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .where(length(col("src")) >= 4 && length(col("dst")) >= 4 &&
        col("src") =!= col("dst"))
    val sym = adj.union(
      adj.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = t.select(explode(col("t")).as("id"))
      .where(length(col("id")) >= 4).distinct()
    graft.operators.PageRank.run(nodes, sym, TrIters,
        trace = Some("textrank_keywords"))
      .orderBy(col("rank").desc, col("id"))
      .limit(TrTopK)
      .select(col("id").as("word"), col("rank"))
  }

  private val textrankKeywordsSql = {
    val scale = graft.operators.PageRank.Scale
    val base = 15L * scale / 100L
    val rounds = (0 until TrIters).map { t =>
      s"""c$t AS (
         |  SELECT s.dst, sum(r.rank // d.deg)::BIGINT AS s
         |  FROM sym s JOIN deg d ON s.src = d.src JOIN r$t r ON r.id = s.src
         |  GROUP BY 1
         |), r${t + 1} AS (
         |  SELECT n.id,
         |    ($base + (coalesce(c.s, 0) * 85) // 100)::BIGINT AS rank
         |  FROM nodes n LEFT JOIN c$t c ON c.dst = n.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFns.tokensSql("lower(text)")} AS w
       |  FROM documents
       |), u AS (
       |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS p
       |  FROM t
       |), e0 AS (
       |  SELECT a.word AS src, b.word AS dst
       |  FROM u a JOIN u b ON b.doc_id = a.doc_id AND b.p = a.p + 1
       |  WHERE len(a.word) >= 4 AND len(b.word) >= 4 AND a.word <> b.word
       |), sym AS (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst
       |  FROM e0
       |), nodes AS (
       |  SELECT DISTINCT word AS id FROM u WHERE len(word) >= 4
       |), deg AS (
       |  SELECT src, count(*) AS deg FROM sym GROUP BY 1
       |), r0 AS (
       |  SELECT id, $scale::BIGINT AS rank FROM nodes
       |),
       |$rounds
       |SELECT id AS word, rank FROM r$TrIters
       |ORDER BY rank DESC, word LIMIT $TrTopK""".stripMargin
  }

  // ---- PII redaction ------------------------------------------------------
  private[catalog] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[catalog] val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  private[catalog] val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The deterministic PII-injection expression over (doc_id, text) and its
    * scrub — factored so [[Composites.privacyReleasePipeline]] plants and
    * redacts the SAME synthetic PII the standalone pii_scrub proves
    * byte-identical; SQL twins below.
    */
  private[catalog] def piiAug: org.apache.spark.sql.Column = concat(col("text"),
    when(col("doc_id") % 7 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com now"))).otherwise(""),
    when(col("doc_id") % 11 === 0,
      concat(lit(" call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" today"))).otherwise(""),
    when(col("doc_id") % 13 === 0,
      concat(lit(" host "), (col("doc_id") % 256).cast("string"),
        lit(".0.2."), (col("doc_id") % 100).cast("string"),
        lit(" up"))).otherwise(""))

  private[catalog] def piiClean(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")

  // single-line on purpose: these embed into callers' stripMargin blocks,
  // where an inner line starting with spaces + `||` would be truncated
  private[catalog] val piiAugSql =
    "text" +
      " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id::VARCHAR || '@mail.example.com now' ELSE '' END" +
      " || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' today' ELSE '' END" +
      " || CASE WHEN doc_id % 13 = 0 THEN ' host ' || (doc_id % 256)::VARCHAR || '.0.2.' || (doc_id % 100)::VARCHAR || ' up' ELSE '' END"

  private[catalog] def piiCleanSql(t: String) =
    s"regexp_replace(regexp_replace(regexp_replace($t, " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), " +
      "'\\d{3}-\\d{3}-\\d{4}', '[PHONE]', 'g'), " +
      "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g')"

  /** PII scrubbing: count and redact emails / phone numbers / IPv4
    * addresses. The synthetic corpus contains no natural PII, so a
    * deterministic injection step (pure function of doc_id, mirrored in the
    * oracle) plants all three kinds first — the scrub then exercises the
    * real patterns end-to-end, and `clean_md5` proves byte-identical
    * replacement output. Pattern syntax stays in the Java∩RE2 common subset
    * (no lookaround, no backrefs) so Spark and DuckDB agree; Spark's
    * `regexp_replace` is global by default, DuckDB needs the explicit 'g'.
    * Map-only single scan at any scale — codegen'd regex over each row.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val clean = piiClean(col("t"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), piiAug.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).cast("long").as("n_ips"),
        length(clean).cast("long").as("clean_len"),
        md5(clean).as("clean_md5"))
  }

  private val piiScrubSql =
    """WITH aug AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id::VARCHAR || '@mail.example.com now' ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' today' ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0 THEN ' host ' || (doc_id % 256)::VARCHAR || '.0.2.' || (doc_id % 100)::VARCHAR || ' up' ELSE '' END
      |    AS t
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, t,
      |    regexp_replace(regexp_replace(regexp_replace(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS clean
      |  FROM aug
      |)
      |SELECT doc_id,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |  len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}'))::BIGINT AS n_phones,
      |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
      |  len(clean)::BIGINT AS clean_len,
      |  md5(clean) AS clean_md5
      |FROM c""".stripMargin

  /** Canonical text normalization — the first stage of every LLM ingest
    * pipeline: lowercase, control chars → space, whitespace runs
    * collapsed, edges trimmed. The corpus is clean ASCII, so the query
    * first derandomizes a MESSY twin of each doc (tab/CRLF framing,
    * doubled spaces, upper-cased every third doc) and then normalizes it —
    * the oracle builds the same mess and must land on the same md5, so a
    * regex or case-folding divergence fails the compare. Map-only
    * codegen'd regex chain; patterns stay in the Java∩RE2 subset.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    val messy = regexp_replace(
      concat(lit("\t  "),
        when(col("doc_id") % 3 === 0, upper(col("text"))).otherwise(col("text")),
        lit("  \r\n")),
      " ", "  ")
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("t")), "[\\x00-\\x1f\\x7f]", " "),
      " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), messy.as("t"))
      .select(col("doc_id"), length(norm).cast("long").as("norm_len"),
        md5(norm).as("norm_md5"))
  }

  private val textNormalizeSql =
    """WITH m AS (
      |  SELECT doc_id, chr(9) || '  '
      |    || CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END
      |    || '  ' || chr(13) || chr(10) AS t0
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, regexp_replace(t0, ' ', '  ', 'g') AS t FROM m
      |), n AS (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(t),
      |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM s
      |)
      |SELECT doc_id, len(norm)::BIGINT AS norm_len, md5(norm) AS norm_md5
      |FROM n""".stripMargin

  private val Phrase = Seq("slow", "hash", "batch")

  /** Exact phrase search over a POSITIONAL inverted index — the retrieval
    * op BM25's bag-of-words ranking can't express. Index rows are
    * (doc_id, pos, term) from one posexplode; the 3-word phrase resolves
    * as a selective per-word probe filter followed by equi-joins on
    * (doc_id, adjacent positions) — at scale each probe reads one term's
    * posting list, candidates are bounded by the rarest word's postings,
    * and nothing rescans raw text at query time. Output: per matching doc
    * the match count and first (0-based) match position.
    */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "term")))
    val probes = Phrase.zipWithIndex.map { case (w, i) =>
      toks.filter(col("term") === w)
        .select(col("doc_id").as(s"d$i"), col("pos").as(s"p$i"))
    }
    probes.head
      .join(probes(1), col("d1") === col("d0") && col("p1") === col("p0") + 1)
      .join(probes(2), col("d2") === col("d0") && col("p2") === col("p0") + 2)
      .groupBy(col("d0"))
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).cast("long").as("first_pos"))
      .select(col("d0").as("doc_id"), col("n_matches"), col("first_pos"))
  }

  private val phraseSearchSql =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextFns.tokensSql("text")} AS toks FROM documents
       |), u AS (
       |  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS p
       |  FROM t
       |)
       |SELECT a.doc_id, count(*) AS n_matches, (min(a.p) - 1)::BIGINT AS first_pos
       |FROM u a
       |JOIN u b ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND b.w = '${Phrase(1)}'
       |JOIN u c ON c.doc_id = a.doc_id AND c.p = a.p + 2 AND c.w = '${Phrase(2)}'
       |WHERE a.w = '${Phrase.head}'
       |GROUP BY a.doc_id""".stripMargin

  // ---- global token-offset index ------------------------------------------
  /** Every document's starting offset in the corpus-wide token stream —
    * the index a tokenizer shard-writer needs to address any token
    * globally. This is a distributed PREFIX SUM, implemented the way it
    * must be at 100 TB: NOT a single global-order window (one reducer owns
    * everything) but range-partition by doc_id → per-partition running sum
    * (each task scans only its slice) + a partition-count-sized base-offset
    * table broadcast back. The frame is materialized once so the partition
    * ids seen by the base-offset aggregate and the main pass are the same
    * physical partitioning (range sampling is otherwise re-drawn per
    * action).
    */
  def docOffsets(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Materialize
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    val parts = Materialize(
      d.repartitionByRange(col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val base = parts.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("part_total"))
      .withColumn("base",
        coalesce(sum(col("part_total")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("base"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    parts
      .withColumn("local", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(base), "pid")
      .select(col("doc_id"), col("n_tokens"),
        (col("local") + col("base")).as("start_offset"))
  }

  private val docOffsetsSql =
    s"""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(sum(len(w)) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS start_offset
       |FROM (SELECT doc_id, ${TextFns.tokensSql("text")} AS w FROM documents)""".stripMargin

  // ---- context-window chunking --------------------------------------------
  /** Chunk accounting for context-window packing: documents split into
    * C=32-token chunks with O=8 tokens of overlap (stride 24). Emits the
    * per-source chunk/pad totals a training-prep planner needs to size a
    * tokenization run. Pure integer arithmetic over the token count — one
    * map-only scan, partial-aggregated per source; no token array is ever
    * materialized beyond the codegen'd size().
    */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      // ceil((n-C)/stride)+1 in pure integer math (div, not fp /)
      .withColumn("n_chunks", expr(
        "CASE WHEN n_tokens <= 32 THEN CAST(1 AS BIGINT) " +
        "ELSE (n_tokens - 32 + 23) div 24 + 1 END"))
      // pad = tokens the final chunk reads past the end of the doc
      .withColumn("pad", expr("32 + (n_chunks - 1) * 24 - n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"),
        sum(col("n_chunks")).as("chunks"), sum(col("pad")).as("pad_tokens"))
  }

  private val chunkOverlapSql =
    s"""WITH t AS (
       |  SELECT source, CAST(len(${TextFns.tokensSql("text")}) AS BIGINT) AS n
       |  FROM documents
       |), c AS (
       |  SELECT source, n,
       |    CASE WHEN n <= 32 THEN 1
       |         ELSE (n - 32 + 23) // 24 + 1 END AS n_chunks
       |  FROM t)
       |SELECT source, count(*) AS docs,
       |  CAST(sum(n) AS BIGINT) AS tokens,
       |  CAST(sum(n_chunks) AS BIGINT) AS chunks,
       |  CAST(sum(32 + (n_chunks - 1) * 24 - n) AS BIGINT) AS pad_tokens
       |FROM c GROUP BY source""".stripMargin

  // ---- GPT-style sequence packing -----------------------------------------
  private val SeqLen = 128L

  /** Document packing with crossing — the GPT training-prep shape: the
    * whole corpus is one token stream (doc_id order), cut into fixed
    * 128-token sequences, and a document may STRADDLE a cut. Emits, per
    * doc, the first/last sequence its tokens land in and how many
    * sequences it touches — the map a packing run needs to route each
    * doc's tokens to sequence shards. Builds on [[docOffsets]]'s
    * range-partitioned prefix sum (the only shuffle), so the packing
    * itself is pure per-row integer math on the global offset: seq_first
    * = start div C, seq_last = (start + n − 1) div C. Token-free docs
    * occupy no sequence (NULL bounds, 0 touched).
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    docOffsets(spark, dir)
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          expr(s"start_offset div $SeqLen")).as("seq_first"),
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) div $SeqLen")).as("seq_last"))
      .withColumn("n_seqs",
        coalesce(col("seq_last") - col("seq_first") + 1, lit(0L)))

  private val packSequencesSql =
    s"""WITH o AS (${docOffsetsSql.replace("\n", "\n     ")})
       |SELECT doc_id, n_tokens,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST(start_offset // $SeqLen AS BIGINT) END AS seq_first,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST((start_offset + n_tokens - 1) // $SeqLen AS BIGINT)
       |       END AS seq_last,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST((start_offset + n_tokens - 1) // $SeqLen
       |                 - start_offset // $SeqLen + 1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS n_seqs
       |FROM o""".stripMargin

  // ---- corpus-wide bigram statistics --------------------------------------
  /** Top-20 bigrams across the corpus WITH multiplicity (repetition_signals
    * is per-doc and distinct-based; an n-gram LM wants raw corpus counts).
    * The bigram explode is positional (sequence + element_at — codegen, no
    * UDF); counting is an ordinary hash aggregate with map-side partial
    * combine, and the top-20 runs as TakeOrdered per-partition heaps. The
    * keyspace is vocabulary², never corpus-sized.
    */
  def topBigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))
    Tables.documents(spark, dir)
      .select(toks.as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(grams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  private val topBigramsSql =
    s"""SELECT bigram, count(*) AS n FROM (
       |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i + 1])) AS bigram
       |  FROM (SELECT ${TextFns.tokensSql("text")} AS w FROM documents)
       |  WHERE len(w) >= 2)
       |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // ---- bigram next-token completion table ---------------------------------
  private val NtK = 30

  /** Markov completion table: for each of the `NtK` highest-outflow words,
    * the single most likely next token with its count and probability —
    * the greedy-decode row of a bigram language model (and the sanity
    * probe run over every tokenizer/corpus drop). Two key shuffles
    * (bigram count, per-prev outflow), then a per-prev argmax window —
    * partitioned by `prev`, so the window never globalizes. Probabilities
    * are emitted as integer micro-units of an exact integer ratio, so the
    * compare is tolerance-free.
    */
  def bigramNextToken(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextFns.tokens(col("text"))
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))
    val c = Tables.documents(spark, dir)
      .select(toks.as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(grams).as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("prev"),
        substring_index(col("bigram"), " ", -1).as("next_tok"))
      .groupBy(col("prev"), col("next_tok")).agg(count(lit(1)).as("n"))
    val top = c.groupBy(col("prev")).agg(sum(col("n")).as("tot"))
      .orderBy(col("tot").desc, col("prev")).limit(NtK)
    val w = Window.partitionBy(col("prev"))
      .orderBy(col("n").desc, col("next_tok"))
    c.join(top, "prev")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1).drop("rk")
      .withColumn("p_micro",
        expr("CAST(round(1000000.0 * n / tot) AS BIGINT)"))
  }

  private val bigramNextTokenSql =
    s"""WITH bg AS (
       |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i + 1])) AS bigram
       |  FROM (SELECT ${TextFns.tokensSql("text")} AS w FROM documents)
       |  WHERE len(w) >= 2
       |), c AS (
       |  SELECT split_part(bigram, ' ', 1) AS prev,
       |    split_part(bigram, ' ', 2) AS next_tok, count(*) AS n
       |  FROM bg GROUP BY 1, 2
       |), top AS (
       |  SELECT prev, tot FROM (
       |    SELECT prev, CAST(sum(n) AS BIGINT) AS tot,
       |      row_number() OVER (ORDER BY sum(n) DESC, prev) AS pr
       |    FROM c GROUP BY prev)
       |  WHERE pr <= $NtK
       |)
       |SELECT c.prev, c.next_tok, c.n, top.tot,
       |  CAST(round(1000000.0 * c.n / top.tot) AS BIGINT) AS p_micro
       |FROM c JOIN top ON c.prev = top.prev
       |QUALIFY row_number() OVER (PARTITION BY c.prev
       |  ORDER BY c.n DESC, c.next_tok) = 1""".stripMargin

  // ---- Zipf rank-frequency power-law fit ----------------------------------
  private val ZipfTopN = 500

  /** Zipf's-law audit: least-squares slope of ln(freq) on ln(rank) over
    * the `ZipfTopN` most frequent tokens — natural corpora fit a slope
    * near −1, so a corpus drop whose slope collapses toward 0 (template
    * spam flattens the head) or dives steeply (mode collapse in synthetic
    * data) fails review before training ever sees it. One vocab count
    * shuffle, a top-N rank (TakeOrdered — never a full vocab sort), and
    * the built-in `regr_slope`/`regr_r2` aggregates over N points. The
    * regression inputs are ln's of exact integers — transcendental, so
    * the outputs live in tolerance-compared VALUE columns (rounded,
    * never ranking keys; see [[pmiBigrams]] for the policy's origin).
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(ZipfTopN)
      .withColumn("r",
        row_number().over(Window.orderBy(col("f").desc, col("tok"))))
    ranked.agg(
      count(lit(1)).as("n_points"),
      round(expr("regr_slope(ln(f), ln(r))"), 6).as("slope"),
      round(expr("regr_intercept(ln(f), ln(r))"), 6).as("intercept"),
      round(expr("regr_r2(ln(f), ln(r))"), 6).as("r2"))
  }

  private val zipfFitSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH freq AS (
       |  SELECT tok, count(*) AS f
       |  FROM (SELECT unnest($w) AS tok FROM documents) GROUP BY tok
       |), ranked AS (
       |  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
       |  FROM freq ORDER BY f DESC, tok LIMIT $ZipfTopN
       |)
       |SELECT count(*) AS n_points,
       |  round(regr_slope(ln(f), ln(r)), 6) AS slope,
       |  round(regr_intercept(ln(f), ln(r)), 6) AS intercept,
       |  round(regr_r2(ln(f), ln(r)), 6) AS r2
       |FROM ranked""".stripMargin
  }

  // ---- PMI collocation mining ---------------------------------------------
  private val PmiK = 20
  private val PmiMinCount = 5

  /** Collocation mining by pointwise mutual information: the `PmiK`
    * bigrams whose observed frequency most exceeds what their words'
    * independent frequencies predict — the "New York"/"machine learning"
    * detector that raw bigram counts (dominated by stopword pairs) miss;
    * the symmetric-association companion to [[bigramSurprisal]]'s
    * conditional view. Support floor `PmiMinCount` kills the classic
    * PMI pathology (hapax pairs scoring infinite). Two token shuffles
    * (unigram + bigram counts), two equi-joins of the bigram frame to the
    * unigram frame, a top-k. The association score is the LIFT ratio
    * p(ab)/(p(a)p(b)) — rank-equivalent to PMI (ln is monotone) but free
    * of the transcendental: every factor is an exactly-representable
    * integer in a double (< 2^53 at this scale), so the quotient is the
    * same correctly-rounded IEEE division on both engines and the
    * micro-rounded score compares as an exact integer. (An earlier ln
    * form lost one row to a 1-ulp Math.log-vs-libm boundary — that class
    * of flake is why the catalog keeps transcendentals out of ranking
    * keys. Beyond ~2^53-sized products, switch to log-space with
    * coarser quantization.)
    */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = TextFns.tokens(col("text"))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_u"))
    val nu = uni.agg(sum(col("n_u"))).head().getLong(0)
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))
    val bg = docs.select(toks.as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(grams).as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("prev"),
        substring_index(col("bigram"), " ", -1).as("next_tok"))
      .groupBy(col("prev"), col("next_tok")).agg(count(lit(1)).as("n"))
    val nb = bg.agg(sum(col("n"))).head().getLong(0)
    bg.where(col("n") >= PmiMinCount)
      .join(uni.toDF("prev", "n_a"), "prev")
      .join(uni.toDF("next_tok", "n_c"), "next_tok")
      .withColumn("lift_micro", expr(
        s"CAST(round(1000000.0 * (((n * 1.0) * $nu * $nu) / " +
          s"(($nb * 1.0) * n_a * n_c))) AS BIGINT)"))
      .select(col("prev"), col("next_tok"), col("n"), col("lift_micro"))
      .orderBy(col("lift_micro").desc, col("prev"), col("next_tok"))
      .limit(PmiK)
  }

  private val pmiBigramsSql = {
    val w = TextFns.tokensSql("text")
    s"""WITH uni AS (
       |  SELECT tok, count(*) AS n_u
       |  FROM (SELECT unnest($w) AS tok FROM documents) GROUP BY tok
       |), nu AS (SELECT CAST(sum(n_u) AS BIGINT) AS v FROM uni),
       |bg AS (
       |  SELECT split_part(bigram, ' ', 1) AS prev,
       |    split_part(bigram, ' ', 2) AS next_tok, count(*) AS n
       |  FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i + 1])) AS bigram
       |    FROM (SELECT $w AS w FROM documents) WHERE len(w) >= 2)
       |  GROUP BY 1, 2
       |), nb AS (SELECT CAST(sum(n) AS BIGINT) AS v FROM bg)
       |SELECT bg.prev, bg.next_tok, bg.n,
       |  CAST(round(1000000.0 * (((bg.n * 1.0) * (SELECT v FROM nu) *
       |    (SELECT v FROM nu)) / (((SELECT v FROM nb) * 1.0) * ua.n_u *
       |    uc.n_u))) AS BIGINT) AS lift_micro
       |FROM bg
       |JOIN uni ua ON ua.tok = bg.prev
       |JOIN uni uc ON uc.tok = bg.next_tok
       |WHERE bg.n >= $PmiMinCount
       |ORDER BY lift_micro DESC, prev, next_tok LIMIT $PmiK""".stripMargin
  }

  // ---- bigram-model held-out evaluation -----------------------------------
  /** Held-out evaluation of the greedy bigram model: train per-word argmax
    * next-token on the 80% split, score top-1 hit rate on the held-out
    * 20% — the eval loop every [[bigramNextToken]]-style model needs, in
    * the same two-shuffle shape (train counts, test transitions) plus one
    * model equi-join. Transitions whose context never appeared in
    * training count as misses (left join, not inner — silently dropping
    * unseen contexts would inflate accuracy). The rate is a micro-rounded
    * exact integer ratio.
    */
  def bigramAccuracy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextFns.tokens(col("text"))
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(grams).as("bigram"))
      .select(col("doc_id"),
        substring_index(col("bigram"), " ", 1).as("prev"),
        substring_index(col("bigram"), " ", -1).as("next_tok"))
    val w = Window.partitionBy(col("prev"))
      .orderBy(col("n").desc, col("next_tok"))
    val model = bg.where(col("doc_id") % 5 =!= 0)
      .groupBy(col("prev"), col("next_tok")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("prev"), col("next_tok").as("pred"))
    bg.where(col("doc_id") % 5 === 0)
      .join(model, Seq("prev"), "left")
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("pred") === col("next_tok"), 1L).otherwise(0L))
          .as("n_hits"))
      .withColumn("acc_ppm",
        expr("CAST(round(1000000.0 * n_hits / n_transitions) AS BIGINT)"))
  }

  private val bigramAccuracySql =
    s"""WITH bg AS (
       |  SELECT doc_id, split_part(bigram, ' ', 1) AS prev,
       |    split_part(bigram, ' ', 2) AS next_tok
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i + 1])) AS bigram
       |    FROM (SELECT doc_id, ${TextFns.tokensSql("text")} AS w FROM documents)
       |    WHERE len(w) >= 2)
       |), model AS (
       |  SELECT prev, next_tok AS pred FROM (
       |    SELECT prev, next_tok, count(*) AS n,
       |      row_number() OVER (PARTITION BY prev
       |        ORDER BY count(*) DESC, next_tok) AS rk
       |    FROM bg WHERE doc_id % 5 <> 0 GROUP BY prev, next_tok)
       |  WHERE rk = 1
       |)
       |SELECT count(*) AS n_transitions,
       |  CAST(sum(CASE WHEN m.pred = t.next_tok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  CAST(round(1000000.0 *
       |    sum(CASE WHEN m.pred = t.next_tok THEN 1 ELSE 0 END) / count(*))
       |    AS BIGINT) AS acc_ppm
       |FROM bg t LEFT JOIN model m ON m.prev = t.prev
       |WHERE t.doc_id % 5 = 0""".stripMargin

  // ---- multinomial naive Bayes language classifier ------------------------
  /** Train-and-classify in one pass: a multinomial naive Bayes language
    * model fit on the 80% train split (`doc_id % 5 != 0`) and applied to
    * the held-out 20% — the trainable upgrade of [[langId]]'s fixed
    * stopword profiles, and the canonical "learn a classifier with
    * nothing but GROUP BY" demonstration. All log-probabilities are
    * pre-rounded per (class, token) to integer micro-units, so document
    * scores are exact integer sums and the per-doc argmax (ties →
    * alphabetically-first class) is reproducible bit-for-bit on both
    * engines — the float boundary is confined to a single `ln` per
    * distinct (class, token), never a per-document accumulation.
    *
    * Scale shape: the model is one (class × token) count shuffle; the
    * class-constant frame is 5 rows (broadcast cross join); scoring joins
    * test tokens to the model on the (class, token) key. Laplace
    * smoothing handles unseen tokens via the per-class default term.
    */
  def nbClassify(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextFns.tokens(col("text"))).as("tok"))
    val train = tok.where(col("doc_id") % 5 =!= 0)
    // corpus constants (vocabulary size, train-doc count) fold into the
    // plan as broadcast 1-row aggregates — one composed job; an eager
    // .count() here would rescan the corpus twice at 100 TB just to embed
    // literals (and throw before the job even starts on an empty table)
    val consts = train.agg(count_distinct(col("tok")).as("vocab")).crossJoin(
      Tables.documents(spark, dir).where(col("doc_id") % 5 =!= 0)
        .agg(count(lit(1)).as("ntd")))
    val ctc = train.groupBy(col("lang").as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val cls = train.groupBy(col("lang").as("cls"))
      .agg(sum(lit(1)).as("t"), count_distinct(col("doc_id")).as("nd"))
      .crossJoin(broadcast(consts))
      .withColumn("prior_micro",
        expr("CAST(round(1000000.0 * ln(nd / CAST(ntd AS DOUBLE))) AS BIGINT)"))
      .withColumn("dflt_micro",
        expr("CAST(round(1000000.0 * ln(1.0 / (t + vocab))) AS BIGINT)"))
    val dtc = tok.where(col("doc_id") % 5 === 0)
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("dc"))
    val scored = dtc.crossJoin(broadcast(cls))
      .join(ctc, Seq("cls", "tok"), "left")
      .withColumn("term_micro", coalesce(
        expr("CAST(round(1000000.0 * ln((cnt + 1.0) / (t + vocab))) AS BIGINT)"),
        col("dflt_micro")))
      .groupBy(col("doc_id"), col("lang"), col("cls"), col("prior_micro"))
      .agg(sum(col("dc") * col("term_micro")).as("s"))
      .withColumn("score_micro", col("prior_micro") + col("s"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("cls"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred_lang"),
        col("score_micro"))
  }

  private val nbClassifySql =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(${TextFns.tokensSql("text")}) AS tok
       |  FROM documents
       |), train AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
       |v AS (SELECT count(DISTINCT tok) AS vocab FROM train),
       |ntd AS (SELECT count(*) AS nd FROM documents WHERE doc_id % 5 <> 0),
       |ctc AS (
       |  SELECT lang AS cls, tok, count(*) AS cnt FROM train GROUP BY 1, 2
       |), cls AS (
       |  SELECT lang AS cls, CAST(count(*) AS BIGINT) AS t,
       |    CAST(round(1000000.0 * ln(count(DISTINCT doc_id) /
       |      (SELECT nd FROM ntd)::DOUBLE)) AS BIGINT) AS prior_micro,
       |    CAST(round(1000000.0 * ln(1.0 /
       |      (count(*) + (SELECT vocab FROM v)))) AS BIGINT) AS dflt_micro
       |  FROM train GROUP BY lang
       |), dtc AS (
       |  SELECT doc_id, lang, tok, count(*) AS dc
       |  FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT d.doc_id, d.lang, c.cls, c.prior_micro,
       |    CAST(sum(d.dc * coalesce(
       |      CAST(round(1000000.0 * ln((ctc.cnt + 1.0) /
       |        (c.t + (SELECT vocab FROM v)))) AS BIGINT),
       |      c.dflt_micro)) AS BIGINT) AS s
       |  FROM dtc d CROSS JOIN cls c
       |  LEFT JOIN ctc ON ctc.cls = c.cls AND ctc.tok = d.tok
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT doc_id, lang, cls AS pred_lang, prior_micro + s AS score_micro
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY doc_id
       |  ORDER BY prior_micro + s DESC, cls) = 1""".stripMargin

  // ---- character-distribution entropy -------------------------------------
  /** Per-doc character entropy — the gibberish/boilerplate detector beside
    * [[qualityScore]]'s ratio features: near-zero entropy flags repeated-
    * character junk ("aaaa…"), near-log₂26 flags random-key noise; prose
    * sits in a stable mid band. True Shannon H needs libm logs, so (the
    * [[tokenSurprisal]] device) each class contributes
    * cnt · (⌊log₂ n⌋ − ⌊log₂ cnt⌋) bits via `length(bin(x))` — pure
    * integer/string ops, bit-identical across engines, within 1 bit per
    * class of the real value (plenty for a band filter).
    *
    * Scale shape: MAP-ONLY over a bounded 27-class alphabet (a–z + other)
    * — per-class counts are `length(t) − length(translate(t, c, ''))`
    * codegen expressions, the entropy sum is 27 `when` terms, and no row
    * ever explodes: a per-character explode would multiply a 100 TB corpus
    * by the average doc length before its first aggregate. Zero shuffles.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val t = lower(col("text"))
    val n = length(t)
    val counts: Seq[Column] =
      ('a' to 'z').map(c => n - length(translate(t, c.toString, "")))
    val other = counts.foldLeft(n)(_ - _)
    val ent = (counts :+ other).map(c =>
        when(c > 0, c.cast("long") *
          (length(bin(n.cast("long"))) - length(bin(c.cast("long")))))
          .otherwise(0L))
      .reduce(_ + _)
    Tables.documents(spark, dir)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), n.cast("long").as("n_chars_txt"),
        ent.as("ent_bits"))
      .withColumn("avg_mbits",
        floor(col("ent_bits").cast("double") * 1000000 / col("n_chars_txt")))
  }

  private val charEntropySql = {
    val counts = ('a' to 'z').map(c =>
      s"length(t) - length(replace(t, '$c', ''))")
    val other = counts.mkString("length(t) - (", " + ", ")")
    val terms = (counts :+ other).map(c =>
      s"CASE WHEN $c > 0 THEN ($c)::BIGINT * (len(bin(length(t)::BIGINT)) - len(bin(($c)::BIGINT))) ELSE 0 END")
    s"""WITH d AS (
       |  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) > 0
       |)
       |SELECT doc_id, length(t)::BIGINT AS n_chars_txt,
       |  (${terms.mkString(" + ")})::BIGINT AS ent_bits,
       |  floor((${terms.mkString(" + ")})::DOUBLE * 1000000 / length(t))::BIGINT
       |    AS avg_mbits
       |FROM d""".stripMargin
  }

  // ---- corpus datasheet ----------------------------------------------------
  /** One-row corpus card — the datasheet stapled to a training-data drop:
    * volume (docs, chars, tokens), diversity (sources, langs, vocabulary),
    * and integrity (exact-duplicate rate from content hashes). Two
    * independent single-pass aggregates (doc-level and token-level)
    * cross-joined as 1-row frames; every number is an exact integer, the
    * duplicate count via [[graft.functions.PortableHash.h48]] content
    * hashes so the oracle agrees on WHICH docs are dups, not just how
    * many. At 100 TB each distinct-count term can be swapped for its
    * [[graft.operators.HllSketch]] estimate without changing the shape.
    */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val docAgg = d.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(graft.functions.PortableHash.h48(col("text")))
        .as("distinct_texts"))
    val tokAgg = d.select(explode(TextFns.tokens(col("text"))).as("tok"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("vocab"))
    docAgg.crossJoin(tokAgg)
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_chars"), col("n_tokens"), col("vocab"),
        expr("n_chars div n_docs").as("mean_chars"),
        (col("n_docs") - col("distinct_texts")).as("dup_docs"),
        expr("(10000 * (n_docs - distinct_texts)) div n_docs")
          .as("dup_rate_bp"))
  }

  private val corpusCardSql = {
    val h = graft.functions.PortableHash.h48Sql("text")
    val w = TextFns.tokensSql("text")
    s"""WITH doc AS (
       |  SELECT count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       |    count(DISTINCT lang) AS n_langs,
       |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |    count(DISTINCT $h) AS distinct_texts
       |  FROM documents
       |), tok AS (
       |  SELECT count(*) AS n_tokens, count(DISTINCT tok) AS vocab
       |  FROM (SELECT unnest($w) AS tok FROM documents)
       |)
       |SELECT n_docs, n_sources, n_langs, n_chars, n_tokens, vocab,
       |  CAST(n_chars // n_docs AS BIGINT) AS mean_chars,
       |  n_docs - distinct_texts AS dup_docs,
       |  CAST((10000 * (n_docs - distinct_texts)) // n_docs AS BIGINT)
       |    AS dup_rate_bp
       |FROM doc, tok""".stripMargin
  }

  // ---- per-language tokenizer coverage -------------------------------------
  private val CovVocabSize = 24

  /** Per-LANGUAGE tokenizer coverage — the fairness audit on top of
    * `vocab_encode`'s per-doc OOV accounting: a frequency-ranked vocab is
    * learned on the WHOLE corpus (majority-language-dominated, as real
    * BPE vocabs are), then each language reports what fraction of its
    * token OCCURRENCES fall outside it. A high-OOV language is the one
    * the downstream tokenizer will fragment — the number a mixture owner
    * reads before committing a vocab size. Same scale shape as
    * `vocab_encode`: the vocab build is the one corpus-sized aggregate
    * (vocab-bounded output, top-V cut tie-broken by token), the V-row
    * vocab collects to the driver and applies as a literal map, so the
    * per-language pass is MAP-ONLY + one |langs|-row aggregate — no join
    * against the corpus. V=24 keeps OOV exercised here (corpus vocab
    * ≈ 33); production swaps V, nothing else.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(lower(col("text")))
    val vocab: Seq[String] = Tables.documents(spark, dir)
      .select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(CovVocabSize)
      .collect().map(_.getString(0)).toSeq
    val vs = typedLit(vocab)
    Tables.documents(spark, dir)
      .select(col("lang"), toks.as("toks"))
      .select(col("lang"),
        size(col("toks")).cast("long").as("nt"),
        size(filter(col("toks"), t => !array_contains(vs, t)))
          .cast("long").as("oov"))
      .groupBy(col("lang"))
      .agg(sum(col("nt")).as("total_tokens"), sum(col("oov")).as("oov_tokens"))
      .select(col("lang"), col("total_tokens"), col("oov_tokens"),
        expr("""CASE WHEN total_tokens = 0 THEN 0L
               |ELSE (10000 * oov_tokens) div total_tokens
               |END""".stripMargin).as("oov_bp"))
  }

  private val vocabCoverageSql = {
    val w = TextFns.tokensSql("lower(text)")
    s"""WITH tf AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest($w) AS word FROM documents)
       |  GROUP BY word
       |), v AS (
       |  SELECT word FROM tf ORDER BY cnt DESC, word LIMIT $CovVocabSize
       |), tok AS (
       |  SELECT lang, unnest($w) AS word FROM documents
       |), e AS (
       |  SELECT tok.lang, CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tok LEFT JOIN v ON v.word = tok.word
       |), agg AS (
       |  SELECT lang, count(*) AS total_tokens,
       |    CAST(sum(oov) AS BIGINT) AS oov_tokens
       |  FROM e GROUP BY lang
       |)
       |-- lang domain from documents directly (LEFT JOIN + coalesce), so a
       |-- language whose docs all tokenize to empty arrays still yields its
       |-- total_tokens=0 row — mirroring the Scala groupBy over ALL docs
       |SELECT l.lang,
       |  CAST(coalesce(a.total_tokens, 0) AS BIGINT) AS total_tokens,
       |  CAST(coalesce(a.oov_tokens, 0) AS BIGINT) AS oov_tokens,
       |  CAST(CASE WHEN coalesce(a.total_tokens, 0) = 0 THEN 0
       |       ELSE (10000 * a.oov_tokens) // a.total_tokens END AS BIGINT)
       |    AS oov_bp
       |FROM (SELECT DISTINCT lang FROM documents) l
       |LEFT JOIN agg a ON a.lang = l.lang""".stripMargin
  }

  // ---- Dunning log-likelihood-ratio collocations ------------------------------

  private val LlrMinCount = 5L
  private val LlrK = 20

  /** Dunning G² log-likelihood-ratio collocation test over adjacent word
    * pairs (Dunning 1993) — the statistically calibrated replacement for
    * raw PMI lift ([[pmiBigrams]]), which over-rewards rare pairs: G²
    * compares the 2×2 contingency table (pair / prev-only / next-only /
    * neither) against independence and is χ²-distributed, so one
    * threshold works at every corpus size. All four cell counts derive
    * from EXACT integer bigram counts and the two marginal tables (both
    * vocabulary-bounded); only the final Σ k·ln(k·N ÷ (row·col)) runs in
    * e0 doubles under micro rounding. Shuffles: one gram-linear bigram
    * count, two vocabulary-bounded marginal joins, a broadcast 1-row
    * total; top-[[LlrK]] via TakeOrdered, never a full sort.
    */
  def llrBigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))
    val bg = Tables.documents(spark, dir).select(toks.as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(grams).as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("prev"),
        substring_index(col("bigram"), " ", -1).as("next_tok"))
      .groupBy(col("prev"), col("next_tok")).agg(count(lit(1)).as("k11"))
    val rowM = bg.groupBy(col("prev")).agg(sum(col("k11")).as("ra"))
    val colM = bg.groupBy(col("next_tok")).agg(sum(col("k11")).as("cb"))
    val tot = bg.agg(sum(col("k11")).as("nn"))
    // xlogx-style term: k·ln(k·N/(row·col)), with the 0-count convention
    def term(k: String, row: String, colS: String) =
      s"CASE WHEN $k > 0 THEN $k * ln(($k * 1e0 * nn) / (($row * 1e0) * $colS)) ELSE 0e0 END"
    bg.where(col("k11") >= LlrMinCount)
      .join(rowM, "prev").join(colM, "next_tok")
      .crossJoin(broadcast(tot))
      .withColumn("k12", col("ra") - col("k11"))
      .withColumn("k21", col("cb") - col("k11"))
      .withColumn("k22", col("nn") - col("ra") - col("cb") + col("k11"))
      .withColumn("g2_micro", expr(
        "CAST(round(1000000e0 * 2e0 * (" +
          term("k11", "ra", "cb") + " + " +
          term("k12", "ra", "(nn - cb)") + " + " +
          term("k21", "(nn - ra)", "cb") + " + " +
          term("k22", "(nn - ra)", "(nn - cb)") + ")) AS BIGINT)"))
      .select(col("prev"), col("next_tok"), col("k11"), col("g2_micro"))
      .orderBy(col("g2_micro").desc, col("prev"), col("next_tok"))
      .limit(LlrK)
  }

  private val llrBigramsSql = {
    val w = TextFns.tokensSql("text")
    def term(k: String, row: String, colS: String) =
      s"CASE WHEN $k > 0 THEN $k * ln(($k * 1e0 * nn) / (($row * 1e0) * $colS)) ELSE 0e0 END"
    s"""WITH bg AS (
       |  SELECT split_part(bigram, ' ', 1) AS prev,
       |    split_part(bigram, ' ', 2) AS next_tok, count(*) AS k11
       |  FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i + 1])) AS bigram
       |    FROM (SELECT $w AS w FROM documents) WHERE len(w) >= 2)
       |  GROUP BY 1, 2
       |), rm AS (SELECT prev, CAST(sum(k11) AS BIGINT) AS ra FROM bg GROUP BY prev),
       |cm AS (SELECT next_tok, CAST(sum(k11) AS BIGINT) AS cb FROM bg GROUP BY next_tok),
       |tot AS (SELECT CAST(sum(k11) AS BIGINT) AS nn FROM bg),
       |x AS (
       |  SELECT bg.prev, bg.next_tok, bg.k11,
       |    ra - k11 AS k12, cb - k11 AS k21, nn - ra - cb + k11 AS k22,
       |    ra, cb, nn
       |  FROM bg JOIN rm USING (prev) JOIN cm USING (next_tok) CROSS JOIN tot
       |  WHERE k11 >= $LlrMinCount
       |)
       |SELECT prev, next_tok, k11,
       |  CAST(round(1000000e0 * 2e0 * (
       |    ${term("k11", "ra", "cb")} +
       |    ${term("k12", "ra", "(nn - cb)")} +
       |    ${term("k21", "(nn - ra)", "cb")} +
       |    ${term("k22", "(nn - ra)", "(nn - cb)")})) AS BIGINT) AS g2_micro
       |FROM x
       |ORDER BY g2_micro DESC, prev, next_tok LIMIT $LlrK""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("vocab_coverage", vocabCoverage, Some(vocabCoverageSql)),
    QueryDef("corpus_card", corpusCard, Some(corpusCardSql)),
    QueryDef("lang_id", langId, Some(langIdSql)),
    QueryDef("char_entropy", charEntropy, Some(charEntropySql)),
    QueryDef("doc_offsets", docOffsets, Some(docOffsetsSql)),
    QueryDef("pack_sequences", packSequences, Some(packSequencesSql)),
    QueryDef("chunk_overlap", chunkOverlap, Some(chunkOverlapSql)),
    QueryDef("top_bigrams", topBigrams, Some(topBigramsSql)),
    QueryDef("bigram_next_token", bigramNextToken, Some(bigramNextTokenSql)),
    QueryDef("pmi_bigrams", pmiBigrams, Some(pmiBigramsSql)),
    QueryDef("llr_bigrams", llrBigrams, Some(llrBigramsSql)),
    QueryDef("zipf_fit", zipfFit, Some(zipfFitSql)),
    QueryDef("nb_classify", nbClassify, Some(nbClassifySql)),
    QueryDef("bigram_accuracy", bigramAccuracy, Some(bigramAccuracySql)),
    QueryDef("text_normalize", textNormalize, Some(textNormalizeSql)),
    QueryDef("phrase_search", phraseSearch, Some(phraseSearchSql)),
    QueryDef("pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("token_surprisal", tokenSurprisal, Some(tokenSurprisalSql)),
    QueryDef("bigram_surprisal", bigramSurprisal, Some(bigramSurprisalSql)),
    QueryDef("doc_keyword", docKeyword, Some(docKeywordSql)),
    QueryDef("textrank_keywords", textrankKeywords, Some(textrankKeywordsSql)),
    QueryDef("quality_score", qualityScore, Some(qualityScoreSql)),
    QueryDef("quality_classify", qualityClassify, Some(qualityClassifySql)),
    QueryDef("bpe_merges", bpeMerges, Some(bpeMergesSql)),
    QueryDef("token_drift", tokenDrift, Some(tokenDriftSql)),
    QueryDef("token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("doc_fingerprint", docFingerprint, Some(docFingerprintSql)),
    QueryDef("repetition_signals", repetitionSignals, Some(repetitionSignalsSql)),
  )
}
