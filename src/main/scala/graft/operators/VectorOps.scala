package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector operators: exact cosine similarity, brute-force top-k
  * (the correctness baseline), and sign-bucket LSH ANN (the scale path).
  *
  * Float determinism policy: float summation is order-sensitive, and no
  * cross-engine comparison survives a reordered reduction. So all vector
  * math here quantizes each component to a 48-bit integer
  * (floor(x · 10^6)) and computes dot products / norms as EXACT integer
  * sums (order-independent, ≤ 64 · 10^12 < 2^53 so even engines that pass
  * through doubles stay exact); cosine then does the same float ops
  * (sqrt, divide) in the same order everywhere. Quantization error is
  * ~1e-6 per component — far below any similarity threshold's noise floor.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set against
  * the (huge) corpus — O(n·q) map-side work, one tiny shuffle for the
  * per-query top-k (TakeOrdered-shaped window over query_id). The SRP
  * variants ([[srpPairs]], [[srpTopK]]) replace nested loops with equi-joins
  * on (band, bucket-key): candidates are generated only within hash
  * buckets, trading recall (the LSH S-curve) for join plans that survive a
  * billion-vector corpus.
  */
object VectorOps {
  val Scale = 1000000L

  /** array<float> → array<long>, component = floor(x · 10^6). Native
    * codegen expression ([[graft.functions.QuantizeQ]]); the former HOF
    * composition `transform(vec, x => floor(x.cast(double) * Scale))`
    * computes the identical values through one interpreted lambda call
    * per element — on corpus-scan projections (this function's only use)
    * that interpretation tax rides every row of every vector query.
    */
  def quantize(vec: Column): Column = call_function("quantize_q", vec)

  /** All integer dots go through the native codegen expression
    * ([[graft.functions.DotQ]]) — the HOF composition
    * `aggregate(zip_with(...))` computes the same value through interpreted
    * per-element lambdas.
    */
  private def dotQ(a: Column, b: Column): Column = call_function("dot_q", a, b)

  /** Exact cosine between two quantized vectors (integer dot and norms,
    * identical float tail everywhere).
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Integer squared norm of a quantized vector — computed ONCE per vector
    * and carried alongside it, so pairwise scoring does one dot product
    * instead of three reductions.
    */
  def normQ(vec: Column): Column = dotQ(vec, vec)

  /** [[cosineQ]] with pre-computed squared norms. The integer sums are
    * exact, so hoisting them out of the pair loop cannot change the result
    * — the float tail (sqrt, multiply, divide) is identical.
    */
  def cosineQN(a: Column, b: Column, na: Column, nb: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** DuckDB twin of [[quantize]] + [[cosineQ]] over list expressions. */
  def quantizeSql(vec: String): String =
    s"list_transform($vec, x -> floor(x::DOUBLE * $Scale)::BIGINT)"

  def cosineQSql(qa: String, qb: String, dim: Int): String = {
    val dot = s"list_sum(list_transform(range(1, ${dim + 1}), i -> $qa[i] * $qb[i]))::DOUBLE"
    val na = s"list_sum(list_transform($qa, x -> x * x))::DOUBLE"
    val nb = s"list_sum(list_transform($qb, x -> x * x))::DOUBLE"
    s"$dot / (sqrt($na) * sqrt($nb))"
  }

  /** Brute-force exact top-k: broadcast the query set, score every
    * (query, candidate) pair, keep k best per query. Ranking key is the
    * ROUNDED score (desc) with candidate id tie-break, so the cut is
    * deterministic and portable.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("nv", normQ(col("qv")))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("nq", normQ(col("qq")))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineQN(col("qq"), col("qv"), col("nq"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Fixed-budget audit-query sampler: ~`budget` rows at ANY corpus size,
    * selected as `id % greatest(n div budget, 1) = 0` with `n` folded in
    * as a broadcast 1-row count (no eager driver action). This is the
    * piece that keeps a sampled audit (label-noise screen, hard-negative
    * spot mine) LINEAR at scale: a `% constant` filter grows the query
    * batch with the corpus, and any queries×corpus pass silently goes
    * quadratic — measured exponents 2.13 / 1.72 on a real 10× step before
    * this sampler replaced the constant-mod filters (round 10).
    */
  def auditSample(df: DataFrame, idCol: String, budget: Long): DataFrame = {
    val n = df.agg(count(lit(1)).as("audit_n"))
    df.crossJoin(broadcast(n))
      .where(col(idCol) % greatest(expr(s"audit_n div $budget"), lit(1L))
        === 0)
      .drop("audit_n")
  }

  /** DuckDB twin of [[auditSample]]'s modulus. */
  def auditSampleModSql(table: String, budget: Long): String =
    s"greatest((SELECT count(*) FROM $table) // $budget, 1)"

  /** Hard-negative mining for contrastive training: per query, the top-k
    * nearest candidates whose LABEL DIFFERS from the query's — the pairs a
    * contrastive objective learns most from (similar embedding, different
    * class), mined exactly as retrieval top-k but with the label-mismatch
    * gate applied BEFORE the rank cut (filtering after a plain top-k would
    * drop negatives hiding behind same-label neighbors). Same broadcast
    * query batch / exact integer cosine / rounded-score rank contract as
    * [[bruteForceTopK]]; at scale the candidate source swaps to the
    * LSH/IVF/PQ paths unchanged — the label gate rides the candidate
    * stream either way.
    */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"),
        col(labelCol).as("cand_label"), quantize(col(vecCol)).as("qv"))
      .withColumn("nv", normQ(col("qv")))
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("query_label"), quantize(col(vecCol)).as("qq"))
      .withColumn("nq", normQ(col("qq")))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id") &&
        col("cand_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"), col("cand_id"),
        col("cand_label"),
        round(cosineQN(col("qq"), col("qv"), col("nq"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** DuckDB twin of [[hardNegativesTopK]] over an [[auditSample]]d query
    * batch (`modSql` = the sample modulus expression).
    */
  def hardNegativesSql(table: String, id: String, vec: String, label: String,
                       k: Int, dim: Int, modSql: String): String = {
    val cos = cosineQSql("q.qq", "v.qv", dim)
    s"""WITH v AS (
       |  SELECT $id AS vec_id, $label AS lbl, ${quantizeSql(vec)} AS qv
       |  FROM $table
       |), q AS (
       |  SELECT vec_id AS query_id, lbl AS qlbl, qv AS qq FROM v
       |  WHERE vec_id % $modSql = 0
       |), scored AS (
       |  SELECT q.query_id, q.qlbl AS query_label, v.vec_id AS cand_id,
       |    v.lbl AS cand_label, round($cos, 6) AS score
       |  FROM q CROSS JOIN v
       |  WHERE v.vec_id <> q.query_id AND v.lbl <> q.qlbl
       |)
       |SELECT query_id, query_label, cand_id, cand_label, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= $k""".stripMargin
  }

  // ---- signed-random-projection (SRP) banded LSH --------------------------

  /** Deterministic ±1 hyperplane components: sign(p, c) = +1 iff the first
    * byte of md5("srp:p:c") is even. Rademacher (±1) hyperplanes are a
    * standard sign-LSH family for cosine; the constants are baked into both
    * the Spark plan and the oracle SQL as literals, so the two engines can't
    * drift (no runtime hashing).
    */
  def srpSigns(planes: Int, dim: Int): IndexedSeq[IndexedSeq[Long]] =
    (0 until planes).map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until dim).map { c =>
        md.reset()
        if ((md.digest(s"srp:$p:$c".getBytes("UTF-8"))(0) & 1) == 0) 1L else -1L
      }
    }

  /** array<struct<band, key>> of SRP bucket keys for a quantized vector:
    * bit i of band j is the sign of the integer dot product with plane
    * j·r + i. Integer math throughout — exact and portable. The caller must
    * pass a MATERIALIZED qv column (see the HOF-lambda O(n²) trap on
    * [[graft.operators.MinHashLsh.explodeShingles]]).
    */
  def srpBandKeys(qv: Column, r: Int, bands: Int, dim: Int): Column = {
    val signs = srpSigns(bands * r, dim)
    val structs = (0 until bands).map { b =>
      val key = (0 until r).map { i =>
        val dot = dotQ(qv, typedlit(signs(b * r + i)))
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), key.as("key"))
    }
    array(structs: _*)
  }

  /** Narrow (id, band, key) frame — one row per band per vector. */
  private def bandFrame(v: DataFrame, id: String, qv: String, r: Int,
                        bands: Int, dim: Int): DataFrame =
    v.select(col(id), explode(srpBandKeys(col(qv), r, bands, dim)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Banded SRP threshold-pairs — the ENGINE path for embedding near-dup
    * ([[cosinePairs]] is the brute-force oracle/test baseline). Candidate
    * pairs share at least one of `bands` SRP bucket keys (equi-join on
    * (band, key), never all-pairs), then an exact integer-cosine rescore
    * keeps pairs ≥ threshold (unrounded). Precision is exact; recall follows
    * the LSH S-curve 1 − (1 − p^r)^bands with p = 1 − angle/π.
    *
    * Parameter policy: put the S-curve midpoint (1/bands)^(1/r) at the
    * target threshold's sign-agreement probability; r sets the bucket count
    * (2^r per band) and must grow with log2(corpus size) at production
    * scale. The catalog instance (r=6, bands=16) centers the curve at
    * cosine ≈ 0.4 because this synthetic corpus's near-dups sit barely
    * above random — the same data-pathology note as ngram_jaccard.
    */
  def srpPairs(vectors: DataFrame, idCol: String, vecCol: String,
               r: Int, bands: Int, dim: Int, threshold: Double): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", normQ(col("qv")))
    val banded = bandFrame(v, "id", "qv", r, bands, dim)
    val cand = banded.select(col("band"), col("key"), col("id").as("a"))
      .join(banded.select(col("band"), col("key"), col("id").as("b")),
        Seq("band", "key"))
      .where(col("a") < col("b")).select("a", "b").distinct()
    cand.join(v.select(col("id").as("a"), col("qv").as("va"), col("n2").as("na")), "a")
      .join(v.select(col("id").as("b"), col("qv").as("vb"), col("n2").as("nb")), "b")
      .withColumn("cos_raw", cosineQN(col("va"), col("vb"), col("na"), col("nb")))
      .where(col("cos_raw") >= threshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos_raw"), 6).as("cosine"))
  }

  /** Multi-table SRP ANN — `bands` independent hash tables OR-combined:
    * a candidate shares ≥ 1 bucket key with the query in any band, then
    * exact rescore and top-k per query. Per-neighbor recall is the same
    * S-curve as [[srpPairs]]; measured against [[bruteForceTopK]] ground
    * truth in VectorOpsSpec.
    */
  def srpTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, r: Int, bands: Int, dim: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("nv", normQ(col("qv")))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("nq", normQ(col("qq")))
    val pairs = bandFrame(cand, "cand_id", "qv", r, bands, dim)
      .join(bandFrame(q, "query_id", "qq", r, bands, dim), Seq("band", "key"))
      .where(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()
    val scored = pairs.join(cand, "cand_id").join(q, "query_id")
      .select(col("query_id"), col("cand_id"),
        round(cosineQN(col("qq"), col("qv"), col("nq"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ---- IVF (inverted-file) ANN --------------------------------------------

  /** IVF ANN — the cluster-routed counterpart to [[srpTopK]]:
    *   1. centroids: the corpus rows with `id % centroidMod == 1` — a
    *      deterministic seed sample standing in for a k-means codebook
    *      (nlist grows with the corpus, as IVF wants), portable to the
    *      oracle because it involves no RNG;
    *   2. inverted lists: every corpus vector is assigned to its nearest
    *      centroid — a broadcast of the (small) codebook, one map-side
    *      argmax via partial-aggregated max(struct(score, -id)) — NO
    *      shuffle of the n×nlist scored frame;
    *   3. probe: each query scores the codebook, keeps its `nprobe`
    *      closest lists, equi-joins the inverted lists on centroid id, and
    *      rescores candidates exactly.
    * Recall = P(true neighbor's list probed): high when the corpus is
    * clustered (the IVF assumption); on this synthetic near-uniform corpus
    * it degrades toward nprobe/nlist — measured in VectorOpsSpec, where
    * probing every list is asserted EQUAL to the exact brute force.
    */
  /** @param centroids optional prebuilt codebook source (rows with `idCol`,
    *        `vecCol`) — the production shape where the codebook was trained
    *        offline (or on an earlier corpus snapshot) and new arrivals are
    *        assigned WITHOUT retraining; defaults to the in-corpus
    *        deterministic seed sample.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, centroidMod: Int, nprobe: Int, k: Int,
              centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("nv", normQ(col("qv")))
    val cent = centroids
      .getOrElse(corpus.where(col(idCol) % centroidMod === 1))
      .select(col(idCol).as("cent_id"), quantize(col(vecCol)).as("cv"))
      .withColumn("nc", normQ(col("cv")))
    // nearest centroid per corpus vector; ties → smaller cent_id (portable)
    val best = cand.crossJoin(broadcast(cent))
      .select(col("cand_id"),
        struct(cosineQN(col("qv"), col("cv"), col("nv"), col("nc")).as("s"),
          (-col("cent_id")).as("nid")).as("sc"))
      .groupBy("cand_id").agg(max(col("sc")).as("m"))
      .select(col("cand_id"), (-col("m.nid")).as("cent_id"))
    val assigned = cand.join(best, "cand_id")
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("nq", normQ(col("qq")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("qscore", cosineQN(col("qq"), col("cv"), col("nq"), col("nc")))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("qq"), col("nq"), col("cent_id"))
    val scored = probes.join(assigned, "cent_id")
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineQN(col("qq"), col("qv"), col("nq"), col("nv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** DuckDB twin of [[ivfTopK]] (queries = rows with id % queryMod = 0). */
  def ivfTopKSql(table: String, id: String, vec: String, centroidMod: Int,
                 nprobe: Int, k: Int, dim: Int, queryMod: Int): String =
    ivfTopKSql(table, id, vec, s"id % $centroidMod = 1", nprobe, k, dim,
      queryMod.toString)

  /** As above with the codebook predicate and query modulus as SQL — the
    * index-refresh composite trains centroids on the base slice only and
    * audits with a derived fixed-budget modulus.
    */
  def ivfTopKSql(table: String, id: String, vec: String,
                 centWhereSql: String, nprobe: Int, k: Int, dim: Int,
                 queryModSql: String): String =
    s"""WITH v AS (
       |  SELECT $id AS id, ${quantizeSql(vec)} AS qv FROM $table
       |), c AS (
       |  SELECT id AS cent_id, qv AS cv FROM v WHERE $centWhereSql
       |), assign AS (
       |  SELECT cand_id, cent_id FROM (
       |    SELECT v.id AS cand_id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${cosineQSql("v.qv", "c.cv", dim)} DESC, c.cent_id) AS rn
       |    FROM v CROSS JOIN c)
       |  WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, cent_id FROM (
       |    SELECT q.id AS query_id, c.cent_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cosineQSql("q.qv", "c.cv", dim)} DESC, c.cent_id) AS rn
       |    FROM v q CROSS JOIN c WHERE q.id % ($queryModSql) = 0)
       |  WHERE rn <= $nprobe
       |), scored AS (
       |  SELECT p.query_id, a.cand_id,
       |    round(${cosineQSql("vq.qv", "vc.qv", dim)}, 6) AS score
       |  FROM probes p
       |  JOIN assign a ON a.cent_id = p.cent_id AND a.cand_id <> p.query_id
       |  JOIN v vq ON vq.id = p.query_id
       |  JOIN v vc ON vc.id = a.cand_id
       |)
       |SELECT query_id, cand_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= $k""".stripMargin

  // ---- PQ (product-quantization) ANN --------------------------------------

  /** Product-quantization ANN — the memory-compression member of the ANN
    * family (IVF routes, SRP hashes, PQ COMPRESSES): the vector splits into
    * `m` subspaces, each subspace gets a `cbSize`-entry codebook, and every
    * corpus vector's index entry is just `m` small codes (m·log₂cbSize
    * bits instead of dim floats — a 32× memory cut at the catalog geometry,
    * which at 100 TB is the difference between an index that fits in
    * cluster RAM and one that doesn't). ADC (asymmetric distance
    * computation) scores a candidate as Σ_m lut_m[code_m], where lut_m is
    * the query's precomputed distance to each codebook entry of subspace m
    * — no raw vector is touched until the refine stage.
    *
    * Determinism: the codebook is the first `cbSize` vectors by id, sliced
    * per subspace (the [[KMeans]]-init seed convention standing in for a
    * trained codebook, exactly like [[ivfTopK]]'s seed centroids — no RNG,
    * so the oracle replays it); encode argmin ties break to the lower code;
    * all distances are exact integer squared-L2 over quantized components.
    *
    * Two-stage serving (the production IVFPQ+refine shape): ADC over the
    * compressed codes prunes the corpus to a per-query `shortlist`, then an
    * EXACT integer squared-L2 rescore over just those shortlist·|queries|
    * raw vectors picks the final top-k — the index answers from codes, and
    * original vectors are read only for the tiny refine set.
    *
    * Scale shape: the codebook is m·cbSize·(dim/m) = cbSize·dim longs —
    * collected once (the k-means-centroid pattern) and baked into BOTH the
    * encode and the LUT expressions as literals, so ENCODE is map-only
    * (struct-min over cbSize literal distances per subspace, no join) and
    * ADC SCORING is a broadcast of the tiny query LUT frame against the
    * coded corpus — per-candidate work is m array lookups, not a
    * dim-length dot product. The shortlist (queries·shortlist rows) then
    * broadcasts back against the corpus for the refine join; the per-query
    * top-k windows only ever see shortlist-sized groups.
    */
  /** The PQ INDEX build — quantize the corpus and encode every vector as
    * `m` codebook codes. This is the expensive, corpus-sized half of
    * [[pqTopK]] (map-only, but m·cbSize distance expressions per row);
    * the production shape is build-once-serve-many, so catalog consumers
    * memoize this frame ([[graft.core.Shared]]) and pass it back via
    * `pqTopK(prebuilt = ...)` — the BM25 index/serve split. Columns:
    * `cand_id`, `code_0..code_{m-1}`.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, cbSize: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val cand = corpus.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("qv"))
    val cb = pqCodebook(cand, m, cbSize, sub)
    // encode: per subspace, argmin over the cbSize-entry LITERAL codebook
    // (tie → lower j) via a runtime transform loop. The former inlined
    // form (`array(struct(d2, j) × cbSize)` per subspace — m·cbSize = 256
    // distance trees per projection) claimed to stay within one codegen
    // stage but in fact blew janino's 64 KB method limit: every fresh
    // index build paid a failing multi-second compile and then ran the
    // whole stage interpreted anyway (round-13 verify/bench logs). The
    // transform lambda computes the identical exact-integer distance
    // (|x|² − 2·x·c_j + |c_j|², with |c_j|² now dot_q(c,c) instead of a
    // precomputed literal) and the identical struct-min tie-break; the
    // index's (element, index) lambda keeps code_mi IntegerType, matching
    // the stored pq_codes/ivfpq_index artifact schema. Measured at sf0.1
    // (BenchOne attempt 1 = cold JVM + fresh build + serve): ann_pq
    // 13.4 → 10.8 s, ann_ivfpq 4.3 → 3.8 s, and zero codegen errors.
    val codeCols = (0 until m).map { mi =>
      val xs = slice(col("qv"), mi * sub + 1, sub)
      val nx = dotQ(xs, xs)
      val cbl = typedlit(cb(mi).map(_.toSeq).toSeq)
      array_min(transform(cbl, (c, j) =>
        struct((nx - lit(2L) * dotQ(xs, c) + dotQ(c, c)).as("d"),
          j.as("j"))))
        .getField("j").as(s"code_$mi")
    }
    cand.select(col("cand_id") +: codeCols: _*)
  }

  /** Deterministic seed codebook: subspace slices of the first `cbSize`
    * corpus vectors by id — a bounded `cbSize`-row collect (the
    * k-means-centroid pattern), re-derived cheaply wherever the literal
    * entries are baked into an expression (encode AND query LUTs), so a
    * memoized code frame and a fresh serve path always agree.
    */
  private def pqCodebook(cand: DataFrame, m: Int, cbSize: Int,
                         sub: Int): Array[Array[Array[Long]]] = {
    val seeds: Array[Array[Long]] = cand.orderBy(col("cand_id")).limit(cbSize)
      .collect().map(_.getSeq[Long](1).toArray)
    require(seeds.length == cbSize,
      s"PQ codebook needs ≥ $cbSize vectors, corpus has only ${seeds.length}")
    // cb(mi)(j) = subspace-mi slice of seed j
    Array.tabulate(m, cbSize) { (mi, j) =>
      seeds(j).slice(mi * sub, (mi + 1) * sub)
    }
  }

  /** Query-side ADC lookup table for subspace `mi`: a runtime `transform`
    * over the LITERAL codebook slice instead of `cbSize` inlined distance
    * trees. The inlined form (`array(d2 × cbSize)` per subspace, m·cbSize
    * = 256 trees per projection at the catalog geometry) generated a
    * janino "Code grows beyond 64 KB" method — the whole LUT stage then
    * re-paid a failing multi-second compile on EVERY execution and ran
    * interpreted anyway (round-13 verify log, ann_pq/ann_ivfpq). The
    * lambda math is unchanged and exact: lut[j] = |q|² − 2·q·c_j + |c_j|²
    * over quantized integers (|c_j|² was a precomputed literal before;
    * dot_q(c, c) computes the same value). Higher-order functions are
    * eval-mode, but this projection only ever runs over the bounded QUERY
    * frame; [[pqEncode]] applies the same device to the corpus-sized
    * build for the same reason (its inlined form failed identically).
    */
  private def adcLut(qq: Column, mi: Int, sub: Int,
                     cbMi: Array[Array[Long]]): Column = {
    val qs = slice(qq, mi * sub + 1, sub)
    val nq = dotQ(qs, qs)
    transform(typedlit(cbMi.map(_.toSeq).toSeq),
      c => nq - lit(2L) * dotQ(qs, c) + dotQ(c, c))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, m: Int, cbSize: Int, dim: Int,
             shortlist: Int, k: Int,
             prebuilt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val cand = corpus.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("qv"))
    val cb = pqCodebook(cand, m, cbSize, sub)
    val encoded = prebuilt.getOrElse(
      pqEncode(corpus, idCol, vecCol, m, cbSize, dim))
    // query LUTs: lut_mi[j+1] = sq-L2(query subvector mi, codebook entry j)
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qq"))
    val lutCols = (0 until m).map(mi =>
      adcLut(col("qq"), mi, sub, cb(mi)).as(s"lut_$mi"))
    val qlut = q.select(col("query_id") +: lutCols: _*)
    val adc = encoded.crossJoin(broadcast(qlut))
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (0 until m).map(mi =>
          element_at(col(s"lut_$mi"), col(s"code_$mi") + 1)).reduce(_ + _)
          .as("adc_dist"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("cand_id"))
    val short = adc.withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= shortlist).select("query_id", "cand_id")
    // refine: exact integer sq-L2 over the shortlist only — the raw vectors
    // are read for shortlist·|queries| candidates, never the whole corpus
    val rescored = cand.join(broadcast(short), "cand_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("cand_id"),
        (dotQ(col("qv"), col("qv")) - lit(2L) * dotQ(col("qv"), col("qq")) +
          dotQ(col("qq"), col("qq"))).as("sq_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq_dist"), col("cand_id"))
    rescored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVFPQ + refine — the full production ANN serving shape, composing
    * the family's two scale devices: IVF ROUTES (each query probes only
    * its `nprobe` nearest centroid lists) and PQ COMPRESSES (candidates
    * in the probed lists are scored by ADC over m small codes, raw
    * vectors touched only in the exact refine of the shortlist). The
    * flat-PQ path ([[pqTopK]]) scores every corpus code for every query
    * — fine as a baseline, but its serving cost is |queries|·|corpus|,
    * and with a workload-shaped query batch that is quadratic in corpus
    * growth; here each query's ADC work is ~nprobe·(corpus/nlist), and
    * nlist grows with the corpus (the seed-centroid convention), so
    * per-query work stays ~constant and batch serving stays ~linear.
    *
    * Determinism: routing uses the SAME exact integer squared-L2 as the
    * ADC/refine stages (assignment and probe ties break to the lower
    * centroid id), the codebook is [[pqTopK]]'s seed convention, and the
    * oracle replays every stage — no RNG anywhere.
    *
    * With `nprobe ≥ nlist` every list is probed and the output is
    * IDENTICAL to flat [[pqTopK]] (spec-pinned — the [[ivfTopK]]
    * probe-everything anchor), which makes the routing's candidate
    * restriction the ONLY semantic difference, attested rather than
    * assumed.
    */
  /** The IVFPQ INDEX build: PQ codes + each vector's inverted-list id —
    * the whole per-corpus state of [[ivfPqTopK]]'s serving path (the
    * assignment's corpus×nlist scoring is the expensive half; it belongs
    * in the build-once artifact, never in a serve). Columns: `cand_id`,
    * `code_0..code_{m-1}`, `cent_id`.
    */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 centroidMod: Int, m: Int, cbSize: Int,
                 dim: Int): DataFrame = {
    val cand = corpus.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("qv"))
    val cent = corpus.where(col(idCol) % centroidMod === 1)
      .select(col(idCol).as("cent_id"), quantize(col(vecCol)).as("cv"))
    def d2c(a: Column, b: Column): Column =
      dotQ(a, a) - lit(2L) * dotQ(a, b) + dotQ(b, b)
    // inverted lists: nearest centroid per corpus vector (tie → lower id),
    // one struct-min partial aggregate — the n×nlist frame never shuffles
    val assigned = cand.crossJoin(broadcast(cent))
      .select(col("cand_id"),
        struct(d2c(col("qv"), col("cv")).as("d"), col("cent_id").as("cid"))
          .as("sc"))
      .groupBy("cand_id").agg(min(col("sc")).as("sc"))
      .select(col("cand_id"), col("sc.cid").as("cent_id"))
    pqEncode(corpus, idCol, vecCol, m, cbSize, dim).join(assigned, "cand_id")
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, centroidMod: Int, nprobe: Int, m: Int,
                cbSize: Int, dim: Int, shortlist: Int, k: Int,
                prebuiltIndex: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val cand = corpus.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("qv"))
    val cent = corpus.where(col(idCol) % centroidMod === 1)
      .select(col(idCol).as("cent_id"), quantize(col(vecCol)).as("cv"))
    // exact integer sq-L2 between two quantized array columns
    def d2c(a: Column, b: Column): Column =
      dotQ(a, a) - lit(2L) * dotQ(a, b) + dotQ(b, b)
    val codes = prebuiltIndex.getOrElse(
      ivfPqIndex(corpus, idCol, vecCol, centroidMod, m, cbSize, dim))
    val cb = pqCodebook(cand, m, cbSize, sub)
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qq"))
    // probes: each query's nprobe nearest lists (same metric, same ties)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("pd"), col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("pd", d2c(col("qq"), col("cv")))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("cent_id"))
    // query LUTs via [[adcLut]] — the inlined-array form blew the 64 KB
    // codegen method limit here exactly as in [[pqTopK]]
    val lutCols = (0 until m).map(mi =>
      adcLut(col("qq"), mi, sub, cb(mi)).as(s"lut_$mi"))
    val qlut = q.select(col("query_id") +: lutCols: _*)
    // ADC only inside the probed lists: codes ⋈ (small) probes on the
    // list id, LUTs broadcast in by query
    val adc = codes.join(broadcast(probes), "cent_id")
      .join(broadcast(qlut), "query_id")
      .where(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (0 until m).map(mi =>
          element_at(col(s"lut_$mi"), col(s"code_$mi") + 1)).reduce(_ + _)
          .as("adc_dist"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("cand_id"))
    val short = adc.withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= shortlist).select("query_id", "cand_id")
    val rescored = cand.join(broadcast(short), "cand_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("cand_id"),
        (dotQ(col("qv"), col("qv")) - lit(2L) * dotQ(col("qv"), col("qq")) +
          dotQ(col("qq"), col("qq"))).as("sq_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq_dist"), col("cand_id"))
    rescored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** DuckDB twin of [[ivfPqTopK]] (queries = rows with id % queryMod = 0). */
  def ivfPqTopKSql(table: String, id: String, vec: String, centroidMod: Int,
                   nprobe: Int, m: Int, cbSize: Int, dim: Int,
                   shortlist: Int, k: Int, queryMod: Int): String = {
    val sub = dim / m
    def sq(v: String, cvi: String) =
      s"list_sum(list_transform(range(1, ${sub + 1}), i -> ($v[mi * $sub + i] - $cvi[i]) * ($v[mi * $sub + i] - $cvi[i])))"
    def sqFull(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    s"""WITH v AS (
       |  SELECT $id AS vid, ${quantizeSql(vec)} AS qv FROM $table
       |), c AS (
       |  SELECT vid AS cent_id, qv AS cv FROM v WHERE vid % $centroidMod = 1
       |), assign AS (
       |  SELECT vid AS cand_id, cent_id FROM (
       |    SELECT v.vid, c.cent_id,
       |      row_number() OVER (PARTITION BY v.vid
       |        ORDER BY ${sqFull("v.qv", "c.cv")}, c.cent_id) AS rn
       |    FROM v CROSS JOIN c)
       |  WHERE rn = 1
       |), seeds AS (
       |  SELECT qv, row_number() OVER (ORDER BY vid) - 1 AS j
       |  FROM v ORDER BY vid LIMIT $cbSize
       |), cb AS (
       |  SELECT mi, j, qv[mi * $sub + 1 : (mi + 1) * $sub] AS cv
       |  FROM seeds CROSS JOIN (SELECT unnest(range($m)) AS mi) s
       |), enc AS (
       |  SELECT vid AS cand_id, mi, j AS code FROM (
       |    SELECT v.vid, cb.mi, cb.j, ${sq("v.qv", "cb.cv")} AS d
       |    FROM v CROSS JOIN cb)
       |  QUALIFY row_number() OVER (PARTITION BY vid, mi ORDER BY d, j) = 1
       |), probes AS (
       |  SELECT query_id, cent_id FROM (
       |    SELECT q.vid AS query_id, c.cent_id,
       |      row_number() OVER (PARTITION BY q.vid
       |        ORDER BY ${sqFull("q.qv", "c.cv")}, c.cent_id) AS rn
       |    FROM v q CROSS JOIN c WHERE q.vid % $queryMod = 0)
       |  WHERE rn <= $nprobe
       |), lut AS (
       |  SELECT q.vid AS query_id, cb.mi, cb.j, ${sq("q.qv", "cb.cv")} AS d
       |  FROM v q CROSS JOIN cb WHERE q.vid % $queryMod = 0
       |), short AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT p.query_id, e.cand_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
       |    FROM enc e
       |    JOIN assign a ON a.cand_id = e.cand_id
       |    JOIN probes p ON p.cent_id = a.cent_id
       |    JOIN lut l ON l.mi = e.mi AND l.j = e.code
       |      AND l.query_id = p.query_id
       |    WHERE e.cand_id <> p.query_id
       |    GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dist, cand_id) <= $shortlist
       |), rescored AS (
       |  SELECT s.query_id, s.cand_id,
       |    CAST(${sqFull("vq.qv", "vc.qv")} AS BIGINT) AS sq_dist
       |  FROM short s
       |  JOIN v vq ON vq.vid = s.query_id
       |  JOIN v vc ON vc.vid = s.cand_id
       |)
       |SELECT query_id, cand_id, sq_dist,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sq_dist, cand_id) AS INTEGER) AS rank
       |FROM rescored
       |QUALIFY rank <= $k""".stripMargin
  }

  /** DuckDB twin of [[pqTopK]] (queries = rows with id % queryMod = 0). */
  def pqTopKSql(table: String, id: String, vec: String, m: Int, cbSize: Int,
                dim: Int, shortlist: Int, k: Int, queryMod: Int): String = {
    val sub = dim / m
    def sq(v: String, cvi: String) =
      s"list_sum(list_transform(range(1, ${sub + 1}), i -> ($v[mi * $sub + i] - $cvi[i]) * ($v[mi * $sub + i] - $cvi[i])))"
    val exact =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> (vq.qv[i] - vc.qv[i]) * (vq.qv[i] - vc.qv[i])))"
    s"""WITH v AS (
       |  SELECT $id AS vid, ${quantizeSql(vec)} AS qv FROM $table
       |), seeds AS (
       |  SELECT qv, row_number() OVER (ORDER BY vid) - 1 AS j
       |  FROM v ORDER BY vid LIMIT $cbSize
       |), cb AS (
       |  SELECT mi, j, qv[mi * $sub + 1 : (mi + 1) * $sub] AS cv
       |  FROM seeds CROSS JOIN (SELECT unnest(range($m)) AS mi) s
       |), enc AS (
       |  SELECT vid AS cand_id, mi, j AS code FROM (
       |    SELECT v.vid, cb.mi, cb.j, ${sq("v.qv", "cb.cv")} AS d
       |    FROM v CROSS JOIN cb)
       |  QUALIFY row_number() OVER (PARTITION BY vid, mi ORDER BY d, j) = 1
       |), lut AS (
       |  SELECT q.vid AS query_id, cb.mi, cb.j, ${sq("q.qv", "cb.cv")} AS d
       |  FROM v q CROSS JOIN cb WHERE q.vid % $queryMod = 0
       |), short AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT l.query_id, e.cand_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
       |    FROM enc e JOIN lut l ON l.mi = e.mi AND l.j = e.code
       |    WHERE e.cand_id <> l.query_id
       |    GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dist, cand_id) <= $shortlist
       |), rescored AS (
       |  SELECT s.query_id, s.cand_id, CAST($exact AS BIGINT) AS sq_dist
       |  FROM short s
       |  JOIN v vq ON vq.vid = s.query_id
       |  JOIN v vc ON vc.vid = s.cand_id
       |)
       |SELECT query_id, cand_id, sq_dist,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sq_dist, cand_id) AS INTEGER) AS rank
       |FROM rescored
       |QUALIFY rank <= $k""".stripMargin
  }

  // ---- DuckDB oracle twins for the SRP paths ------------------------------

  /** VALUES rows `(plane_index, [±1, …])` mirroring [[srpSigns]]. */
  def srpSignsSqlValues(planes: Int, dim: Int): String =
    srpSigns(planes, dim).zipWithIndex
      .map { case (s, i) => s"($i, [${s.mkString(", ")}])" }.mkString(", ")

  /** Shared oracle CTE bodies: quantized vectors `v(id, qv)` and band keys
    * `bk(id, band, key)` over `table`. */
  private def srpBandSqlCtes(table: String, id: String, vec: String,
                             r: Int, bands: Int, dim: Int): String =
    s"""v AS (
       |  SELECT $id AS id, ${quantizeSql(vec)} AS qv FROM $table
       |), pl AS (
       |  SELECT * FROM (VALUES ${srpSignsSqlValues(bands * r, dim)}) p(i, signs)
       |), bits AS (
       |  SELECT v.id, pl.i // $r AS band,
       |    CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
       |      c -> pl.signs[c] * v.qv[c])) >= 0
       |      THEN (1::BIGINT << (pl.i % $r)) ELSE 0 END AS bit
       |  FROM v CROSS JOIN pl
       |), bk AS (
       |  SELECT id, band, sum(bit)::BIGINT AS key FROM bits GROUP BY id, band
       |)""".stripMargin

  /** DuckDB twin of [[srpPairs]]. */
  def srpPairsSql(table: String, id: String, vec: String, r: Int, bands: Int,
                  dim: Int, threshold: Double): String =
    s"""WITH ${srpBandSqlCtes(table, id, vec, r, bands, dim)}, cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key AND x.id < y.id
       |), scored AS (
       |  SELECT c.a, c.b, ${cosineQSql("va.qv", "vb.qv", dim)} AS cos_raw
       |  FROM cand c JOIN v va ON va.id = c.a JOIN v vb ON vb.id = c.b
       |)
       |SELECT a AS vec_a, b AS vec_b, round(cos_raw, 6) AS cosine
       |FROM scored WHERE cos_raw >= $threshold""".stripMargin

  /** DuckDB twin of [[srpTopK]] (queries = rows with id % queryMod = 0). */
  def srpTopKSql(table: String, id: String, vec: String, r: Int, bands: Int,
                 dim: Int, k: Int, queryMod: Int): String =
    srpTopKSql(table, id, vec, r, bands, dim, k, queryMod.toString)

  /** [[srpTopKSql]] with the modulus as a SQL expression — the
    * [[auditSampleModSql]] fixed-budget form for audit consumers. */
  def srpTopKSql(table: String, id: String, vec: String, r: Int, bands: Int,
                 dim: Int, k: Int, queryModSql: String): String =
    s"""WITH ${srpBandSqlCtes(table, id, vec, r, bands, dim)}, cand AS (
       |  SELECT DISTINCT q.id AS query_id, x.id AS cand_id
       |  FROM bk x JOIN bk q ON x.band = q.band AND x.key = q.key
       |  WHERE q.id % ($queryModSql) = 0 AND x.id <> q.id
       |), scored AS (
       |  SELECT c.query_id, c.cand_id,
       |    round(${cosineQSql("vq.qv", "vc.qv", dim)}, 6) AS score
       |  FROM cand c JOIN v vq ON vq.id = c.query_id
       |              JOIN v vc ON vc.id = c.cand_id
       |)
       |SELECT query_id, cand_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, cand_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= $k""".stripMargin

  /** Exact cosine-threshold near-dup pairs; brute force — oracle/test
    * baseline ONLY (quadratic by design; the engine path is [[srpPairs]]).
    * Filter is on the unrounded score.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("a"), quantize(col(vecCol)).as("va"))
    val b = vectors.select(col(idCol).as("b"), quantize(col(vecCol)).as("vb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("cos_raw", cosineQ(col("va"), col("vb")))
      .where(col("cos_raw") >= threshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        round(col("cos_raw"), 6).as("cosine"))
  }

  /** Greedy k-center (farthest-point-first, Gonzalez 1985) diverse subset
    * selection — the training-mix counterpart of dedup: where SemDeDup
    * REMOVES the most-similar docs, this SELECTS the k mutually most
    * DISSIMILAR ones (2-approximation to the optimal k-center cover).
    * Round shape is pure distributed scan-and-argmin: each candidate
    * carries one running scalar `ms` (max cosine to any selected vector);
    * a round broadcasts the newly selected vector as a LITERAL (the
    * 1-row kmeans-centroid pattern), updates `ms` map-only, and collects
    * the argmin row. No pairwise materialization ever — k·n scores total
    * vs n²/2 for the distance matrix.
    *
    * Determinism: ranking on the ROUNDED cosine with id tie-break (the
    * [[bruteForceTopK]] convention), integer dot/norms underneath, so
    * the oracle replays every pick as chained CTEs. `sim_at_pick` (the
    * pick's distance-to-set, a coverage-radius proxy) is NULL for the
    * seed (id-min — no set to measure against yet).
    */
  def kCenterSelect(vectors: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 2, s"k-center needs k >= 2, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._

    val base = graft.core.Materialize(
      vectors.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv")))
    val seed = base.orderBy(col("id")).limit(1).head()
    val seedId = seed.getLong(0)
    var picks = List[(Int, Long, Option[Double])]((1, seedId, None))
    var cand = graft.core.Materialize(base.where(col("id") =!= seedId)
      .withColumn("ms",
        round(cosineQ(col("qv"), typedLit(seed.getSeq[Long](1))), 6)))
    for (r <- 2 to k) {
      val pick = cand.orderBy(col("ms").asc, col("id").asc).limit(1).head()
      val (pid, pv, pms) = (pick.getLong(0), pick.getSeq[Long](1), pick.getDouble(2))
      picks ::= ((r, pid, Some(pms)))
      if (r < k)
        cand = graft.core.Materialize(cand.where(col("id") =!= pid)
          .withColumn("ms",
            greatest(col("ms"), round(cosineQ(col("qv"), typedLit(pv)), 6))))
    }
    picks.reverse.toDF("pick_order", "vec_id", "sim_at_pick")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick k results maximizing `λ·relevance − (1−λ)·max-sim-to-
    * selected` — the retrieval-side twin of [[kCenterSelect]] (same
    * scan-and-argmax round shape, one running `ms` scalar per candidate, a
    * 1-row pick collected per round, the newly picked vector broadcast as
    * a literal) with the objective flipped from pure coverage to
    * relevance-diversity trade-off. This is the standard de-redundancy
    * pass over an ANN shortlist before results ship.
    *
    * The query vector is the id-min row (deterministic; production passes
    * a real query — the plan is identical). Relevance = cosine to the
    * query; λ = `lambdaPct`/100. First pick is pure relevance (no selected
    * set yet; its `ms` column is born at the first update, not faked as
    * 0 — a fake 0 floor would be wrong when every true similarity is
    * negative). Determinism: all ranking on ROUNDED cosines with id
    * tie-break, so the oracle replays each round as a chained CTE.
    */
  def mmrSelect(vectors: DataFrame, idCol: String, vecCol: String,
                k: Int, lambdaPct: Int): DataFrame = {
    require(k >= 2, s"MMR needs k >= 2, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    // both weights derived by the SAME ÷100 the oracle's printed literals
    // parse to — `1.0 - lam` would differ from the parsed "0.3" by 1 ulp
    val lam = lambdaPct / 100.0
    val mu = (100 - lambdaPct) / 100.0
    def score(rel: Column, ms: Column): Column =
      round(lit(lam) * rel - lit(mu) * ms, 6)

    val base = graft.core.Materialize(
      vectors.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv")))
    val q = base.orderBy(col("id")).limit(1).head()
    val qId = q.getLong(0)
    val rel = graft.core.Materialize(base.where(col("id") =!= qId)
      .withColumn("rel", round(cosineQ(col("qv"), typedLit(q.getSeq[Long](1))), 6)))

    // pick-1 score computed ENGINE-side (round() is HALF_UP in both Spark
    // and DuckDB; a driver-side math.rint would round half-to-even)
    val p1 = rel.withColumn("s", round(lit(lam) * col("rel"), 6))
      .orderBy(col("rel").desc, col("id").asc).limit(1).head()
    var picks = List[(Int, Long, Double)]((1, p1.getLong(0), p1.getDouble(3)))
    var cand = graft.core.Materialize(rel.where(col("id") =!= p1.getLong(0))
      .withColumn("ms", round(cosineQ(col("qv"), typedLit(p1.getSeq[Long](1))), 6)))
    for (r <- 2 to k) {
      val pick = cand.withColumn("s", score(col("rel"), col("ms")))
        .orderBy(col("s").desc, col("id").asc).limit(1).head()
      picks ::= ((r, pick.getLong(0), pick.getDouble(4)))
      if (r < k)
        cand = graft.core.Materialize(cand.where(col("id") =!= pick.getLong(0))
          .withColumn("ms", greatest(col("ms"),
            round(cosineQ(col("qv"), typedLit(pick.getSeq[Long](1))), 6))))
    }
    picks.reverse.toDF("pick_order", "vec_id", "mmr_score")
  }
}
