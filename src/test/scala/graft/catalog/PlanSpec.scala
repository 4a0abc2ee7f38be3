package graft.catalog

import graft.SparkSpec

/** Plan-shape assertions: the scale-design invariants the DuckDB oracle
  * cannot see. Each checks the optimized/physical plan TEXT for the
  * property that makes (or would break) the operator at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("banded dedup candidates come from equi-joins — never a cartesian") {
    val p = plan(LlmPipeline.dedupMinhashLsh(spark, dir))
    assert(!p.contains("CartesianProduct"), "minhash LSH plan has a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "minhash LSH plan has a nested loop")
    val p2 = plan(LlmPipeline.dedupSimhash(spark, dir))
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      "simhash plan is not bucket-joined")
  }

  test("prefix-filtered jaccard joins on shingles, not all pairs") {
    val p = plan(LlmPipeline.ngramJaccard(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ann_lsh is an equi-join on buckets; brute force is the only nested loop") {
    assert(!plan(LlmPipeline.annLsh(spark, dir)).contains("NestedLoop"))
    // the brute-force baseline is EXPECTED to broadcast-nested-loop
    assert(plan(LlmPipeline.annTopK(spark, dir)).contains("BroadcastNestedLoopJoin"))
  }

  test("embed_neardup candidates come from SRP bucket equi-joins — no cartesian") {
    val p = plan(LlmPipeline.embedNearDup(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "embed_neardup plan is not bucket-joined")
  }

  test("bloom probe is the native codegen expression — no Scala UDF in the plan") {
    // the probe lives in an aggregate's result expressions, which the
    // physical toString elides — assert on the optimized logical plan
    val p = Extras.bloomFilter(spark, dir).queryExecution.optimizedPlan.toString
    assert(p.contains("might_contain"), "bloom probe expression missing from the plan")
    assert(!p.contains("UDF"), s"bloom probe still crosses a UDF boundary:\n$p")
  }

  test("partition_prune resolves the day filter against directories, not rows") {
    val p = plan(IoCatalog.partitionPrune(spark, dir))
    assert(p.contains("PartitionFilters: ["), s"no partition filters in scan:\n$p")
    val pf = p.split("PartitionFilters: ")(1).split("]")(0)
    assert(pf.contains("day_bucket"),
      s"day filter not applied at partition level: $pf\n$p")
  }

  test("selective filters reach the parquet scan (pushdown)") {
    val p = plan(Analytics.q3TopRevenue(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters in q3 scan")
  }

  test("q6 is scan-bound: every predicate pushed, no join, two-phase agg") {
    val p = plan(Analytics.q6Revenue(spark, dir))
    // the PushedFilters list is elided in plan text — assert its prefix
    // covers the filter columns and the range predicates started pushing
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)") &&
      p.contains("GreaterThanOrEqual(l_shipda"), s"q6 predicates not pushed:\n$p")
    assert(!p.contains("Join"), "q6 plan grew a join")
    assert(p.contains("partial_sum"), "q6 lost map-side partial aggregation")
  }

  test("column pruning: token_count reads only the columns it uses") {
    val p = plan(TextAnalysis.tokenCount(spark, dir))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("text") && readSchema.contains("source"))
    assert(!readSchema.contains("lang"), "token_count scan reads unused column lang")
  }

  test("total-order sort range-partitions (no single-reducer funnel)") {
    // assert on the sorted frame itself: rank()'s zipWithIndex pass crosses
    // an RDD boundary, so the final frame's plan shows only the RDD scan
    import org.apache.spark.sql.functions.col
    val sorted = graft.operators.TotalOrderSort.sort(
      graft.core.Tables.lineitem(spark, dir), Seq(col("l_orderkey")))
    assert(plan(sorted).toLowerCase.contains("rangepartitioning"),
      "total-order sort is not range partitioned")
  }

  test("bucketed join consumes bucket files with no shuffle on either side") {
    // write the bucketed tables once (same path the catalog query takes)
    IoCatalog.bucketedJoin(spark, dir).collect()
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    // forbid broadcast so the assertion can't pass vacuously at tiny SF —
    // the point is the SHUFFLE-free sort-merge join over bucket files
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(s"g_orders_$key")
        .join(spark.table(s"g_lineitem_$key"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q1 aggregates partially before the shuffle (combiner analog)") {
    val p = plan(Analytics.q1Agg(spark, dir))
    assert(p.contains("HashAggregate"), "q1 lost hash aggregation")
    assert(p.contains("Exchange hashpartitioning"), "q1 missing keyed exchange")
  }

  /** AQE-final plan: execute through the df's own QueryExecution so the
    * AdaptiveSparkPlan's runtime join decisions are locked in before the
    * assertion reads them.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    qe.toRdd.foreachPartition((_: Iterator[_]) => ())
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial plan;
    // assertions must only count operators the final plan actually ran
    qe.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q5 snowflake pin: every dim joins broadcast; the only shuffle is the agg") {
    // regression pin from the round-3 bench audit: q5's time moved 3.9→6.0s
    // round-over-round with identical code; the captured plans proved the
    // plan never changed (environmental GC pressure did). This asserts the
    // good plan stays locked: broadcast dims, no nested loop, and at this SF
    // nothing shuffles except the final aggregation exchange.
    val p = finalPlan(Analytics.q5RegionRevenue(spark, dir))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"q5 lost its broadcast dims ($bhj BroadcastHashJoins):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q5 plan grew a nested loop:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"q5 has $shuffles shuffle exchanges (want ≤2):\n$p")
  }

  test("AQE splits a skewed shuffle join at runtime (the no-salt hot-key path)") {
    // Complements the explicit salting ops (Extras.saltedAgg/saltedJoin):
    // when skew lives in a JOIN key, AQE's OptimizeSkewedJoin splits the
    // oversized partition at runtime with no query rewrite. Thresholds are
    // lowered to make a unit-sized corpus trip the same machinery a 100 TB
    // hot key would.
    import org.apache.spark.sql.functions.{col, lit, md5, when => sqlWhen}
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "65536")   // 64 KB counts as skewed
      spark.conf.set(keys(1), "16384")   // split target 16 KB
      spark.conf.set(keys(2), "-1")      // force a shuffle join
      spark.conf.set(keys(3), "2")       // 2× median is already skew here
      // 90% of fact rows share key 0 → one shuffle partition dwarfs the rest
      val fact = spark.range(200000L).select(
        sqlWhen(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000L).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        md5(col("id").cast("string")).as("dpay"))
      // no aggregation downstream: reusing the join's hash partitioning
      // would make OptimizeSkewedJoin decline (the split breaks it)
      val joined = fact.join(dim, "k").select(col("k"), col("payload"), col("dpay"))
      val p = finalPlan(joined)
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not split the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bm25 probes broadcast: the corpus index never reshuffles for a query batch") {
    val p = plan(LlmPipeline.bm25TopK(spark, dir))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 2, s"bm25 query/df probes are not broadcast ($bhj BHJ):\n$p")
    assert(!p.contains("CartesianProduct"), s"bm25 plan has a cartesian:\n$p")
    // the 1-row corpus-stats broadcast is the only permissible nested-loop
    // SHAPE; the MaxScore serve crosses it into three subtrees (per-term
    // U bounds, seed/θ scoring, final scoring) — all the same bounded
    // 1-row build side
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 3, s"bm25 has $bnlj nested loops (want ≤3 stats crosses):\n$p")
    // the stored-index read must be term-pruned: the query terms reach the
    // postings scan as a pushed In filter (the MapFile seek analog)
    assert(p.contains("PushedFilters: [In(term"),
      s"bm25 postings scan is not term-pruned:\n$p")
  }

  test("kmeans assignment is map-only: centroid literals, no join, no shuffle") {
    val assigned = graft.operators.KMeans.cluster(
      graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding", 4, 1)
    val p = plan(assigned)
    assert(!p.contains("Join"), s"kmeans assignment grew a join:\n$p")
    assert(!p.contains("Exchange"), s"kmeans assignment shuffles:\n$p")
  }

  test("token_surprisal: term join is hash-based; only the 1-row total broadcasts") {
    val p = plan(TextAnalysis.tokenSurprisal(spark, dir))
    assert(!p.contains("CartesianProduct"), s"surprisal plan has a cartesian:\n$p")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"surprisal has $bnlj nested loops (want ≤1 total-row cross):\n$p")
  }

  test("pii_scrub is a single map-only scan reading only doc_id and text") {
    val p = plan(TextAnalysis.piiScrub(spark, dir))
    assert(!p.contains("Join"), s"pii_scrub grew a join:\n$p")
    assert(!p.contains("Exchange"), s"pii_scrub shuffles:\n$p")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"pii_scrub reads unused columns:\n$readSchema")
  }

  test("asof_join is one window pass: a single shuffle on the key, zero join operators") {
    val p = finalPlan(Analytics.asofPurchaseClick(spark, dir))
    assert(!p.contains("Join"), s"asof_join should not contain any join:\n$p")
    // 2 = the clicks (user_id, ts_us) tie-collapse pre-aggregate + the one
    // union shuffle the as-of window itself needs. Anything more means the
    // merge-scan design regressed.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"asof_join wants ≤2 shuffles, got $shuffles:\n$p")
    assert(p.contains("Window"), s"asof_join lost its window operator:\n$p")
  }

  test("range_join pairs via the bucket equi-join — the band predicate never degrades to a nested loop") {
    val p = finalPlan(Analytics.rangeJoinNearby(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range_join degraded to an all-pairs join:\n$p")
    assert(p.contains("band_bin"), s"range_join is not joining on the time bucket:\n$p")
  }

  test("semantic_dedup pairs only within clusters — an equi-join on the cluster id") {
    val p = plan(LlmPipeline.semanticDedup(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic_dedup degraded to all-pairs:\n$p")
    assert(p.contains("cluster"), s"semantic_dedup pair join lost its cluster key:\n$p")
  }

  test("graph ops stay equi-joined: pagerank rounds and triangle wedges never nest-loop") {
    val p = plan(LlmPipeline.pagerank(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank degraded to a nested loop:\n$p")
    val t = plan(LlmPipeline.triangleCount(spark, dir))
    assert(!t.contains("CartesianProduct") && !t.contains("BroadcastNestedLoopJoin"),
      s"triangle_count degraded to a nested loop (wedge close must be one equi-probe):\n$t")
  }

  test("weighted_sample top-k is TakeOrdered — no full global sort, tiny window") {
    val p = plan(LlmPipeline.defs.find(_.name == "weighted_sample").get
      .fn(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted_sample global top-k must be per-partition k + merge:\n$p")
    // the rank window must sit above the k-row limit, never under it
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      s"rank window runs below the top-k limit (full-data window):\n$p")
  }

  test("media decode queries are map-only: no shuffle, no join") {
    for (name <- Seq("image_decode", "audio_decode", "video_decode")) {
      val p = plan(LlmPipeline.defs.find(_.name == name).get.fn(spark, dir))
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
      assert(!p.contains("Join"), s"$name joins:\n$p")
    }
  }

  test("phrase_search probes are equi-joined posting lists — no nested loop") {
    val p = plan(TextAnalysis.defs.find(_.name == "phrase_search").get
      .fn(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phrase adjacency must resolve as (doc_id, pos) equi-joins:\n$p")
  }

  test("scd2_merge shuffles once on the key: the version window reuses the union's partitioning") {
    val p = plan(Extras.defs.find(_.name == "scd2_merge").get.fn(spark, dir))
    // change-compaction window and version window both hash on custkey;
    // no join anywhere (union + windows is the whole merge)
    assert(!p.contains("Join"), s"scd2_merge must not join:\n$p")
  }

  test("props_json_agg: JSON path extraction stays a native expression, no UDF") {
    val p = Analytics.propsJsonAgg(spark, dir).queryExecution.optimizedPlan.toString
    assert(p.contains("get_json_object"), s"json path not a native expression:\n$p")
    assert(!p.contains("UDF"), s"json extraction crosses a UDF boundary:\n$p")
  }

  test("quality_band_filter: the quartile bounds table broadcasts back") {
    val p = plan(LlmPipeline.qualityBandFilter(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"bounds table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("typo_join/bfs/grouped_topk plans stay equi-join shaped") {
    for (q <- Seq("typo_join", "bfs_hops", "grouped_topk")) {
      val df = Algorithms.defs.find(_.name == q).get.fn(spark, dir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q plan has a non-equi join:\n$p")
    }
  }

  test("sssp/label_prop rounds are equi-joins; per-round frames materialized") {
    val p1 = plan(Algorithms.ssspWeighted(spark, dir))
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"),
      s"sssp relaxation is not an equi-join:\n$p1")
    // the returned frame is the materialized last round — an RDD scan, so
    // the lineage (and failure-recovery cost) does not grow with rounds
    assert(p1.contains("ExistingRDD") || p1.contains("Scan ExistingRDD"),
      s"sssp rounds are not checkpoint-materialized:\n$p1")
    val p2 = plan(Algorithms.labelProp(spark, dir))
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"label_prop flood is not an equi-join:\n$p2")
  }

  test("bigram_surprisal: vocabulary-sized count tables broadcast, corpus never re-shuffles on them") {
    val p = plan(TextAnalysis.bigramSurprisal(spark, dir))
    assert(!p.contains("CartesianProduct"), s"bigram_surprisal has a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"count tables did not broadcast back to the corpus side:\n$p")
  }

  test("doc_keyword: df side broadcasts; one window pass per doc") {
    val p = plan(TextAnalysis.docKeyword(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"df table did not broadcast:\n$p")
    assert("Window".r.findAllIn(p).size >= 1 && !p.contains("CartesianProduct"))
  }

  test("split_assign is a map-only scan + rollup: no join, no window") {
    val p = plan(LlmPipeline.splitAssign(spark, dir))
    assert(!p.contains("Join") && !p.contains("Window"),
      s"split_assign grew a join/window it does not need:\n$p")
  }

  test("salted_join pin: fact side never broadcast; only the salt range cross-replicates") {
    val p = finalPlan(Extras.saltedJoin(spark, dir))
    assert(!p.contains("CartesianProduct"), s"salted_join has a cartesian:\n$p")
    // the dim×salt replication is a broadcast cross of a 16-row range — the
    // ONLY permissible nested loop; the fact join itself must be hash-based
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"salted_join has $bnlj nested loops (want ≤1 salt-replication):\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"salted_join fact join is not hash/merge based:\n$p")
  }
}
