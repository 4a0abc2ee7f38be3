package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = "/root/repo/target/scratch/test-" + name
    p
  }

  test("kvSplit splits at the FIRST separator only; no separator → empty value") {
    val df = Seq("k1\tv1\tv2", "lonely").toDF("value")
    val (k, v) = TextIO.kvSplit(col("value"), "\t")
    val got = df.select(k, v).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSet == Set(("k1", "v1\tv2"), ("lonely", "")))
  }

  test("text KV round trip preserves rows") {
    val path = tmp("textkv")
    val in = Seq((1L, "alpha"), (2L, "beta gamma")).toDF("k", "v")
    TextIO.writeKv(in, "k", "v", "\t", path)
    val back = TextIO.readKv(spark, path, "\t")
      .select(col("k").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSet == Set((1L, "alpha"), (2L, "beta gamma")))
  }

  test("SequenceFile round trip preserves (long, string) records") {
    val path = tmp("seqfile")
    val in = Seq((10L, "ten"), (20L, "twenty")).toDF("k", "v")
    SequenceFileIO.write(in, path)
    val back = SequenceFileIO.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSet == Set((10L, "ten"), (20L, "twenty")))
  }

  test("writeRouted lays out one directory per route value") {
    val path = tmp("routed")
    val in = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("id", "route")
    val back = MultiSink.writeRouted(in, "route", path)
    assert(back.count() == 3)
    assert(Files.exists(Paths.get(path, "route=A")))
    assert(Files.exists(Paths.get(path, "route=B")))
  }

  test("writeNamed writes each filtered side output under its name") {
    val path = tmp("named")
    val in = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "tag")
    val outs = MultiSink.writeNamed(in, Map(
      "xs" -> (col("tag") === "x"), "ys" -> (col("tag") === "y")), path)
    assert(outs.keySet == Set("xs", "ys"))
    assert(spark.read.parquet(s"$path/xs").count() == 2)
    assert(spark.read.parquet(s"$path/ys").count() == 1)
  }

  test("ORC read-back pushes the filter to the scan and prunes columns") {
    val path = tmp("orc")
    Seq((1L, 5.0, "R"), (2L, 7.0, "N"), (3L, 9.0, "R"))
      .toDF("k", "qty", "flag").write.mode("overwrite").orc(path)
    val df = spark.read.orc(path).filter(col("flag") === "R")
      .groupBy(col("flag")).agg(sum(col("qty")).as("s"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(flag), EqualTo(flag,R)]"),
      s"ORC filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<qty:double,flag:string>"),
      s"ORC column pruning missing the k column drop:\n$scan")
    assert(df.collect().head.getDouble(1) == 14.0)
  }

  test("schema'd JSON read skips inference and prunes to the nested leaf") {
    val path = tmp("jsonl")
    Seq((1L, """{"k": 3}"""), (2L, """{"k": 4}"""))
      .toDF("id", "props")
      .select(col("id"), from_json(col("props"), lit("k LONG")).as("props"))
      .write.mode("overwrite").json(path)
    val df = spark.read.schema("id LONG, props STRUCT<k: LONG>").json(path)
      .agg(sum(col("props.k")).as("k_sum"))
    assert(df.collect().head.getLong(0) == 7L)
    // nested-leaf pruning: the JSON scan's ReadSchema keeps only props.k
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("struct<props:struct<k:bigint>>"),
      s"JSON nested pruning did not reach the scan:\n$scan")
  }

  test("compact_files merges 40 small files into the size-targeted count") {
    graft.catalog.IoCatalog.compactFiles(spark, "/root/testdata/sf0.001").collect()
    val scratch = graft.core.Scratch.dir("compact_files", "/root/testdata/sf0.001")
    def parquets(sub: String) =
      new java.io.File(s"$scratch/$sub").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    assert(parquets("small") == 40, "pre-compaction layout should be 40 files")
    // sf0.001 documents ≪ 8 MiB → everything compacts to ONE file
    assert(parquets("compact") == 1,
      s"compaction left ${parquets("compact")} files for a sub-8MiB input")
  }

  test("null-safe join plans as a real equi-join, not a nested loop") {
    val plan = graft.catalog.MrExamples.nullSafeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
      s"EqualNullSafe degenerated to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/sort-merge join on the null-safe key:\n$plan")
  }

  test("JDBC round trip through embedded Derby, partitioned read") {
    val db = tmp("derby") + "/db"
    val in = Seq(("a", 5L), ("b", 7L), ("c", 11L)).toDF("name", "n")
    JdbcIO.write(in, db, "t1")
    val back = JdbcIO.readPartitioned(spark, db, "t1", "n", 0L, 12L, 3)
    assert(back.rdd.getNumPartitions == 3)
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 5L), ("b", 7L), ("c", 11L)))
  }
}
