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
