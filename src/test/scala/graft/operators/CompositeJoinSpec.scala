package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompositeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: (Int, String)*) = rows.toDF("k", "v")

  test("inner requires the key in every source") {
    val out = CompositeJoin.inner(Seq(
      src(1 -> "a", 2 -> "b").withColumnRenamed("v", "v1"),
      src(1 -> "x", 3 -> "y").withColumnRenamed("v", "v2")), "k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSet == Set((1, "a", "x")))
  }

  test("inner emits the duplicate-key cross-product") {
    val out = CompositeJoin.inner(Seq(
      src(1 -> "a1", 1 -> "a2").withColumnRenamed("v", "v1"),
      src(1 -> "b1", 1 -> "b2").withColumnRenamed("v", "v2")), "k")
    assert(out.count() == 4)
  }

  test("outer keeps keys missing from some sources as null slots") {
    val out = CompositeJoin.outer(Seq(
      src(1 -> "a").withColumnRenamed("v", "v1"),
      src(2 -> "b").withColumnRenamed("v", "v2")), "k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(out.toSet == Set((1, Some("a"), None), (2, None, Some("b"))))
  }

  test("outer duplicate keys on two sides yield the positional cross-product") {
    // TupleWritable semantics (OuterJoinRecordReader.java:41-44): per key,
    // |A_k| x |B_k| combined rows when both sides hold the key.
    val rnd = new Random(42)
    val a = (1 to 50).map(_ => (rnd.nextInt(8), "a" + rnd.nextInt(100)))
    val b = (1 to 50).map(_ => (rnd.nextInt(8), "b" + rnd.nextInt(100)))
    val out = CompositeJoin.outer(Seq(
      a.toDF("k", "v1"), b.toDF("k", "v2")), "k").count()
    val ca = a.groupBy(_._1).view.mapValues(_.size).toMap
    val cb = b.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = (ca.keySet ++ cb.keySet).toSeq.map { k =>
      math.max(ca.getOrElse(k, 0), 1).toLong * math.max(cb.getOrElse(k, 0), 1)
    }.sum
    assert(out == expected)
  }

  test("override keeps only the right-most source holding each key, full cardinality") {
    // OverrideRecordReader.java:49-90: per key, the winning source's rows
    // pass through at their own cardinality; everything else is skipped.
    val s0 = src(1 -> "s0a", 1 -> "s0b", 2 -> "s0c")
    val s1 = src(1 -> "s1a", 3 -> "s1b")
    val s2 = src(3 -> "s2a", 3 -> "s2b")
    val out = CompositeJoin.overrideJoin(Seq(s0, s1, s2), "k")
      .select("k", "v", "source_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set(
      (1, "s1a", 1),          // s1 overrides s0's two rows for key 1
      (2, "s0c", 0),          // only s0 has key 2
      (3, "s2a", 2), (3, "s2b", 2))) // s2 overrides s1; keeps BOTH its rows
  }

  test("user-defined join types register and dispatch by identifier") {
    // the mapred.join.define.<ident> surface: a per-key "first source
    // only" type, registered then invoked exactly like a built-in
    CompositeJoin.define("firstsrc", (sources, key) =>
      CompositeJoin.taggedUnion(sources)
        .withColumn("_min", org.apache.spark.sql.functions.min($"source_idx")
          .over(org.apache.spark.sql.expressions.Window.partitionBy(key)))
        .filter($"source_idx" === $"_min").drop("_min"))
    val s0 = src(1 -> "s0a", 2 -> "s0b")
    val s1 = src(1 -> "s1a", 3 -> "s1b")
    val out = CompositeJoin("firstsrc", Seq(s0, s1), "k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1, "s0a", 0), (2, "s0b", 0), (3, "s1b", 1)))
    assert(CompositeJoin.definedIdents.contains("firstsrc"))
    // built-ins dispatch through the same registry
    val viaRegistry = CompositeJoin("override", Seq(s0, s1), "k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(viaRegistry == Set((1, "s1a", 1), (2, "s0b", 0), (3, "s1b", 1)))
    intercept[IllegalArgumentException] {
      CompositeJoin("no_such_ident", Seq(s0), "k")
    }
  }

  test("override precedence is deterministic under seeded random inputs") {
    val rnd = new Random(7)
    val sources = (0 until 3).map { i =>
      (1 to 40).map(_ => (rnd.nextInt(10), s"s$i-${rnd.nextInt(100)}")).toDF("k", "v")
    }
    val perSource = sources.map(_.collect().map(r => (r.getInt(0), r.getString(1))))
    val expected = (0 until 10).flatMap { k =>
      perSource.zipWithIndex.reverse.collectFirst {
        case (rows, i) if rows.exists(_._1 == k) =>
          rows.filter(_._1 == k).toSeq.map { case (kk, v) => (kk, v, i) }
      }.getOrElse(Seq.empty[(Int, String, Int)])
    }.toSet
    val got = CompositeJoin.overrideJoin(sources, "k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == expected)
  }
}
