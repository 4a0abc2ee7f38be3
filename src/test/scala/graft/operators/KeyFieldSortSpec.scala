package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeyFieldSortSpec extends SparkSpec {
  import spark.implicits._

  test("parse: field, char offset, and flags") {
    assert(KeyFieldSort.parse("2n,1r") == Seq(
      KeyFieldSort.KeyPart(2, 1, numeric = true, reverse = false),
      KeyFieldSort.KeyPart(1, 1, numeric = false, reverse = true)))
    assert(KeyFieldSort.parse("3.2nr") == Seq(
      KeyFieldSort.KeyPart(3, 2, numeric = true, reverse = true)))
  }

  test("parse rejects malformed specs") {
    intercept[IllegalArgumentException](KeyFieldSort.parse("x2"))
  }

  test("numeric sort is by value, not lexicographic") {
    val df = Seq("9:a", "10:b", "2:c").toDF("line")
      .select(split(col("line"), ":").as("w"))
    val got = df.orderBy(KeyFieldSort.sortColumns(col("w"), "1n"): _*)
      .select(element_at(col("w"), 2)).as[String].collect().toSeq
    assert(got == Seq("c", "a", "b")) // 2 < 9 < 10
  }

  test("reverse flag flips the order; char offset skips prefix chars") {
    val df = Seq("k1:x9", "k2:x1", "k3:x5").toDF("line")
      .select(split(col("line"), ":").as("w"))
    // field 2 from char 2, numeric, reversed → 9, 5, 1
    val got = df.orderBy(KeyFieldSort.sortColumns(col("w"), "2.2nr"): _*)
      .select(element_at(col("w"), 1)).as[String].collect().toSeq
    assert(got == Seq("k1", "k3", "k2"))
  }

  test("partitionId is stable and within range") {
    val df = Seq("a:1", "b:2", "a:1").toDF("line")
      .select(split(col("line"), ":").as("w"))
    val pids = df.select(KeyFieldSort.partitionId(col("w"), Seq(1), 8).as("p"))
      .as[Long].collect()
    assert(pids.forall(p => p >= 0 && p < 8))
    assert(pids(0) == pids(2)) // same key → same partition
  }
}
