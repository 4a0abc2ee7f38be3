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

  test("parseK: full -k grammar with end positions and flags on either pos") {
    assert(KeyFieldSort.parseK("-k2.3,4.5nr -k1") == Seq(
      KeyFieldSort.KeySpec(2, 3, 4, 5, numeric = true, reverse = true),
      KeyFieldSort.KeySpec(1, 1, 0, 0, numeric = false, reverse = false)))
    // flags on pos1, default end chars
    assert(KeyFieldSort.parseK("-k3n,3") == Seq(
      KeyFieldSort.KeySpec(3, 1, 3, 0, numeric = true, reverse = false)))
    intercept[IllegalArgumentException](KeyFieldSort.parseK("k2,3"))
  }

  test("keyText honors end positions, including spans across separators") {
    val df = Seq("abc:defg:hij").toDF("line")
      .select(split(col("line"), ":").as("w"))
    def key(spec: String) =
      df.select(KeyFieldSort.keyText(col("w"), ":",
        KeyFieldSort.parseK(spec).head)).as[String].head()
    assert(key("-k2") == "defg:hij")        // field 2 → end of line
    assert(key("-k2,2") == "defg")          // field 2 only
    assert(key("-k2.2,2.3") == "ef")        // chars 2..3 of field 2
    assert(key("-k1.2,3.1") == "bc:defg:h") // spans separators, as the raw line does
    assert(key("-k2,3.99") == "defg:hij")   // end char clamps at field end
  }

  test("end-bounded numeric sort orders by the bounded key only") {
    // field 2 chars 2..3 numeric: 91x → 91, 190 → 90, 755 → 55
    val df = Seq("a:191x", "b:1907", "c:7559").toDF("line")
      .select(split(col("line"), ":").as("w"))
    val got = df.orderBy(KeyFieldSort.sortColumnsK(col("w"), ":", "-k2.2,2.3n"): _*)
      .select(element_at(col("w"), 1)).as[String].collect().toSeq
    assert(got == Seq("c", "b", "a")) // 55 < 90 < 91
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
