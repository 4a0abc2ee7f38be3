package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  test("teraGen is deterministic across runs and partitions") {
    val a = Generators.teraGen(spark, 500).collect().map(_.toSeq).toSet
    val b = Generators.teraGen(spark, 500).repartition(7).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 500)
  }

  test("teraGen rows have the contract shape (10-char key, 78-char value)") {
    val r = Generators.teraGen(spark, 10)
      .select(length(col("key")), length(col("value"))).distinct().collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toSeq == Seq((10, 78)))
  }

  test("randomTextWriter draws only vocabulary words, deterministically") {
    val words = Generators.randomTextWriter(spark, 100, 5)
      .select("word").as[String].collect()
    assert(words.length == 500)
    assert(words.forall(Generators.Vocab.contains))
    val again = Generators.randomTextWriter(spark, 100, 5)
      .select("word").as[String].collect()
    assert(words.toSeq == again.toSeq)
  }

  test("validateSorted reports zero misorders on sorted input") {
    val ranked = TotalOrderSort.rank(
      Generators.teraGen(spark, 300).select(col("key")), Seq(col("key")))
    val r = Generators.validateSorted(ranked, "key", "rn").head()
    assert(r.getLong(0) == 300L) // n_rows
    assert(r.getLong(1) == 0L)   // misorders
  }

  test("validateSorted catches a planted misorder") {
    import spark.implicits._
    val bad = Seq(("a", 1L), ("c", 2L), ("b", 3L), ("d", 4L))
      .toDF("key", "rn") // c before b: one adjacent inversion
    val r = Generators.validateSorted(bad, "key", "rn").head()
    assert(r.getLong(1) == 1L)
  }
}
