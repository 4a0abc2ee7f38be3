package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Bfs, HeavyHitters}

class AlgorithmsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bfs: hand graph — min-hop distances, unreachable nodes absent") {
    // 1-2, 2-3, 3-4, 1-3 (shortcut), 9-10 (disconnected)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
      .toDF("u", "v")
    val got = Bfs.hopsFrom(edges, src = 1L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("bfs_hops: sf0.001 closure matches the recursive-CTE oracle shape") {
    val rows = Algorithms.bfsHops(spark, dir).collect()
    assert(rows.length === 200)
    assert(rows.map(_.getInt(1)).sum === 301)
    assert(rows.map(_.getInt(1)).max === 2)
  }

  test("heavy hitters: exact and partitioning-independent") {
    val words = Seq.fill(400)("alpha") ++ Seq.fill(120)("beta") ++
      (1 to 300).map(i => s"rare$i") ++ Seq.fill(5)("gamma")
    // N = 825; support 1/100 → θ = 8.25 → alpha, beta qualify; gamma (5) not
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(words, parts).toDF("word")
      val got = HeavyHitters.frequent(df, supportDenom = 100, k = 128)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("alpha" -> 400L, "beta" -> 120L), s"parts=$parts")
    }
  }

  test("heavy_hitters: MG candidate set stays bounded at corpus scale") {
    val words = graft.core.Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word") =!= "")
    val exact = words.groupBy("word").count()
    val n = words.count()
    val expect = exact.where(col("count") * 100 >= lit(n)).count()
    val got = Algorithms.heavyHitterTokens(spark, dir)
    assert(got.count() === expect)
  }

  test("skyline_parts: matches the NOT-EXISTS dominance spec") {
    val p = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expect = p.filter { case (_, s, pr) =>
      !p.exists { case (_, qs, qpr) =>
        qs <= s && qpr <= pr && (qs < s || qpr < pr)
      }
    }.map(_._1).toSet
    val got = Algorithms.skylineParts(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
