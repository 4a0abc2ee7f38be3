package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins [[CmsSketch]]: the never-underestimate bound, the bounded cell
  * table (the scale claim), and driver-side probe coordinates landing on
  * the cells the distributed pass populated.
  */
class CmsSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val depth = 4
  private val width = 1024

  private def words = Tables.documents(spark, dir)
    .select(explode(split(lower(col("text")), " ")).as("word"))
    .where(col("word") =!= "")

  test("estimates never undercount, and match exactly absent collisions") {
    val probes = Seq("spark", "join", "window", "data", "quantum")
    val cells = CmsSketch.cells(words, depth, width)
    val est = CmsSketch.pointEstimates(cells, probes, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { w =>
      val e = exact.getOrElse(w, 0L)
      assert(est(w) >= e, s"CMS undercounted $w: ${est(w)} < $e")
    }
    // with ~30 vocab words in 1024 columns, 4 independent rows all
    // colliding for one probe has probability ~1e-6 — and the data is
    // fixed, so if this passes once it passes always. A corpus regen that
    // introduces a 4-row collision fails HERE, not at the driver gate.
    probes.foreach { w =>
      assert(est(w) == exact.getOrElse(w, 0L),
        s"probe $w picked up a 4-row collision: ${est(w)} vs exact ${exact.getOrElse(w, 0L)}")
    }
  }

  test("cell table is bounded by depth·width however large the input") {
    val cells = CmsSketch.cells(words, depth, width).collect()
    assert(cells.length <= depth * width)
    assert(cells.map(r => (r.getInt(0), r.getLong(1))).distinct.length == cells.length)
    // every row index present, every column inside the sketch
    assert(cells.map(_.getInt(0)).distinct.sorted.toSeq == (0 until depth))
    assert(cells.forall(r => r.getLong(1) >= 0 && r.getLong(1) < width))
  }

  test("total mass per row equals the token count (counters are exact)") {
    val n = words.count()
    val perRow = CmsSketch.cells(words, depth, width)
      .groupBy("r").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.size == depth)
    assert(perRow.values.forall(_ == n), s"row masses $perRow != $n")
  }

  test("inner-product join-size estimate never undercounts, exact sans collisions") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "z").toDF("word")
    val b = Seq("x", "y", "y", "q").toDF("word")
    // exact |A ⋈ B| = 2·1 (x) + 1·2 (y) = 4
    val ca = CmsSketch.cells(a, depth, width).withColumnRenamed("cnt", "ca")
    val cb = CmsSketch.cells(b, depth, width).withColumnRenamed("cnt", "cb")
    val dots = ca.join(cb, Seq("r", "c"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("dot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dots.size == depth, "every row must produce a dot product")
    dots.values.foreach(d => assert(d >= 4L))
    // 5 distinct tokens in 1024 columns: no row collides (deterministic
    // data — verified by the min being exact)
    assert(dots.values.min == 4L)
  }

  test("driver-side h48 replica agrees with the engine expression") {
    import spark.implicits._
    val values = Seq("spark", "quantum", "", "a b", "ünïcode")
    val engine = values.toDF("v")
      .select(graft.functions.PortableHash.h48(col("v"), 3).as("h"))
      .as[Long].collect().toSeq
    assert(engine == values.map(CmsSketch.h48(3, _)))
  }
}
