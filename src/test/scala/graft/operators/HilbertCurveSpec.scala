package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertCurveSpec extends SparkSpec {
  import spark.implicits._

  test("scalar reference satisfies the defining curve properties") {
    // bijectivity + continuity: consecutive d are Manhattan-adjacent cells
    // (no rotated/flipped/Morton impostor passes this)
    val n = 1 << 8
    var prev = HilbertCurve.d2xyRef(8, 0L)
    var d = 1L
    while (d < n.toLong * n) {
      val cur = HilbertCurve.d2xyRef(8, d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) === 1,
        s"curve jump at d=$d")
      prev = cur
      d += 1
    }
    // inverse round-trip over the full domain
    (0L until n.toLong * n).foreach { dd =>
      val (x, y) = HilbertCurve.d2xyRef(8, dd)
      assert(HilbertCurve.xy2dRef(8, x, y) === dd)
    }
  }

  test("column pipeline equals the scalar reference on the full 2^16 domain") {
    val base = spark.range(0, 1L << 16)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val got = HilbertCurve.withIndex(base, 8, col("x"), col("y"), "d")
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === HilbertCurve.xy2dRef(8, r.getLong(0), r.getLong(1)),
        s"xy2d(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("hilbert layout beats or matches z-order on box-query file overlap") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft-hilbert-").toString
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pkLo, pkHi, skLo, skHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def write(path: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.repartitionByRange(16, col("c")).sortWithinPartitions("c").drop("c")
        .write.mode("overwrite").parquet(path)
    write(s"$root/zorder", li.withColumn("c", ZOrder.morton(
      ZOrder.scaleTo256(col("l_partkey"), pkLo, pkHi),
      ZOrder.scaleTo256(col("l_suppkey"), skLo, skHi))))
    write(s"$root/hilbert", HilbertCurve.withIndex(li, 8,
      ZOrder.scaleTo256(col("l_partkey"), pkLo, pkHi),
      ZOrder.scaleTo256(col("l_suppkey"), skLo, skHi), "c"))

    // average file overlap across a 3x3 grid of quarter-range boxes —
    // single-box results are noisy at 16 files, the sweep is stable
    def overlap(path: String): Long = {
      val pkQ = (pkHi - pkLo) / 4
      val skQ = (skHi - skLo) / 4
      (for (bi <- 0 to 2; bj <- 0 to 2) yield {
        val (plo, phi) = (pkLo + bi * pkQ, pkLo + (bi + 1) * pkQ)
        val (slo, shi) = (skLo + bj * skQ, skLo + (bj + 1) * skQ)
        spark.read.parquet(path)
          .filter(col("l_partkey").between(plo, phi) &&
            col("l_suppkey").between(slo, shi))
          .select(input_file_name()).distinct().count()
      }).sum
    }
    val z = overlap(s"$root/zorder")
    val h = overlap(s"$root/hilbert")
    assert(h <= z, s"hilbert touched $h files vs z-order $z across the box sweep")
    // both layouts must answer the box identically to the raw table
    val raw = li.filter(col("l_partkey").between(pkLo, pkLo + (pkHi - pkLo) / 4) &&
      col("l_suppkey").between(skLo, skLo + (skHi - skLo) / 4)).count()
    val hil = spark.read.parquet(s"$root/hilbert")
      .filter(col("l_partkey").between(pkLo, pkLo + (pkHi - pkLo) / 4) &&
        col("l_suppkey").between(skLo, skLo + (skHi - skLo) / 4)).count()
    assert(hil === raw)
  }
}
