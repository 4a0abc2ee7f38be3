package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton column matches the reference bit-interleave") {
    val xs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (1999L, 99L),
      (1234L, 77L), (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL))
    val got = xs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    xs.foreach { case (x, y) =>
      assert(got((x, y)) === ZOrder.mortonRef(x, y), s"morton($x,$y)")
    }
  }

  test("morton is monotone within a row or column of the grid") {
    // fixing one dim, z grows with the other — the property file skipping
    // relies on (contiguous z-range <-> bounded box)
    val zs = (0L to 63L).map(ZOrder.mortonRef(_, 7L))
    assert(zs === zs.sorted)
    val zs2 = (0L to 63L).map(ZOrder.mortonRef(9L, _))
    assert(zs2 === zs2.sorted)
  }

  test("z-ordered layout skips files on the SECOND dimension; single-sort cannot") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft-zorder-").toString

    // layout A: sorted by partkey only (the 1-D baseline)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$root/xsort")
    // layout B: z-ordered on rank-scaled (partkey, suppkey)
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    li.withColumn("z", ZOrder.morton(
        ZOrder.scaleTo256(col("l_partkey"), b.getLong(0), b.getLong(1)),
        ZOrder.scaleTo256(col("l_suppkey"), b.getLong(2), b.getLong(3))))
      .repartitionByRange(16, col("z")).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").parquet(s"$root/zorder")

    // a band on suppkey ONLY (the dimension xsort ignores) — the lowest
    // quarter of the observed range: count how many distinct files hold
    // matching rows — the lower bound on files any stats-based reader
    // must open
    val bandHi = b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 4
    def filesWithMatches(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_suppkey").between(b.getLong(2), bandHi))
        .select(input_file_name()).distinct().count()

    val xFiles = filesWithMatches(s"$root/xsort")
    val zFiles = filesWithMatches(s"$root/zorder")
    assert(xFiles === 16, s"1-D layout should scatter the band over all files, got $xFiles")
    assert(zFiles * 2 <= xFiles,
      s"z-order should confine the band to a fraction of files: $zFiles vs $xFiles")
  }
}
