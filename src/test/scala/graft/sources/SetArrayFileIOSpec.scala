package graft.sources

import graft.SparkSpec

class SetArrayFileIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-setarr-$tag-").toString

  test("SetFile: write → distributed read-back preserves the key set") {
    val dir = tmp("set")
    val keys = (1L to 300L).filter(_ % 3 == 0)
    // duplicates in, set out
    SetArrayFileIO.writeSet((keys ++ keys).toDF("key"), s"$dir/sf", partitions = 4)
    val back = SetArrayFileIO.readSet(spark, s"$dir/sf", "key")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(back == keys)
  }

  test("SetFile: Reader.seek answers membership, including misses") {
    val dir = tmp("seek")
    SetArrayFileIO.writeSet(
      (0L until 500L).map(_ * 2).toDF("key"), s"$dir/sf", partitions = 3)
    assert(SetArrayFileIO.contains(spark, s"$dir/sf", Seq(0L, 404L, 998L, 7L, 2000L)) ==
      Seq(0L -> true, 404L -> true, 998L -> true, 7L -> false, 2000L -> false))
  }

  test("ArrayFile: writer stamps dense positions; get(n) and scan agree") {
    val dir = tmp("arr")
    val path = s"$dir/a.array"
    // write in scrambled input order; orderCol defines the array order
    val rows = (0L until 97L).map(k => (k, s"val$k")).reverse
    SetArrayFileIO.writeArray(rows.toDF("ord", "v"), "ord", "v", path)
    assert(SetArrayFileIO.getArray(spark, path, Seq(0L, 41L, 96L)) ==
      Seq(0L -> "val0", 41L -> "val41", 96L -> "val96"))
    // past-the-end index is a miss, not a crash
    assert(SetArrayFileIO.getArray(spark, path, Seq(97L)).isEmpty)
    val scan = SetArrayFileIO.readArray(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(scan == (0L until 97L).map(k => (k, s"val$k")))
  }

  test("SeqFileSorter: unsorted parts in, physically sorted parts out") {
    val dir = tmp("sorter")
    val data = scala.util.Random.shuffle((1L to 1000L).toList).map(k => (k, s"r$k"))
    SequenceFileIO.write(data.toDF("key", "value").repartition(7), s"$dir/in")
    SeqFileSorter.sort(spark, s"$dir/in", s"$dir/out")
    val back = SeqFileSorter.readOrdered(spark, s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    // on-disk order (rn ascending) IS key order — the Sorter contract
    assert(back == (1L to 1000L).map(k => (k, k, s"r$k")))
  }
}
