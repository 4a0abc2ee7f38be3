package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, MapFile, Text}

import graft.SparkSpec

class MapFileIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-mapfile-$tag-").toString

  test("write → read round trip preserves every row; part keys are range-disjoint") {
    val dir = tmp("rt")
    val rows = (1L to 200L).map(k => (k, s"v$k"))
    MapFileIO.write(rows.toDF("key", "value"), s"$dir/mf", partitions = 4)
    val back = MapFileIO.read(spark, s"$dir/mf")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.sorted.toSeq == rows)
  }

  test("get() answers point lookups through the index, including misses") {
    val dir = tmp("get")
    val rows = (0L until 500L).map(k => (k * 2, s"even$k")) // only even keys
    MapFileIO.write(rows.toDF("key", "value"), s"$dir/mf", partitions = 3)
    assert(MapFileIO.get(spark, s"$dir/mf", Seq(0L, 404L, 998L)) ==
      Seq(0L -> "even0", 404L -> "even202", 998L -> "even499"))
    assert(MapFileIO.get(spark, s"$dir/mf", Seq(7L, 1001L)).isEmpty)
  }

  test("get() opens only the owning reader per key (reference getEntry contract)") {
    val dir = tmp("one-reader")
    val rows = (0L until 600L).map(k => (k, s"v$k"))
    MapFileIO.write(rows.toDF("key", "value"), s"$dir/mf", partitions = 6)
    // keys spread over the full range → every lookup must still touch ONE
    // part each; 3 keys landing in ≤3 distinct parts open ≤3 of 6 readers
    val (hits, openedSpread) =
      MapFileIO.getInstrumented(spark, s"$dir/mf", Seq(1L, 300L, 599L))
    assert(hits == Seq(1L -> "v1", 300L -> "v300", 599L -> "v599"))
    assert(openedSpread <= 3, s"opened $openedSpread readers for 3 keys (6 parts)")
    // keys from one range-partition → exactly one reader for all of them
    val (hits2, openedOne) =
      MapFileIO.getInstrumented(spark, s"$dir/mf", Seq(2L, 3L, 5L))
    assert(hits2.map(_._1) == Seq(2L, 3L, 5L))
    assert(openedOne == 1, s"co-located keys opened $openedOne readers")
    // a missing key inside a covered range opens that one reader and misses
    val (misses, openedMiss) =
      MapFileIO.getInstrumented(spark, s"$dir/mf", Seq(10_000L))
    assert(misses.isEmpty && openedMiss <= 1)
  }

  test("BloomMapFile layout: stock writer, fast negative probes, data scans as a MapFile") {
    val dir = tmp("bloom")
    val mf = new Path(s"$dir/part-00000")
    val conf = new Configuration()
    val w = new org.apache.hadoop.io.BloomMapFile.Writer(conf, mf,
      MapFile.Writer.keyClass(classOf[LongWritable]),
      MapFile.Writer.valueClass(classOf[Text]))
    try (1L to 100L).foreach(k => w.append(new LongWritable(k * 2), new Text(s"b${k * 2}")))
    finally w.close()
    val r = new org.apache.hadoop.io.BloomMapFile.Reader(mf, conf)
    try {
      assert(r.probablyHasKey(new LongWritable(100L)))
      val v = new Text()
      assert(r.get(new LongWritable(100L), v) != null && v.toString == "b100")
      // no false negatives by contract; most absent (odd) keys are rejected
      // by the bloom alone — the format's fast-negative-lookup point
      val rejected = (1L to 199L by 2).count(k => !r.probablyHasKey(new LongWritable(k)))
      assert(rejected > 80, s"bloom rejected only $rejected of 100 misses")
    } finally r.close()
    val back = MapFileIO.read(spark, dir).collect()
    assert(back.length == 100)
  }

  test("SetFile and ArrayFile (the rest of the MapFile family) round-trip via stock classes") {
    import org.apache.hadoop.fs.FileSystem
    import org.apache.hadoop.io.{ArrayFile, SequenceFile, SetFile, WritableComparator}
    val conf = new Configuration()
    val fs = FileSystem.getLocal(conf)
    val dir = tmp("family")
    // SetFile: a MapFile of keys only — membership via seek
    val sw = new SetFile.Writer(conf, fs, s"$dir/set",
      WritableComparator.get(classOf[LongWritable]),
      SequenceFile.CompressionType.NONE)
    try (1L to 50L).foreach(k => sw.append(new LongWritable(k * 2)))
    finally sw.close()
    val sr = new SetFile.Reader(fs, s"$dir/set", conf)
    try {
      assert(sr.seek(new LongWritable(10L)))
      assert(!sr.seek(new LongWritable(11L)))
    } finally sr.close()
    // ArrayFile: a MapFile keyed by record index — positional get
    val aw = new ArrayFile.Writer(conf, fs, s"$dir/arr", classOf[Text])
    try (0 until 50).foreach(i => aw.append(new Text(s"v$i")))
    finally aw.close()
    val ar = new ArrayFile.Reader(fs, s"$dir/arr", conf)
    try {
      val t = new Text()
      ar.get(7, t)
      assert(t.toString == "v7")
    } finally ar.close()
  }

  test("reads a MapFile written directly through the stock Hadoop writer (reference layout)") {
    // what reference code produces: ONE MapFile dir, no part- wrapper
    val dir = tmp("ref")
    val mf = new Path(s"$dir/part-00000")
    val w = new MapFile.Writer(new Configuration(), mf,
      MapFile.Writer.keyClass(classOf[LongWritable]),
      MapFile.Writer.valueClass(classOf[Text]))
    try (1L to 50L).foreach(k => w.append(new LongWritable(k), new Text(s"ref$k")))
    finally w.close()
    val back = MapFileIO.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq == (1L to 50L).map(k => (k, s"ref$k")))
    assert(MapFileIO.get(spark, dir, Seq(25L)) == Seq(25L -> "ref25"))
  }
}
