package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, MapFile, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Real on-disk MapFile interop (reference: io/MapFile.java — a directory
  * holding a sorted `data` SequenceFile plus an `index` SequenceFile of
  * every 128th key; mapred/MapFileOutputFormat.java writes one MapFile per
  * reduce partition and getEntry() seeks the right one).
  *
  * The write path mirrors MapFileOutputFormat: range-partition on the key
  * (globally sorted across part dirs, the total-order precondition the
  * reference gets from its sorted shuffle), sort within partitions, and
  * let each task write its own part-NNNNN MapFile through the stock Hadoop
  * MapFile.Writer — so the directory is byte-level what reference MapFile
  * readers expect. Point lookups go through MapFile.Reader.get: an
  * in-memory index binary search plus one seek into `data`, never a scan.
  *
  * This is the FORMAT-interop path; the columnar scale idiom for the same
  * capability (sorted parquet + row-group pruning) is
  * [[graft.catalog.Extras.mapfileLookup]].
  */
object MapFileIO {

  /** Write (long key, string value) rows as `partitions` MapFiles under
    * `path`, keys globally sorted across part dirs.
    */
  def write(df: DataFrame, path: String, partitions: Int = 4): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(df.columns(0)).as("key"), col(df.columns(1)).as("value"))
      .repartitionByRange(partitions, col("key")).sortWithinPartitions("key")
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .mapPartitionsWithIndex { (idx, it) =>
        // task-side Configuration: defaults resolve the same FS the driver
        // deleted above (Configuration itself is not serializable)
        val part = new Path(path, f"part-$idx%05d")
        val w = new MapFile.Writer(new Configuration(), part,
          MapFile.Writer.keyClass(classOf[LongWritable]),
          MapFile.Writer.valueClass(classOf[Text]))
        try it.foreach { case (k, v) => w.append(new LongWritable(k), new Text(v)) }
        finally w.close()
        Iterator.single(idx)
      }.count(): Unit
  }

  /** Distributed scan of all part MapFiles (a MapFile's `data` file IS a
    * SequenceFile) as a (key, value) DataFrame.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](s"$path/part-*/data")
      .toDF("key", "value")
  }

  /** Index-seek point lookup (reference:
    * mapred/MapFileOutputFormat.java:82-107 getEntry — one reader picked by
    * the partitioner, never a probe of every part). The write path range-
    * partitions, so the partitioner analog is a binary search over part
    * first-keys: each key maps to the single part whose range covers it,
    * and only THAT MapFile.Reader is opened (lazily, memoized across keys).
    * First keys come from the first record of each part's `index` file — a
    * header-sized read, not a full index load — so a lookup against a
    * 10k-part directory opens 10k tiny headers once plus exactly one full
    * reader per distinct owning part.
    */
  def get(spark: SparkSession, path: String, keys: Seq[Long]): Seq[(Long, String)] =
    getInstrumented(spark, path, keys)._1

  /** [[get]] plus the number of MapFile.Readers actually opened — lets the
    * spec assert the one-reader-per-key contract.
    */
  private[graft] def getInstrumented(spark: SparkSession, path: String,
      keys: Seq[Long]): (Seq[(Long, String)], Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val parts = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    // (firstKey, part) ascending; empty parts own no range and drop out
    val ranges = parts.flatMap(p => firstKey(conf, p).map(_ -> p))
    val firsts = ranges.map(_._1)
    val opened = scala.collection.mutable.Map.empty[String, MapFile.Reader]
    try {
      val hits = keys.flatMap { k =>
        // owning part = greatest firstKey <= k (ranges are disjoint, sorted)
        val i = {
          val raw = java.util.Arrays.binarySearch(firsts, k)
          if (raw >= 0) raw else -raw - 2 // insertion point minus one
        }
        if (i < 0) None
        else {
          val part = ranges(i)._2
          val r = opened.getOrElseUpdate(part.toString, new MapFile.Reader(part, conf))
          val v = new Text()
          Option(r.get(new LongWritable(k), v)).map(_ => k -> v.toString)
        }
      }
      (hits, opened.size)
    } finally opened.values.foreach(_.close())
  }

  /** First key of one part, read from the first `index` record — the index
    * is (key, position) pairs over the sorted data file, so record one IS
    * the partition's minimum indexed key, and reading it avoids
    * MapFile.Reader's full index materialization.
    */
  private def firstKey(conf: Configuration, part: Path): Option[Long] = {
    import org.apache.hadoop.io.SequenceFile
    val idx = new Path(part, MapFile.INDEX_FILE_NAME)
    if (!idx.getFileSystem(conf).exists(idx)) return None
    val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(idx))
    try {
      val k = new LongWritable()
      val pos = new LongWritable()
      if (r.next(k, pos)) Some(k.get) else None
    } finally r.close()
  }
}
