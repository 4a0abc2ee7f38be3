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
    * mapred/MapFileOutputFormat.java getEntry): part dirs hold disjoint
    * sorted ranges, so probe each reader's in-memory index until one hits.
    */
  def get(spark: SparkSession, path: String, keys: Seq[Long]): Seq[(Long, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val parts = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val readers = parts.map(p => new MapFile.Reader(p, conf))
    try keys.flatMap { k =>
      val kw = new LongWritable(k)
      val v = new Text()
      readers.iterator
        .map(r => Option(r.get(kw, v)).map(_ => k -> v.toString))
        .collectFirst { case Some(kv) => kv }
    } finally readers.foreach(_.close())
  }
}
