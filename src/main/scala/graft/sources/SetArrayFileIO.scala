package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{ArrayFile, LongWritable, NullWritable, SequenceFile, SetFile, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** On-disk SetFile and ArrayFile interop — the two MapFile subclasses the
  * reference ships alongside MapFile itself:
  *
  *  - SetFile (reference: io/SetFile.java:27) — a MapFile whose values are
  *    all NullWritable: a sorted, indexed SET of keys with log-time
  *    membership probes (`Reader.seek`).
  *  - ArrayFile (reference: io/ArrayFile.java:29) — a MapFile whose keys
  *    are the dense record positions 0..n-1 stamped by the writer: a
  *    persistent long-indexed array with positional `Reader.get(n)`.
  *
  * Both paths go through the STOCK Hadoop classes (library usage, same as
  * [[MapFileIO]]), so the directories are byte-level what reference
  * readers expect. SetFile writes are distributed exactly like
  * [[MapFileIO.write]] — range-partition + sort gives each task a
  * contiguous key range and each part is a valid SetFile. ArrayFile is
  * written by ONE task: the format's key IS the global position, which is
  * meaningful only for a single sequentially-written file — the reference
  * uses it as a client-side utility the same way (no ArrayFile job output
  * format exists there either); large indexed-array needs at scale are
  * served by the sorted-parquet idiom instead.
  */
object SetArrayFileIO {

  /** Write one long column as `partitions` SetFiles, globally sorted
    * across part dirs.
    */
  def writeSet(df: DataFrame, path: String, partitions: Int = 4): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(df.columns(0)).as("key")).distinct()
      .repartitionByRange(partitions, col("key")).sortWithinPartitions("key")
      .rdd.map(_.getLong(0))
      .mapPartitionsWithIndex { (idx, it) =>
        val conf = new Configuration()
        val part = new Path(path, f"part-$idx%05d")
        val w = new SetFile.Writer(conf, part.getFileSystem(conf), part.toString,
          classOf[LongWritable], SequenceFile.CompressionType.NONE)
        try it.foreach(k => w.append(new LongWritable(k)))
        finally w.close()
        Iterator.single(idx)
      }.count(): Unit
  }

  /** Distributed scan of all part SetFiles (the `data` file is a
    * SequenceFile of (key, NullWritable)) as a single-column DataFrame.
    */
  def readSet(spark: SparkSession, path: String, colName: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[LongWritable, NullWritable](s"$path/part-*/data")
      .map(_._1.get).toDF(colName)
  }

  /** Membership probes through SetFile.Reader.seek — the index binary
    * search + one data seek, never a scan. Part routing reuses the
    * MapFile range convention: sorted part dirs, probe the one whose
    * range covers the key (first-key check via seek result).
    */
  def contains(spark: SparkSession, path: String, keys: Seq[Long]): Seq[(Long, Boolean)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val parts = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val readers = parts.map(p =>
      new SetFile.Reader(p.getFileSystem(conf), p.toString, conf))
    try keys.map(k => k -> readers.exists(_.seek(new LongWritable(k))))
    finally readers.foreach(_.close())
  }

  /** Write one string column as ONE ArrayFile; record i of `df`'s
    * single-partition sort order gets key i.
    */
  def writeArray(df: DataFrame, orderCol: String, valueCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, true)
    // single writer: the dense 0..n-1 key space is inherently sequential
    df.select(col(orderCol), col(valueCol))
      .coalesce(1).sortWithinPartitions(orderCol)
      .rdd.map(_.getString(1))
      .mapPartitionsWithIndex { (_, it) =>
        val tconf = new Configuration()
        val w = new ArrayFile.Writer(tconf, new Path(path).getFileSystem(tconf),
          path, classOf[Text])
        try it.foreach(v => w.append(new Text(v)))
        finally w.close()
        Iterator.single(0)
      }.count(): Unit
  }

  /** Positional lookups via ArrayFile.Reader.get(n). */
  def getArray(spark: SparkSession, path: String, idxs: Seq[Long]): Seq[(Long, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val r = new ArrayFile.Reader(new Path(path).getFileSystem(conf), path, conf)
    try idxs.flatMap { i =>
      val v = new Text()
      Option(r.get(i, v)).map(_ => i -> v.toString)
    } finally r.close()
  }

  /** Distributed scan of the ArrayFile's data SequenceFile — (idx, value)
    * with the writer-stamped positions as keys.
    */
  def readArray(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[LongWritable, Text](s"$path/data")
      .map { case (k, v) => (k.get, v.toString) }.toDF("idx", "value")
  }
}
