package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SequenceFile read/write (reference: io/SequenceFile.java — the binary
  * KV container behind most reference jobs; SequenceFileInputFormat /
  * SequenceFileOutputFormat / SequenceFileAsTextInputFormat).
  *
  * Spark speaks the same on-disk format through the Hadoop client libs:
  * `saveAsSequenceFile` writes Writable-framed records (sync markers every
  * few KB keep the files splittable, exactly as the reference relies on),
  * and `sc.sequenceFile[K, V]` scans them with the stock WritableConverters
  * — so output here is byte-level interchangeable with the reference
  * engine's own files.
  *
  * DataFrame bridge: (long, string) rows ↔ (LongWritable, Text) records.
  * This is an RDD-boundary surface by nature (the format is schema-free
  * KV), so we convert at the edge and hand a DataFrame back immediately.
  */
object SequenceFileIO {

  /** Write the first two columns (long key, string value). */
  def write(df: DataFrame, path: String): Unit = {
    val rdd = df.rdd.map(r => (r.getLong(0), r.getString(1)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    rdd.saveAsSequenceFile(path)
  }

  /** Read (LongWritable, Text) sequence files as a (key, value) DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](path).toDF("key", "value")
  }

  /** Binary passthrough (SequenceFileAsBinaryInput/OutputFormat): raw
    * (BytesWritable, BytesWritable) records — payloads cross the format
    * untouched, no charset anywhere.
    */
  def writeBinary(df: DataFrame, path: String): Unit = {
    val rdd = df.rdd.map(r =>
      (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    rdd.saveAsSequenceFile(path)
  }

  def readBinary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Array[Byte], Array[Byte]](path)
      .toDF("key", "value")
  }

  /** Compressed write (reference: io/SequenceFile.java CompressionType
    * {NONE, RECORD, BLOCK}): RECORD compresses each value alone, BLOCK
    * batches records together — the reference's throughput mode for
    * compressible values, and the variant that stays splittable because
    * sync markers sit between blocks. The stock [[read]] decompresses
    * transparently via the file header.
    */
  def writeCompressed(df: DataFrame, path: String,
      ctype: org.apache.hadoop.io.SequenceFile.CompressionType,
      codec: Class[_ <: org.apache.hadoop.io.compress.CompressionCodec] =
        classOf[org.apache.hadoop.io.compress.DefaultCodec]): Unit = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.{JobConf, SequenceFileOutputFormat}
    val rdd = df.rdd.map(r => (new LongWritable(r.getLong(0)), new Text(r.getString(1))))
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
    val job = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    // configure the codec on the JobConf directly — saveAsHadoopFile's
    // codec parameter force-overwrites the compression type to BLOCK
    SequenceFileOutputFormat.setOutputCompressionType(job, ctype)
    org.apache.hadoop.mapred.FileOutputFormat.setCompressOutput(job, true)
    org.apache.hadoop.mapred.FileOutputFormat.setOutputCompressorClass(job, codec)
    rdd.saveAsHadoopFile(path, classOf[LongWritable], classOf[Text],
      classOf[SequenceFileOutputFormat[LongWritable, Text]], job)
  }

  def writeBlockCompressed(df: DataFrame, path: String): Unit =
    writeCompressed(df, path,
      org.apache.hadoop.io.SequenceFile.CompressionType.BLOCK)

  /** The on-disk compression type of the first part file — lets round-trip
    * checks prove BLOCK actually reached the header.
    */
  def compressionType(spark: SparkSession, path: String): org.apache.hadoop.io.SequenceFile.CompressionType = {
    import org.apache.hadoop.io.SequenceFile
    val r = firstPartReader(spark, path)
    try r.getCompressionType finally r.close()
  }

  /** The codec class recorded in the first part file's header (null codec →
    * "none") — proves which of the reference's codec trio
    * (DefaultCodec/GzipCodec/BZip2Codec) actually reached the disk.
    */
  def compressionCodecName(spark: SparkSession, path: String): String = {
    val r = firstPartReader(spark, path)
    try Option(r.getCompressionCodec).map(_.getClass.getSimpleName).getOrElse("none")
    finally r.close()
  }

  private def firstPartReader(spark: SparkSession, path: String): org.apache.hadoop.io.SequenceFile.Reader = {
    import org.apache.hadoop.io.SequenceFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val first = dir.getFileSystem(conf).listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("part-")).minBy(_.getName)
    new SequenceFile.Reader(conf, SequenceFile.Reader.file(first))
  }
}
