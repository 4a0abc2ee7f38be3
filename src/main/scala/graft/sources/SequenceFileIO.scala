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
}
