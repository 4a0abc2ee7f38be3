package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.SequenceFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Sort/merge utility over SequenceFiles — the Spark-native analog of the
  * reference's client-side `SequenceFile.Sorter` (reference:
  * io/SequenceFile.java:2211 — sort() spills sorted runs and merge() k-way
  * merges them into one ordered file, all on ONE client machine).
  *
  * Here the same contract — "unsorted sequence files in, sequence files
  * that read back in key order out" — is a two-line distributed plan:
  * range-repartition (Spark's sampled RangePartitioner is the
  * TotalOrderPartitioner; see [[graft.operators.TotalOrderSort]]) +
  * sort-within-partitions, then the ordinary sequence-file sink. Part
  * files come out in range order (part-00000 holds the lowest key range),
  * so concatenating parts in name order IS the merged sorted stream the
  * reference's merge() produces — without ever funnelling the data
  * through one machine.
  *
  * [[readOrdered]] is the proof-side: it re-reads the output in exactly
  * that on-disk order (sequential record order within each part, parts in
  * name order) and stamps the global position — so a round trip through
  * sort() + readOrdered() matching `row_number() OVER (ORDER BY key)` is
  * end-to-end evidence the bytes on disk are globally sorted.
  */
object SeqFileSorter {

  /** Sort-merge `inPath`'s (long, string) sequence files into globally
    * sorted sequence files at `outPath`.
    */
  def sort(spark: SparkSession, inPath: String, outPath: String): Unit =
    SequenceFileIO.write(
      graft.operators.TotalOrderSort.sort(
        SequenceFileIO.read(spark, inPath), Seq(col("key"))),
      outPath)

  /** Read sequence files back in their physical on-disk order — records
    * sequentially within each part, parts in file-name order — and stamp
    * the 1-based global position `rn`. One task per part file (a part is
    * deliberately NOT split: the position within the file is the point);
    * per-file record counts are one cheap metadata pass so rank stamping
    * needs no global window.
    */
  def readOrdered(spark: SparkSession, path: String): DataFrame = {
    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    val root = new Path(path)
    val files = root.getFileSystem(conf).listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-")).map(_.toString).sorted.toSeq

    // pass 1: per-file record counts (distributed, one task per file)
    val counts = sc.parallelize(files, math.max(files.size, 1))
      .map(f => f -> countRecords(f)).collectAsMap()
    val offsets = files.scanLeft(0L)((acc, f) => acc + counts(f)).init
    val fileOff = files.zip(offsets)

    // pass 2: sequential read per file, rank = file offset + in-file pos
    val rows = sc.parallelize(fileOff, math.max(fileOff.size, 1))
      .flatMap { case (f, off) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(f)))
        val k = new org.apache.hadoop.io.LongWritable()
        val v = new org.apache.hadoop.io.Text()
        val out = try Iterator.continually(r.next(k, v))
          .takeWhile(identity)
          .zipWithIndex
          .map { case (_, i) => Row(off + i + 1L, k.get, v.toString) }
          .toVector
        finally r.close()
        out.iterator
      }
    spark.createDataFrame(rows, new StructType()
      .add("rn", LongType, nullable = false)
      .add("key", LongType, nullable = false)
      .add("value", StringType, nullable = false))
  }

  private def countRecords(file: String): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(file)))
    val k = new org.apache.hadoop.io.LongWritable()
    val v = new org.apache.hadoop.io.Text()
    try {
      var n = 0L
      while (r.next(k, v)) n += 1
      n
    } finally r.close()
  }
}
