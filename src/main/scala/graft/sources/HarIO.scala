package graft.sources

import java.net.URLEncoder
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Real on-disk Hadoop Archive (HAR) interop — the reference's small-files
  * packing format (reference: fs/HarFileSystem.java — `_masterindex` maps
  * hash ranges to `_index` byte ranges; `_index` lines describe each
  * archived file as `name kind part start len`; file bytes live
  * concatenated in `part-N` files. The reference creates archives with a
  * MapReduce job, tools/HadoopArchives).
  *
  * Write path, Spark-shaped: every task streams its rows into its OWN
  * `part-<pid>` file and emits only (name, part, offset, length) index
  * metadata; the driver materializes just the two small index files —
  * payload bytes never pass through the driver, so archive size is bounded
  * by the cluster, not by driver memory. This is exactly the reference's
  * job shape (mappers copy bytes, one reducer writes the index) with the
  * index reduce collapsed onto the driver.
  *
  * The format written is VERSION 3 — what the bundled Hadoop 3.x
  * `HarFileSystem` (ServiceLoader-registered for `har://`) reads: names
  * URL-encoded, a 6th URL-encoded `"modtime perm owner group"` properties
  * field on file lines, directory lines carrying the properties in the
  * part-name slot with child basenames from field 6 on, and a
  * whole-index store line in `_masterindex` (the reader ignores the hash
  * bounds and loads every line in the byte range).
  *
  * Read path: any Spark source over `har://<underlying>-<host>/path.har`
  * — HarFileSystem serves listing, open and block locations, so text/
  * binary scans split and distribute like an ordinary directory.
  */
object HarIO {

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  // fixed epoch modtime keeps archives byte-deterministic
  private val Props = enc("0 420 graft graft")

  /** Archive (name, content) string rows as `<dest>` (a `.har` directory)
    * with `numParts` part files. Each archived file's bytes are the row's
    * content followed by a newline, so a text scan of the archive sees one
    * line per archived file.
    */
  def write(df: DataFrame, nameCol: String, contentCol: String,
            dest: String, numParts: Int = 4): Unit = {
    val sc = df.sparkSession.sparkContext
    val root = new Path(dest)
    val fs = root.getFileSystem(sc.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    // Tasks must resolve `dest` against the SAME FileSystem (and
    // credentials) the driver uses for the index files — a bare
    // `new Configuration()` in the closure would re-read defaults and can
    // diverge on a real deployment. Configuration isn't serializable, so
    // ship its entries and overlay them task-side.
    val confEntries = {
      import scala.jdk.CollectionConverters._
      sc.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toVector
    }
    val bcConf = sc.broadcast(confEntries)
    val entries = df
      .select(col(nameCol).cast("string"), col(contentCol).cast("string"))
      .repartition(numParts)
      .rdd.map(r => (r.getString(0), r.getString(1)))
      .mapPartitionsWithIndex { (pid, it) =>
        val conf = new Configuration()
        bcConf.value.foreach { case (k, v) => conf.set(k, v) }
        // attempt-unique temp name: concurrent speculative attempts of the
        // same partition never interleave into one file; the driver
        // renames exactly the attempt whose metadata won the collect
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dest, s".part-$pid-$attempt")
        val out = tmp.getFileSystem(conf).create(tmp, true)
        var off = 0L
        val acc = it.map { case (name, content) =>
          val bytes = (content + "\n").getBytes(StandardCharsets.UTF_8)
          out.write(bytes)
          val e = (name, pid, attempt, off, bytes.length.toLong)
          off += bytes.length
          e
        }.toVector // force the writes before close
        out.close()
        acc.iterator
      }.collect()

    // driver side: only index metadata ever lands here. Commit = rename
    // each partition's winning attempt to its final part name, then sweep
    // loser-attempt temp files.
    entries.map(e => (e._2, e._3)).distinct.foreach { case (pid, attempt) =>
      fs.rename(new Path(dest, s".part-$pid-$attempt"),
        new Path(dest, s"part-$pid"))
    }
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(".part-"))
      .foreach(fs.delete(_, false))
    val fileLines = entries.sortBy(_._1).map { case (name, pid, _, off, len) =>
      s"${enc(s"/$name")} file part-$pid $off $len $Props"
    }
    val rootLine = (Seq(enc("/"), "dir", Props, "0", "0") ++
      entries.map(_._1).sorted.map(enc)).mkString(" ")
    val index = (rootLine +: fileLines).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8)
    val idxOut = fs.create(new Path(root, "_index"))
    idxOut.write(index); idxOut.close()
    val master = s"3\n0 ${Int.MaxValue} 0 ${index.length}\n"
    val mOut = fs.create(new Path(root, "_masterindex"))
    mOut.write(master.getBytes(StandardCharsets.UTF_8)); mOut.close()
  }

  /** `har://` URI for a local archive directory. */
  def harUri(dest: String): String = {
    val abs = new Path(dest).getFileSystem(new Configuration())
      .makeQualified(new Path(dest)).toUri.getPath
    // empty authority → the archive lives on the default FS (local here);
    // a cluster deployment targets it as har://hdfs-namenode/path.har
    s"har://$abs"
  }

  /** Distributed text scan of every file in the archive through the stock
    * HarFileSystem: one row per archived file (name, content).
    */
  def readText(spark: SparkSession, dest: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(harUri(dest))
      .select(
        org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.input_file_name(),
          "([^/]+)$", 1).as("name"),
        col("value").as("content"))
  }
}
