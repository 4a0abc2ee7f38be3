package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The archives we write must be readable by the STOCK Hadoop
  * HarFileSystem (`har://`) — real format interop, not a private codec.
  */
class HarIOSpec extends SparkSpec {
  import spark.implicits._

  private val dest = "target/scratch/hario-test.har"

  test("har round trip through the stock HarFileSystem") {
    val docs = (0 until 25).map(i => (s"doc_$i.txt", s"content number $i"))
    HarIO.write(docs.toDF("name", "content"), "name", "content", dest, numParts = 3)

    // raw layout sanity: index files + 3 parts
    val fs = new Path(dest).getFileSystem(new Configuration())
    assert(fs.exists(new Path(dest, "_index")) && fs.exists(new Path(dest, "_masterindex")))

    // stock reader: listing + per-file open through har://
    val harFs = new Path(HarIO.harUri(dest)).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val listed = harFs.listStatus(new Path(HarIO.harUri(dest)))
    assert(listed.length === 25, listed.map(_.getPath.getName).mkString(","))

    // distributed text scan reassembles every (name, content) row
    val back = HarIO.readText(spark, dest)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back === docs.toMap)
  }
}
