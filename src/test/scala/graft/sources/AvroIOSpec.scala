package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AvroIOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("avro files carry the container magic and round-trip losslessly") {
    val root = java.nio.file.Files.createTempDirectory("graft-avro-").toString
    val src = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    AvroIO.write(src, s"$root/docs")

    // container-file magic: 'O' 'b' 'j' 0x01 — proves these are real Avro
    // object-container files any external tooling can open
    val files = new java.io.File(s"$root/docs").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty, "expected .avro part files")
    files.foreach { f =>
      val in = new java.io.FileInputStream(f)
      val magic = new Array[Byte](4)
      in.read(magic); in.close()
      assert(magic.toSeq === Seq[Byte]('O', 'b', 'j', 1), f.getName)
    }

    // self-describing read (no schema passed) must return identical rows
    val back = AvroIO.read(spark, s"$root/docs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = src.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back === expect)
  }
}
