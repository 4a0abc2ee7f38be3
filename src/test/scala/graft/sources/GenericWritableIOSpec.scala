package graft.sources

import graft.SparkSpec

class GenericWritableIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-union-$tag-").toString

  private def mixed = Seq(
    (1L, "int", Some(42L), None: Option[String]),
    (2L, "text", None: Option[Long], Some("en")),
    (3L, "int", Some(-7L), None: Option[String]),
    (4L, "text", None: Option[Long], Some("de")))
    .toDF("key", "tag", "int_val", "str_val")

  private def collectUnion(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]),
      Option(r.get(3)).map(_.asInstanceOf[String]))).sortBy(_._1).toSeq

  test("GenericWritable union round-trips mixed IntWritable/Text values") {
    val dir = tmp("generic")
    GenericWritableIO.writeUnion(mixed, s"$dir/u")
    assert(collectUnion(GenericWritableIO.readUnion(spark, s"$dir/u")) ==
      collectUnion(mixed))
  }

  test("ObjectWritable framing round-trips the same union") {
    val dir = tmp("object")
    GenericWritableIO.writeObjectUnion(mixed, s"$dir/u")
    assert(collectUnion(GenericWritableIO.readObjectUnion(spark, s"$dir/u")) ==
      collectUnion(mixed))
  }

  test("GenericWritable framing is more compact than ObjectWritable's") {
    // the reference's stated trade-off (GenericWritable.java Javadoc):
    // 1-byte ordinal vs a class-name string per record — prove it holds
    // on identical payloads
    val dir = tmp("size")
    val rows = (1L to 400L).map(k =>
      if (k % 2 == 0) (k, "int", Some(k), None: Option[String])
      else (k, "text", None: Option[Long], Some(s"v$k")))
      .toDF("key", "tag", "int_val", "str_val")
    GenericWritableIO.writeUnion(rows, s"$dir/g")
    GenericWritableIO.writeObjectUnion(rows, s"$dir/o")
    def bytes(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length()).sum
    assert(bytes(s"$dir/g") < bytes(s"$dir/o"))
  }
}
