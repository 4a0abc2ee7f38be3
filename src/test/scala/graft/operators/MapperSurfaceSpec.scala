package graft.operators

import graft.SparkSpec

class MapperSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("SkipBad drops exactly the throwing records and counts them") {
    val acc = spark.sparkContext.longAccumulator("skipped")
    val ds = spark.createDataset(Seq("1", "2", "boom", "4", "boom"))
    val out = SkipBad.flatMapSkipBad(ds, acc)(s => Iterator.single(s.toInt))
      .collect().sorted
    assert(out.toSeq == Seq(1, 2, 4))
    assert(acc.value == 2L)
  }

  test("SkipBad keeps multi-row emissions from good records") {
    val acc = spark.sparkContext.longAccumulator("skipped")
    val ds = spark.createDataset(Seq("2", "x"))
    val out = SkipBad.flatMapSkipBad(ds, acc)(s => (1 to s.toInt).iterator)
      .collect().sorted
    assert(out.toSeq == Seq(1, 2) && acc.value == 1L)
  }

  test("Multimodal decodeStub derives features from raw bytes") {
    val payload = "abc".getBytes("UTF-8")
    val f = Multimodal.decodeStub(Multimodal.MediaIn(7L, "s", payload))
    val sum = 'a'.toInt + 'b'.toInt + 'c'.toInt
    assert(f == Multimodal.MediaFeat(7L, "s", 3L, 64 + 3 % 577, 64 + sum % 479, sum))
  }

  test("Multimodal extractFeatures runs per-partition over binary payloads") {
    val ds = Multimodal.mediaFromDocuments(
      Seq((1L, "s0", "hello"), (2L, "s1", "worlds"))
        .toDF("doc_id", "source", "text"))
    val out = Multimodal.extractFeatures(ds).collect()
    assert(out.map(f => (f.doc_id, f.n_bytes)).toSet == Set((1L, 5L), (2L, 6L)))
  }
}
