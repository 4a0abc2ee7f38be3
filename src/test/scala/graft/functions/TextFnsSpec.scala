package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams = sliding windows with multiplicity; shingles = its distinct") {
    val rnd = new Random(11)
    // tiny vocab forces repeated bigrams; lengths 0..7 cover the short-doc
    // edges (empty, single token, exactly n tokens)
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(8))(s"t${rnd.nextInt(4)}").mkString(" "))
    }
    val out = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFns.ngrams(TextFns.tokens(col("text")), 2).as("bg"),
        TextFns.shingles(TextFns.tokens(col("text")), 2).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getSeq[String](2))))
      .toMap
    docs.foreach { case (i, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val expected =
        if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
        else Seq.empty[String]
      assert(out(i)._1 == expected, s"ngrams mismatch on doc $i: '$text'")
      assert(out(i)._2 == expected.distinct, s"shingles mismatch on doc $i: '$text'")
    }
  }
}
