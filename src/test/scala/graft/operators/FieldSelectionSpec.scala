package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FieldSelectionSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq("a:b:c:d:e").toDF("line")

  private def sel(keySpec: String, valueSpec: String): (String, String) = {
    val r = FieldSelection.select(df, "line", ":", keySpec, valueSpec).head()
    (r.getString(0), r.getString(1))
  }

  test("single field spec `i` (0-based)") {
    assert(sel("0", "2") == ("a", "c"))
  }

  test("range spec `i-j` is inclusive") {
    assert(sel("1-3", "0-0") == ("b:c:d", "a"))
  }

  test("open range `i-` runs to end of record") {
    assert(sel("2-", "0") == ("c:d:e", "a"))
  }

  test("comma-separated specs reorder fields (reference example `4,3,0-`)") {
    assert(sel("4,3", "2,0-1") == ("e:d", "c:a:b"))
  }

  test("open range starting past the last field is empty") {
    assert(sel("0", "7-") == ("a", ""))
  }

  test("separator is taken literally, not as regex") {
    val d = Seq("a|b|c").toDF("line")
    val r = FieldSelection.select(d, "line", "|", "1", "2").head()
    assert((r.getString(0), r.getString(1)) == ("b", "c"))
  }
}
