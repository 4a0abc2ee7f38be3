package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unix-`cut`-style field selection over separator-joined text, the
  * reference's FieldSelectionMapReduce
  * (reference: mapred/lib/FieldSelectionMapReduce.java:64,135,264-270).
  *
  * Spec grammar (per field-spec, comma-separated): `i` (single 0-based
  * field), `i-j` (inclusive range), `i-` (from i to end of record). Selected
  * fields are re-joined with the separator. All column expressions —
  * codegen, no UDF.
  */
object FieldSelection {

  /** Array-of-fields column for one record line. */
  def fields(line: Column, sep: String): Column =
    split(line, java.util.regex.Pattern.quote(sep))

  /** Apply one spec to a fields array, yielding the re-joined string. */
  def selectSpec(fieldsArr: Column, spec: String, sep: String): Column = {
    val parts: Seq[Column] = spec.split(",").toSeq.map { p =>
      if (p.endsWith("-")) {
        val i = p.dropRight(1).toInt
        slice(fieldsArr, lit(i + 1), greatest(size(fieldsArr) - i, lit(0)))
      } else if (p.contains("-")) {
        val Array(i, j) = p.split("-").map(_.toInt)
        slice(fieldsArr, i + 1, j - i + 1)
      } else {
        val i = p.toInt
        array(element_at(fieldsArr, i + 1))
      }
    }
    array_join(concat(parts: _*), sep)
  }

  /** Full mapper: line → (key, value) by the two specs. */
  def select(df: DataFrame, lineCol: String, sep: String,
             keySpec: String, valueSpec: String): DataFrame = {
    val f = fields(col(lineCol), sep)
    df.select(
      selectSpec(f, keySpec, sep).as("sel_key"),
      selectSpec(f, valueSpec, sep).as("sel_value"))
  }
}
