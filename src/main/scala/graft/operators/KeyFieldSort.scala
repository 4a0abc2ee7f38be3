package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GNU-sort `-k` key-field semantics over separated text lines
  * (reference: mapred/lib/KeyFieldBasedComparator.java:25-65 +
  * KeyFieldHelper.java — the streaming-user sort surface — and
  * mapred/lib/KeyFieldBasedPartitioner.java:43-109).
  *
  * Supported spec subset (comma-separated parts, 1-based):
  * `field[.char][flags]` with flags `n` (numeric) and `r` (reverse), e.g.
  * `"3nr,2n"` = field 3 numeric descending, then field 2 numeric ascending.
  *
  * Each part compiles to a plain Catalyst sort expression (split + cast),
  * so the sort itself is Spark's ordinary range-partitioned total-order
  * sort — no custom comparator Expression needed for semantic parity
  * (byte-exact text-ordering parity would need one; see SURVEY §4.2).
  */
object KeyFieldSort {

  final case class KeyPart(field: Int, fromChar: Int, numeric: Boolean,
                           reverse: Boolean)

  private val PartRe = """(\d+)(?:\.(\d+))?([nr]*)""".r

  def parse(spec: String): Seq[KeyPart] =
    spec.split(",").toSeq.map {
      case PartRe(f, c, flags) =>
        KeyPart(f.toInt, Option(c).map(_.toInt).getOrElse(1),
          flags.contains("n"), flags.contains("r"))
      case bad => throw new IllegalArgumentException(s"bad key spec part: $bad")
    }

  /** Sort expressions for a split-line array column. */
  def sortColumns(fields: Column, spec: String): Seq[Column] =
    parse(spec).map { p =>
      val raw = element_at(fields, p.field)
      val sliced = if (p.fromChar > 1) substring(raw, p.fromChar, Int.MaxValue) else raw
      val keyed = if (p.numeric) sliced.cast("double") else sliced
      if (p.reverse) keyed.desc else keyed.asc
    }

  /** Partition id over the selected key fields — the reference's
    * KeyFieldBasedPartitioner hash, made portable via [[graft.functions.PortableHash]].
    */
  def partitionId(fields: Column, fieldIdx: Seq[Int], numPartitions: Int): Column = {
    val key = concat_ws("", fieldIdx.map(i => element_at(fields, i)): _*)
    graft.functions.PortableHash.h48(key) % numPartitions
  }
}
