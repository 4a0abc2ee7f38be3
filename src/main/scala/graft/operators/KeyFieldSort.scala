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

  // ---- full `-k pos1[,pos2]` grammar (end positions included) -------------

  /** One `-k` key description (reference: mapred/lib/KeyFieldHelper.java:31-40):
    * pos = f[.c][opts]. `endField` 0 means the line's last field; `endChar`
    * 0 means the end field's last character. Flags may sit on either pos
    * (as the reference's parser accepts) and are OR-combined.
    */
  final case class KeySpec(beginField: Int, beginChar: Int, endField: Int,
                           endChar: Int, numeric: Boolean, reverse: Boolean)

  def parseK(options: String): Seq[KeySpec] =
    options.trim.split("\\s+").toSeq.map { tok =>
      require(tok.startsWith("-k"), s"expected a -k spec, got: $tok")
      tok.drop(2).split(",", 2) match {
        case Array(PartRe(f, c, fl)) =>
          KeySpec(f.toInt, Option(c).map(_.toInt).getOrElse(1), 0, 0,
            fl.contains("n"), fl.contains("r"))
        case Array(PartRe(f1, c1, fl1), PartRe(f2, c2, fl2)) =>
          KeySpec(f1.toInt, Option(c1).map(_.toInt).getOrElse(1),
            f2.toInt, Option(c2).map(_.toInt).getOrElse(0),
            (fl1 + fl2).contains("n"), (fl1 + fl2).contains("r"))
        case _ => throw new IllegalArgumentException(s"bad -k spec: $tok")
      }
    }

  /** The compared key text for one spec: the separator-joined field range
    * [beginField..endField] (separators INCLUDED, as the reference compares
    * the raw line bytes between the two offsets), trimmed to beginChar on
    * the left and endChar of the end field on the right.
    */
  def keyText(fields: Column, sep: String, k: KeySpec): Column = {
    val lastF =
      if (k.endField == 0) size(fields)
      else least(lit(k.endField), size(fields))
    val span = greatest(lastF - lit(k.beginField) + lit(1), lit(0))
    val joined = concat_ws(sep, slice(fields, lit(k.beginField), span))
    val tailTrim =
      if (k.endChar == 0) lit(0)
      else greatest(length(element_at(fields, lastF)) - lit(k.endChar), lit(0))
    joined.substr(lit(k.beginChar),
      length(joined) - tailTrim - lit(k.beginChar - 1))
  }

  /** Sort expressions for a full `-k` option string, e.g.
    * `"-k3.2,3.6nr -k2,2n"`.
    */
  def sortColumnsK(fields: Column, sep: String, options: String): Seq[Column] =
    parseK(options).map { k =>
      val key = keyText(fields, sep, k)
      val typed = if (k.numeric) key.cast("double") else key
      if (k.reverse) typed.desc else typed.asc
    }
}
