package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 48-bit hash —
  * semantically identical to `conv(substr(md5(x), 1, 12), 16, 10)::long`
  * (the first 12 hex chars of an md5 ARE its first 6 digest bytes,
  * big-endian), but fused: one digest call and a 48-bit extract, with
  * `doGenCode` so it stays inside whole-stage codegen. The composed form
  * allocates three intermediate strings per row (hex, substring, decimal
  * string) on the hot paths that hash every shingle/token/key.
  *
  * Registered as SQL function `md5_hash48` through
  * [[graft.core.GraftSession]]'s `SparkSessionExtensions.injectFunction`.
  * This is the engine's one custom Expression; everything else in SURVEY §4
  * is deliberately built-in (a custom op has to beat composition to earn
  * its maintenance cost — this one does, measurably, on dedup pipelines).
  */
final case class Md5Hash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash48"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash48.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash48.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash48 =
    copy(child = newChild)
}

object Md5Hash48 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 6 md5 digest bytes, big-endian — equals parsing the first 12
    * lowercase-hex chars. Called from generated code: keep signature stable.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** injectFunction registration for SparkSessionExtensions. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("md5_hash48"),
    new ExpressionInfo(classOf[Md5Hash48].getName, "md5_hash48"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "md5_hash48 takes exactly one argument")
      Md5Hash48(children.head)
    },
  )
}
