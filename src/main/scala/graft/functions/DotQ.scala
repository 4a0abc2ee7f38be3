package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<long>` columns — the
  * workhorse of every quantized-vector path (cosine scoring, SRP band
  * keys, norms as `dot_q(v, v)`). Semantically identical to
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)`, but that composition runs
  * interpreted lambdas per element and materializes the zipped array;
  * this is one primitive loop inside whole-stage codegen. Registered as
  * SQL fn `dot_q` through [[graft.core.GraftSession]] (the engine's second
  * custom Expression, after [[Md5Hash48]] — both earn their keep on
  * measured hot paths).
  */
final case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQ.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotQ.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

object DotQ {
  /** Called from generated code — keep signature stable. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dot_q"),
    new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_q takes exactly two arguments")
      DotQ(children.head, children(1))
    },
  )
}
