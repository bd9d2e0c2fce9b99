package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** `precision(d)` / `scale(d)` — the declared precision/scale of a
  * decimal expression's TYPE (reference: decimal-functions.cc
  * DecimalFunctions::Precision/Scale, which read the arg type, not the
  * value — a NULL input still reports its type, so this is non-nullable).
  * Requires a DECIMAL argument (exact numeric literals like 1.25 already
  * parse as decimals; other numerics need an explicit CAST — the
  * reference resolves those via implicit cast, a documented delta). The
  * result is a plan-time constant; codegen emits a literal. */
case class DecimalTypeInfo(child: Expression, ofScale: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DECIMAL argument, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = if (ofScale) "scale" else "precision"

  private def info: Int = child.dataType match {
    case d: DecimalType => if (ofScale) d.scale else d.precision
    case _ => throw new IllegalStateException(s"non-decimal input: ${child.dataType}")
  }

  override def eval(input: InternalRow): Any = info

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"",
      value = JavaCode.literal(info.toString, IntegerType), isNull = FalseLiteral)

  override protected def withNewChildInternal(newChild: Expression): DecimalTypeInfo =
    copy(child = newChild)
}
