package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels for the similarity-search operators, callable from
  * interpreted eval AND generated Java (top-level object → static
  * forwarders).
  *
  * All accumulation is a SEQUENTIAL double left fold in element order —
  * exactly the semantics of `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * these kernels replace — so results stay bit-identical to the previous
  * higher-order-function formulation (and to DuckDB's
  * `list_sum(list_transform(...))` oracle), while running as one tight
  * loop inside whole-stage codegen instead of per-element interpreted
  * lambda dispatch.
  *
  * Null semantics mirror zip_with/aggregate: mismatched lengths or any
  * null element → null (returned as a boxed null).
  */
object VectorMath {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** dot(a, b); null on length mismatch / null element. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    acc
  }

  /** Integer dot product over two int8 code arrays (the quantized-ANN
    * candidate-scoring kernel): Σ qa_i·qb_i accumulated in long — exact,
    * order-independent, no floating point anywhere. Null on length
    * mismatch / null element, mirroring [[dot]]. */
  def dotQ8(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  /** Full int8 scalar-quantization index row for one vector, in ONE pass:
    * (codes array<tinyint>, o double, s double, sumq long, nrm double)
    * with v_i ≈ o + s·q_i (asymmetric affine, s = range/255,
    * o = min + 128s) and nrm the exact float norm. Replaces three
    * interpreted higher-order-function folds (transform + aggregate +
    * norm) that dominated index-build time ~10:1; null on any null
    * element. Returned as an InternalRow for the QuantizeQ8 expression. */
  def quantizeQ8(v: ArrayData, isFloat: Boolean):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var vmin = Double.PositiveInfinity
    var vmax = Double.NegativeInfinity
    var nrm2 = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = elem(v, i, isFloat)
      // NaN never updates vmin/vmax (all comparisons false), so a NaN
      // element would quantize to a finite bogus code (-128) and the
      // approximate score could rank the row where the exact cosine path
      // yields NaN — return null instead, same posture as null elements.
      if (x != x) return null
      if (x < vmin) vmin = x
      if (x > vmax) vmax = x
      nrm2 += x * x
      i += 1
    }
    // constant vector → zero range: any s reconstructs exactly via o
    val s = if (vmax > vmin) (vmax - vmin) / 255.0 else 1.0
    val codes = new Array[Byte](n)
    var sumq = 0L
    i = 0
    while (i < n) {
      val q0 = Math.round((elem(v, i, isFloat) - vmin) / s)
      val q = (if (q0 > 255L) 255L else q0) - 128L
      codes(i) = q.toByte
      sumq += q
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes),
        vmin + 128.0 * s, s, sumq, math.sqrt(nrm2)))
  }

  /** cosine(a, b) = dot/(|a|*|b|), all three folds sequential in element
    * order; null on length mismatch / null element. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Shared scaffolding for the binary array<float|double> → double kernels. */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null is produced on length mismatch / null element even when both
  // inputs are non-nullable — without this, codegen would emit an
  // assignment to a constant-false isNull.
  override def nullable: Boolean = true

  protected def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def kernel: String // static method name on VectorMath

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (kernel == "dot")
        VectorMath.dot(a.asInstanceOf[ArrayData], elementIsFloat(left),
          b.asInstanceOf[ArrayData], elementIsFloat(right))
      else
        VectorMath.cosine(a.asInstanceOf[ArrayData], elementIsFloat(left),
          b.asInstanceOf[ArrayData], elementIsFloat(right))
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vm = classOf[VectorMath.type].getName.stripSuffix("$")
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = $vm.$kernel($a, ${elementIsFloat(left)}, $b, ${elementIsFloat(right)});
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }
}

/** `dot_product(a, b)` — sequential-fold double dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def kernel: String = "dot"
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `cosine_similarity(a, b)` — single-pass cosine (dot + both norms in one
  * loop), replacing three interpreted `aggregate(zip_with(...))` folds. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def kernel: String = "cosine"
  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** `quantize_q8(v)` — one-pass int8 scalar quantization of a float/double
  * vector into its index row: struct(qv array<tinyint>, o, s, sumq, nrm).
  * The ANN index-build kernel: a single codegen'd loop replacing three
  * interpreted higher-order-function folds (min/max + codes + Σq + norm),
  * measured ~10× on the corpus quantization stage. */
case class QuantizeQ8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = QuantizeQ8.schema
  override def nullable: Boolean = true // null element → null row
  override def prettyName: String = "quantize_q8"

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    VectorMath.quantizeQ8(v.asInstanceOf[ArrayData], elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vm = classOf[VectorMath.type].getName.stripSuffix("$")
    val row = ctx.freshName("qrow")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |InternalRow $row = $vm.quantizeQ8($v, $elementIsFloat);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): QuantizeQ8 =
    copy(child = c)
}

object QuantizeQ8 {
  val schema: StructType = StructType(Seq(
    StructField("qv", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("o", DoubleType, nullable = false),
    StructField("s", DoubleType, nullable = false),
    StructField("sumq", LongType, nullable = false),
    StructField("nrm", DoubleType, nullable = false)))
}

/** `dot_product_q8(a, b)` — exact integer dot product over int8
  * quantization codes (`array<tinyint>`), accumulated in long. The scoring
  * kernel of the scalar-quantized ANN path: the corpus scan touches 1 byte
  * per dimension instead of 4, and the hot loop is pure integer
  * multiply-add inside whole-stage codegen. */
case class DotProductQ8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // length mismatch / null element
  override def prettyName: String = "dot_product_q8"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<tinyint> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorMath.dotQ8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vm = classOf[VectorMath.type].getName.stripSuffix("$")
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long $boxed = $vm.dotQ8($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductQ8 =
    copy(left = l, right = r)
}
