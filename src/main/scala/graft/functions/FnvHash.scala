package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash helpers, callable from interpreted eval AND generated
  * Java (top-level object → static forwarders on class `FnvHash64`).
  *
  * Semantics follow the reference engine (be/src/util/hash-util.h:112-119:
  * `hash = (byte ^ hash) * prime` over the value's little-endian bytes,
  * seed 0xcbf29ce484222325; dispatch per type
  * be/src/exprs/utility-functions.cc:30-58): fixed-width numerics hash
  * `sizeof(val)` LE bytes, strings hash their UTF-8 bytes.
  */
object FnvHash64 {
  final val Prime = 0x100000001b3L
  final val Seed = 0xcbf29ce484222325L // standard FNV-64 offset basis

  def hashBytes(bytes: Array[Byte], len: Int): Long = {
    var h = Seed
    var i = 0
    while (i < len) {
      h = ((bytes(i).toLong & 0xffL) ^ h) * Prime
      i += 1
    }
    h
  }

  /** Hash the low `n` little-endian bytes of `v` (covers bool/int/long). */
  def hashLongBits(v: Long, n: Int): Long = {
    var h = Seed
    var i = 0
    while (i < n) {
      h = (((v >>> (8 * i)) & 0xffL) ^ h) * Prime
      i += 1
    }
    h
  }

  def hashUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    hashBytes(b, b.length)
  }

  def hashDouble(v: Double): Long = hashLongBits(java.lang.Double.doubleToLongBits(v), 8)
  def hashFloat(v: Float): Long = hashLongBits(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)
}

/** `fnv_hash(expr) → bigint` — the reference's only hash UDF surfaced to
  * SQL (common/function-registry/impala_functions.py `fnv_hash`;
  * be/src/exprs/utility-functions.cc:30-58). Implemented as a native
  * Catalyst expression with codegen, so it runs inside whole-stage codegen
  * rather than as a boxed Scala UDF — at 100 TB this is the difference
  * between a pipelined scan and a serialization wall.
  */
case class FnvHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType |
           TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv_hash does not support type ${t.catalogString}")
    }

  // Byte width of the fixed-width encodings (timestamps hash their 8-byte
  // epoch-micros, dates their 4-byte epoch-days — documented delta vs the
  // reference's 12-byte boost timestamp layout).
  private def width(t: DataType): Int = t match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | DateType => 4
    case _ => 8
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => FnvHash64.hashUtf8(input.asInstanceOf[UTF8String])
    case BinaryType =>
      val b = input.asInstanceOf[Array[Byte]]
      FnvHash64.hashBytes(b, b.length)
    case DoubleType => FnvHash64.hashDouble(input.asInstanceOf[Double])
    case FloatType => FnvHash64.hashFloat(input.asInstanceOf[Float])
    case BooleanType => FnvHash64.hashLongBits(if (input.asInstanceOf[Boolean]) 1L else 0L, 1)
    case t =>
      val v = input match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      }
      FnvHash64.hashLongBits(v, width(t))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = classOf[FnvHash64.type].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = $h.hashUtf8($c);"
      case BinaryType => s"${ev.value} = $h.hashBytes($c, $c.length);"
      case DoubleType => s"${ev.value} = $h.hashDouble($c);"
      case FloatType => s"${ev.value} = $h.hashFloat($c);"
      case BooleanType => s"${ev.value} = $h.hashLongBits($c ? 1L : 0L, 1);"
      case t => s"${ev.value} = $h.hashLongBits((long) $c, ${width(t)});"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FnvHash =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash"
}
