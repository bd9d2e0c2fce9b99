package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `group_concat(expr[, separator])` — the reference's string-concat UDA
  * (be/src/exprs/aggregate-functions.h:111-117, registered
  * fe/.../catalog/BuiltinsDb.java:771-792), as a typed imperative aggregate
  * following the same Init/Update/Merge/Finalize protocol the reference
  * defines for UDAs (be/src/udf/udf.h).
  *
  * Delta vs reference, on purpose: output order is SORTED. The reference
  * documents concat order as nondeterministic; a distributed engine that
  * wants reproducible results (and oracle-checkable tests) must pin it.
  *
  * Scale: the buffer is the per-group value list — the shuffle carries one
  * serialized buffer per group per partition (classic partial/final UDA),
  * never the input rows. Groups with millions of values would need a
  * size-capped variant; that matches the reference, which also buffers the
  * full concat per group.
  */
case class GroupConcat(
    child: Expression,
    sep: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[UTF8String]]
  with BinaryLike[Expression] {

  def this(child: Expression, sep: Expression) = this(child, sep, 0, 0)
  def this(child: Expression) =
    this(child, org.apache.spark.sql.catalyst.expressions.Literal(", "), 0, 0)

  override def left: Expression = child
  override def right: Expression = sep

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && sep.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "group_concat requires string arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "group_concat"

  override def createAggregationBuffer(): mutable.ArrayBuffer[UTF8String] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[UTF8String], input: InternalRow): mutable.ArrayBuffer[UTF8String] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[UTF8String],
      other: mutable.ArrayBuffer[UTF8String]): mutable.ArrayBuffer[UTF8String] = buf ++= other

  override def eval(buf: mutable.ArrayBuffer[UTF8String]): Any =
    if (buf.isEmpty) null
    else {
      val s = sep.eval().asInstanceOf[UTF8String]
      UTF8String.concatWs(s, buf.sorted(Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0)).toSeq: _*)
    }

  override def serialize(buf: mutable.ArrayBuffer[UTF8String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[UTF8String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupConcat =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupConcat =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GroupConcat =
    copy(child = newLeft, sep = newRight)
}
