package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sample(expr)` — the reference's reservoir-sample aggregate
  * (be/src/exprs/aggregate-functions.h:143-167, BuiltinsDb.java:564-592):
  * up to [[SampleAgg.K]] values from the group as a comma-separated string.
  *
  * Delta vs reference, on purpose: the reference's reservoir uses RNG, so
  * its output is irreproducible run to run. This implementation is
  * **bottom-k by hash** — keep the k values whose fnv-hash is smallest.
  * That is still a uniform sample over distinct inputs, but deterministic
  * across runs, partitionings, and engines, and it merges exactly
  * (bottom-k of a union = merge of bottom-ks) — the property a distributed
  * partial/final aggregation needs.
  */
case class SampleAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[Long, UTF8String]]
  with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 0, 0)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sample"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "sample requires a string argument (cast first)")

  override def createAggregationBuffer(): mutable.TreeMap[Long, UTF8String] =
    mutable.TreeMap.empty

  private def add(buf: mutable.TreeMap[Long, UTF8String], v: UTF8String): Unit = {
    val b = v.getBytes
    val h = FnvHash64.hashBytes(b, b.length)
    if (!buf.contains(h)) {
      buf.put(h, v.clone())
      if (buf.size > SampleAgg.K) buf.remove(buf.lastKey) // keep bottom-k
    }
  }

  override def update(
      buf: mutable.TreeMap[Long, UTF8String], input: InternalRow): mutable.TreeMap[Long, UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(
      buf: mutable.TreeMap[Long, UTF8String],
      other: mutable.TreeMap[Long, UTF8String]): mutable.TreeMap[Long, UTF8String] = {
    other.foreach { case (_, v) => add(buf, v) }
    buf
  }

  override def eval(buf: mutable.TreeMap[Long, UTF8String]): Any =
    if (buf.isEmpty) null
    else UTF8String.concatWs(UTF8String.fromString(", "), buf.values.toSeq: _*)

  override def serialize(buf: mutable.TreeMap[Long, UTF8String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.values.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, UTF8String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      add(buf, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SampleAgg =
    copy(child = newChild)
}

object SampleAgg {
  /** Reference default sample size (aggregate-functions.cc reservoir). */
  val K = 20
}
