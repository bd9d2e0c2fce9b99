package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `top_k_front(struct(score, id), k)` — bounded per-group top-k as a
  * partial-merging aggregate: keep the k entries with the HIGHEST score
  * (ties by id ascending, the exact total order of
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k`), returned as
  * an `array<struct>` sorted best-first.
  *
  * Why this exists (the 100 TB argument): the naive per-group top-k —
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` — must
  * hash-exchange EVERY scored row into at most |distinct g| partitions
  * before it can rank. For ANN candidate generation g = query_id, so a
  * corpus-sized scored relation funnels through ~nQueries tasks: both a
  * key-cardinality parallelism ceiling and a full-corpus shuffle. As a
  * TypedImperativeAggregate this runs inside ObjectHashAggregate's
  * PARTIAL phase instead: each map task keeps one bounded heap per group
  * locally, the exchange carries only (mapTasks × groups) serialized
  * fronts of ≤ k entries, and the FINAL merge is a heap union. The
  * corpus-side rows never cross the wire. (The reference's analogue is
  * TopNNode's per-fragment re-materializing heap, be/src/exec/
  * topn-node.cc — this is the same idea made grouped and mergeable.)
  *
  * Contract: (score, id) pairs must be UNIQUE within a group (true for
  * every caller — candidate ids are deduped before ranking); identical
  * duplicates would collapse, as in any set-based heap. Null scores sort
  * last (Spark's `DESC` default NULLS LAST), null ids first (`ASC`
  * default NULLS FIRST) — byte-for-byte the window ordering it replaces.
  */
case class TopKFront(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[TopKFront.Entry]]
  with BinaryLike[Expression] {

  def this(child: Expression, kExpr: Expression) = this(child, kExpr, 0, 0)

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val idType: DataType = structType.fields(1).dataType
  private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType).asInstanceOf[Ordering[Any]]

  // best-first total order: score desc (nulls last), id asc (nulls first)
  private lazy val ord: Ordering[TopKFront.Entry] = new Ordering[TopKFront.Entry] {
    override def compare(a: TopKFront.Entry, b: TopKFront.Entry): Int = {
      if (a.nullScore != b.nullScore) return if (a.nullScore) 1 else -1
      if (!a.nullScore) {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) return c
      }
      if (a.nullId != b.nullId) return if (a.nullId) -1 else 1
      if (a.nullId) 0 else idOrdering.compare(a.id, b.id)
    }
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_front"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 && s.fields(0).dataType == DoubleType &&
        TopKFront.idSupported(s.fields(1).dataType) =>
      val kIntegral = kExpr.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (kExpr.foldable && kIntegral && kExpr.eval() != null && k > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("top_k_front: k must be a positive integer literal")
    case _ => TypeCheckResult.TypeCheckFailure(
      "top_k_front requires struct(score: double, id: atomic orderable)")
  }

  override def createAggregationBuffer(): mutable.TreeSet[TopKFront.Entry] =
    mutable.TreeSet.empty(ord)

  private def add(buf: mutable.TreeSet[TopKFront.Entry], e: TopKFront.Entry): Unit = {
    // cheap reject: full heap and e is no better than the current worst
    if (buf.size >= k && ord.compare(e, buf.last) >= 0) return
    buf.add(e)
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(
      buf: mutable.TreeSet[TopKFront.Entry], input: InternalRow): mutable.TreeSet[TopKFront.Entry] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val nullScore = row.isNullAt(0)
      val score = if (nullScore) 0.0 else row.getDouble(0)
      val nullId = row.isNullAt(1)
      // copy: the struct eval may reuse backing buffers across rows
      val id = if (nullId) null else row.get(1, idType) match {
        case s: UTF8String => s.clone()
        case other => other
      }
      add(buf, TopKFront.Entry(nullScore, score, nullId, id))
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[TopKFront.Entry],
      other: mutable.TreeSet[TopKFront.Entry]): mutable.TreeSet[TopKFront.Entry] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[TopKFront.Entry]): Any =
    new GenericArrayData(buf.toArray.map { e =>
      new GenericInternalRow(Array[Any](
        if (e.nullScore) null else e.score,
        if (e.nullId) null else e.id))
    })

  override def serialize(buf: mutable.TreeSet[TopKFront.Entry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      out.writeBoolean(e.nullScore)
      out.writeDouble(if (e.nullScore) 0.0 else e.score)
      out.writeBoolean(e.nullId)
      if (!e.nullId) TopKFront.writeId(out, idType, e.id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[TopKFront.Entry] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) {
      val nullScore = in.readBoolean()
      val score = in.readDouble()
      val nullId = in.readBoolean()
      val id = if (nullId) null else TopKFront.readId(in, idType)
      add(buf, TopKFront.Entry(nullScore, score, nullId, id))
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFront =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFront =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKFront =
    copy(child = newLeft, kExpr = newRight)
}

object TopKFront {
  /** One heap entry: Catalyst-internal id value + explicit null flags so
    * the comparator reproduces the window's null placement exactly. */
  final case class Entry(nullScore: Boolean, score: Double, nullId: Boolean, id: Any)

  /** Atomic id types with a fixed-width (or length-prefixed) wire form. */
  def idSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  def writeId(out: java.io.DataOutputStream, dt: DataType, id: Any): Unit = dt match {
    case LongType | TimestampType | TimestampNTZType => out.writeLong(id.asInstanceOf[Long])
    case IntegerType | DateType => out.writeInt(id.asInstanceOf[Int])
    case ShortType => out.writeShort(id.asInstanceOf[Short].toInt)
    case ByteType => out.writeByte(id.asInstanceOf[Byte].toInt)
    case DoubleType => out.writeDouble(id.asInstanceOf[Double])
    case FloatType => out.writeFloat(id.asInstanceOf[Float])
    case BooleanType => out.writeBoolean(id.asInstanceOf[Boolean])
    case StringType =>
      val b = id.asInstanceOf[UTF8String].getBytes
      out.writeInt(b.length); out.write(b)
    case other => throw new IllegalStateException(s"top_k_front id type $other")
  }

  def readId(in: java.io.DataInputStream, dt: DataType): Any = dt match {
    case LongType | TimestampType | TimestampNTZType => in.readLong()
    case IntegerType | DateType => in.readInt()
    case ShortType => in.readShort()
    case ByteType => in.readByte()
    case DoubleType => in.readDouble()
    case FloatType => in.readFloat()
    case BooleanType => in.readBoolean()
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); UTF8String.fromBytes(b)
    case other => throw new IllegalStateException(s"top_k_front id type $other")
  }
}
