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

/** `heavy_hitters(item, m)` — a Misra-Gries frequency summary: at most `m`
  * (item, est) pairs where `est` UNDERCOUNTS the item's true frequency by a
  * bounded amount, returned as `array<struct<item, est: bigint>>` sorted
  * est-descending (ties item-ascending).
  *
  * Guarantee (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with N input rows and M = Σ retained
  * est after aggregation,
  *
  *     est(x) <= true(x) <= est(x) + (N - M) / (m + 1)      for every x,
  *
  * and any item absent from the summary has true(x) <= (N - M) / (m + 1).
  * That containment bound is what makes an EXACT top-k recoverable: if the
  * k-th exact count among the summary's candidates exceeds the bound, no
  * non-candidate can reach the top k (see `LlmOps.qVocabTopkApprox`, which
  * asserts this at runtime instead of trusting the sketch).
  *
  * Why this exists (the 100 TB argument): an exact `groupBy(token).count`
  * over a token stream shuffles one partial count per DISTINCT token per
  * map task — at corpus scale the distinct-token universe grows with the
  * data (Heaps' law), so the exchange grows with the corpus even though
  * only the top k matter. This aggregate's PARTIAL phase keeps one bounded
  * m-entry map per task inside ObjectHashAggregate, so the exchange carries
  * (mapTasks × m) rows regardless of corpus size — the same
  * bounded-front-instead-of-everything posture as [[TopKFront]]. The
  * reference's sketch aggregates (ndv/pc/pcsa, be/src/exec/
  * aggregation-node and aggregate-functions.h) play this role for distinct
  * counting; Misra-Gries is the matching public sketch for frequency.
  *
  * Update is the classic MG step (hit: +1; room: insert; full: decrement
  * all by 1, drop zeros — amortized O(1): each decrement-all retires m+1
  * units of the ≤ N units ever inserted). Merge is pointwise addition
  * followed by subtracting the (m+1)-th largest count and dropping
  * non-positives, which preserves the error bound additively. Null inputs
  * are ignored (the aggregate-null posture of count(col)).
  */
case class HeavyHitters(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with BinaryLike[Expression] {

  def this(child: Expression, capExpr: Expression) = this(child, capExpr, 0, 0)

  override def left: Expression = child
  override def right: Expression = capExpr

  private lazy val m: Int = capExpr.eval().asInstanceOf[Number].intValue()
  private lazy val itemType: DataType = child.dataType
  private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(itemType).asInstanceOf[Ordering[Any]]

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", itemType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = {
    val capIntegral = capExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!TopKFront.idSupported(itemType))
      TypeCheckResult.TypeCheckFailure(
        "heavy_hitters requires an atomic orderable item column")
    else if (capExpr.foldable && capIntegral && capExpr.eval() != null && m > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "heavy_hitters: capacity must be a positive integer literal")
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val existing = buf.get(v)
      if (existing.isDefined) {
        buf.update(v, existing.get + 1L)
      } else if (buf.size < m) {
        // copy: the child eval may reuse backing buffers across rows
        val key = v match {
          case s: UTF8String => s.clone()
          case other => other
        }
        buf.update(key, 1L)
      } else {
        // decrement-all: retires m+1 units (m retained + the arrival), so
        // this branch runs at most N/(m+1) times total — amortized O(1).
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > m) {
      // subtract the (m+1)-th largest count; survivors are the ≤ m entries
      // strictly above it (Agarwal et al. merge — bound stays additive).
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - (m + 1))
      buf.mapValuesInPlace((_, c) => c - threshold)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries = buf.toArray
    // deterministic output: est desc, item asc
    java.util.Arrays.sort(entries, new java.util.Comparator[(Any, Long)] {
      override def compare(a: (Any, Long), b: (Any, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else itemOrdering.compare(a._1, b._1)
      }
    })
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      TopKFront.writeId(out, itemType, k)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) {
      val k = TopKFront.readId(in, itemType)
      buf.update(k, in.readLong())
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHitters =
    copy(child = newLeft, capExpr = newRight)
}
