package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** External pluggable source — the reference's ext-data-source surface
  * (Thrift prepare/open/getNext/close API, ext-data-source/api/;
  * planned by fe/.../planner/DataSourceScanNode.java, executed by
  * be/src/exec/data-source-scan-node.cc) re-expressed as a Spark
  * DataSource V2 `TableProvider`.
  *
  * The source generates a deterministic integer sequence table
  * (id BIGINT, grp INT, v DOUBLE) — the moral equivalent of the
  * reference's test data source — and demonstrates the two contract
  * points that matter at scale:
  *   - **filter pushdown**: range predicates on `id` narrow the generated
  *     range inside the source (reference: accepted-conjuncts protocol);
  *   - **column pruning**: the reader materializes only requested columns;
  *   - **partitioned parallelism**: the range splits into `slices` input
  *     partitions, each read independently (scan-range assignment).
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("rows", n).option("slices", k).load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  def grpOf(id: Long): Int = (id % 10).toInt
  def vOf(id: Long): Double = id * 0.25
}

private class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

private class SeqScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.schema

  // Range conjuncts on `id` are absorbed into the generated bounds — the
  // analogue of the reference's accepted-conjuncts list; everything else
  // stays residual for Spark to evaluate.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long) => { lo = math.max(lo, v + 1); true }
      case GreaterThanOrEqual("id", v: Long) => { lo = math.max(lo, v); true }
      case LessThan("id", v: Long) => { hi = math.min(hi, v); true }
      case LessThanOrEqual("id", v: Long) => { hi = math.min(hi, v + 1); true }
      case EqualTo("id", v: Long) => { lo = math.max(lo, v); hi = math.min(hi, v + 1); true }
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, hi, slices, required)
}

private class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per).map(s => SeqPartition(s, math.min(s + per, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

private case class SeqPartition(start: Long, end: Long) extends InputPartition

private class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "id" => cur
          case "grp" => SeqSource.grpOf(cur)
          case "v" => SeqSource.vOf(cur)
        })
      override def close(): Unit = ()
    }
  }
}
