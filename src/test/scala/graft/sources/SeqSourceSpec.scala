package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeqSourceSpec extends SparkSpec {

  private def seq(rows: Int, slices: Int = 4) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("generates the declared sequence across partitioned slices") {
    val df = seq(1000, slices = 7)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 7)
    val row = df.filter(col("id") === 42).collect()(0)
    assert(row.getLong(0) === 42L)
    assert(row.getInt(1) === 2)
    assert(row.getDouble(2) === 10.5)
    assert(df.agg(sum(col("id"))).collect()(0).getLong(0) === 499500L)
  }

  test("range filters on id push into the source (fewer rows generated)") {
    val df = seq(1000000).filter(col("id") >= 999990L && col("id") < 999995L)
    // full absorption: the range conjuncts vanish into the scan, leaving no
    // residual Filter node above the BatchScan
    val hasFilterNode = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.nonEmpty
    assert(!hasFilterNode, df.queryExecution.executedPlan.toString)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (999990L until 999995L).toSeq)
    // pushdown means the scan emits only the 5-row slice, not 1M rows
    val scanned = df.queryExecution.executedPlan.collectLeaves().head.metrics("numOutputRows")
    df.collect()
    assert(scanned.value <= 5)
  }

  test("column pruning reaches the reader schema") {
    val df = seq(100).select(col("grp")).distinct()
    val leafSchema = df.queryExecution.executedPlan.collectLeaves().head.schema
    assert(leafSchema.fieldNames.toSeq === Seq("grp"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq === (0 until 10).toSeq)
  }
}
