package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational query catalog: each entry exercises one operator family from
  * SURVEY.md §2 with the DataFrame API (Catalyst plans the physical side).
  * Numeric aggregates are computed in DECIMAL then cast to DOUBLE so the
  * result is bit-identical to the DuckDB oracle regardless of float
  * summation order — distributed sums over doubles are otherwise
  * non-deterministic across partitionings.
  */
object Relational {

  import Parity.dsum

  /** TPC-H Q1: scan → filter → hash agg (partial+final) → sort.
    * Reference operator: PartitionedAggregationNode
    * (be/src/exec/partitioned-aggregation-node.cc:46-88).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    // parallelism floor (r12): the partial aggregate — 8 decimal sums per
    // row — fuses onto the scan, so a single-row-group file serializes the
    // whole aggregation onto one core (measured 1.16s isolated at sf0.1;
    // 0.7s with the floor). No-op whenever the scan already has working
    // splits >= cores.
    val li = Tables.parallelizedHeavy(Tables.load(spark, dir, "lineitem"))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""
}
