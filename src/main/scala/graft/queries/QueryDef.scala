package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One catalog entry: a Spark-side query plus (optionally) the equivalent
  * ANSI SQL the DuckDB oracle runs over the same parquet tables. Oracle-less
  * entries get the driver's weaker rows>0 check (used for approximate /
  * non-SQL-expressible operators).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlBacked(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))

  def weak(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Run `body` with all test tables registered as temp views (for entries
    * exercising the SQL surface: CTEs, VALUES, grouping sets, subqueries).
    */
  def withViews(spark: SparkSession, dir: String)(body: => DataFrame): DataFrame = {
    Tables.registerAll(spark, dir)
    body
  }

  // ---- shared oracle-parity helpers -------------------------------------

  /** Exact decimal sum of a double column, surfaced as double.
    *
    * Scale choice matters for oracle parity: the synthetic money columns are
    * clean 2-decimal values, so products of two (three) of them carry exactly
    * 4 (6) decimal digits. Casting such a double to a decimal of its exact
    * scale never lands on a rounding midpoint, so Spark's shortest-repr
    * rounding and DuckDB's exact-binary rounding agree bit-for-bit. Casting
    * to a *narrower* scale (e.g. 2) hits .xx5 midpoints where they disagree.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Order-insensitive exact average of a double column (see [[dsum]]). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 2): String =
    s"${dsumSql(expr, scale)} / COUNT($expr)"
}
