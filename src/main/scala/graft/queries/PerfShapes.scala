package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Parity.dsum

/** The reference's two remaining workload dirs, re-expressed on the
  * synthetic star schema:
  *
  *  - `testdata/workloads/targeted-perf/queries/{aggregation,limit,
  *    string}.test` — hand-picked planner/exec hot paths: aggregate
  *    cardinality tiers, ultra-selective conjunctive pushdown,
  *    inline-view column pruning (PERF_AGG-Q6/Q7), LIMIT 0 metadata
  *    short-circuit, and the LIKE predicate family (PERF_STRING-Q1..7);
  *  - `testdata/workloads/hive-benchmark/queries/hive-benchmark.test` —
  *    the AMPLab big-data shapes: grep (contains-LIKE count) and the
  *    uservisits⋈rankings revenue top-1 (WEB_Q1).
  *
  * Columns the synthetic schema lacks (l_shipmode, l_comment,
  * l_receiptdate) map to the nearest same-type column; the SHAPE (plan
  * decision under test) is what's preserved. Doubles route through
  * [[Parity.dsum]] so the driver hash gate holds at any scale.
  */
object PerfShapes {

  /** PERF_AGG-Q1 + Q4 merged: the multi-type aggregate row computed per
    * HIGH-cardinality group (one group per supplier), with a total order.
    * Exercises partitioned hash aggregation past the in-cache regime —
    * the tier the reference calls out as "interesting for partitioned
    * aggregation" (aggregation.test PERF_AGG-Q4 comment). */
  def qPerfAggHighcard(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("l_linenumber")).as("min_line"),
        max(col("l_quantity")).as("max_qty"),
        round(dsum(col("l_tax")), 2).as("sum_tax"))
      .orderBy(col("l_suppkey"), col("cnt"))

  val qPerfAggHighcardSql: String =
    s"""SELECT l_suppkey, count(*) AS cnt, min(l_linenumber) AS min_line,
       |       max(l_quantity) AS max_qty,
       |       round(${Parity.dsumSql("l_tax")}, 2) AS sum_tax
       |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey, cnt""".stripMargin

  /** PERF_AGG-Q5 (IMPALA-288 regression shape): a conjunctive filter
    * selecting a handful of rows from the fact, under min(string) —
    * every predicate must reach the parquet scan (row-group pruning at
    * scale), leaving a near-empty aggregate. */
  def qPerfSelective(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_linenumber") === 3 &&
        col("l_orderkey") > 1000 && col("l_orderkey") < 1012)
      .agg(min(col("l_returnflag")).as("min_flag"), count(lit(1)).as("cnt"))

  val qPerfSelectiveSql: String =
    """SELECT min(l_returnflag) AS min_flag, count(*) AS cnt FROM lineitem
      |WHERE l_linenumber = 3 AND l_orderkey > 1000 AND l_orderkey < 1012""".stripMargin

  /** PERF_AGG-Q6/Q7: an inline view aggregating all 8 numeric lineitem
    * columns, of which the outer select keeps TWO — the planner must
    * prune the other six aggregates AND their columns out of the scan
    * (the golden plan fingerprint pins SCAN:...:c2). The kept sums are
    * bigint, so the result is exact at any scale. */
  def qPerfInlinePrune(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val v1 = l.agg(
      sum(col("l_orderkey")).as("c1"),
      sum(col("l_partkey")).as("c2"),
      sum(col("l_suppkey")).as("c3"),
      sum(col("l_linenumber")).as("c4"),
      sum(col("l_quantity")).as("c5"),
      sum(col("l_extendedprice")).as("c6"),
      sum(col("l_discount")).as("c7"),
      sum(col("l_tax")).as("c8"))
    v1.select(col("c1"), col("c2"))
  }

  val qPerfInlinePruneSql: String =
    """SELECT CAST(v1.c1 AS BIGINT) AS c1, CAST(v1.c2 AS BIGINT) AS c2 FROM (
      |  SELECT sum(l_orderkey) AS c1, sum(l_partkey) AS c2,
      |         sum(l_suppkey) AS c3, sum(l_linenumber) AS c4,
      |         sum(l_quantity) AS c5, sum(l_extendedprice) AS c6,
      |         sum(l_discount) AS c7, sum(l_tax) AS c8
      |  FROM lineitem) v1""".stripMargin

  /** PERF_LIMIT-Q1: LIMIT 0 — planner short-circuit to an empty relation
    * (metadata-path cost only; the fingerprint pins the LOCAL empty scan,
    * no file I/O). Projected to stable-typed columns so the driver's
    * schema check is meaningful on zero rows. */
  def qPerfLimit0(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .limit(0)

  val qPerfLimit0Sql: String =
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem LIMIT 0"

  /** PERF_STRING-Q1..Q7 + hive-benchmark GREP in one scan over the
    * documents corpus: equality, exact LIKE, prefix, suffix, contains,
    * interior-wildcard, and a function-wrapped (non-pushable) contains —
    * seven predicate forms, seven counts, one pass. At 100 TB each form
    * stresses a different scan path (dictionary equality, prefix
    * row-group pruning, full-text contains). */
  def qPerfStringGrep(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.parallelized(
      Tables.load(spark, dir, "documents").select(col("text")))
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    t.agg(
      cnt(col("text") === "spark merge sort").as("n_eq"),
      cnt(col("text").like("spark merge sort")).as("n_like_exact"),
      cnt(col("text").like("the %")).as("n_prefix"),
      cnt(col("text").like("% window")).as("n_suffix"),
      cnt(col("text").like("%spark%")).as("n_contains"),
      cnt(col("text").like("%merge%sort%")).as("n_interior"),
      cnt(lower(col("text")).like("%spark%")).as("n_fn_wrapped"))
  }

  val qPerfStringGrepSql: String =
    """SELECT
      |  CAST(sum(CASE WHEN text = 'spark merge sort' THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
      |  CAST(sum(CASE WHEN text LIKE 'spark merge sort' THEN 1 ELSE 0 END) AS BIGINT) AS n_like_exact,
      |  CAST(sum(CASE WHEN text LIKE 'the %' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
      |  CAST(sum(CASE WHEN text LIKE '% window' THEN 1 ELSE 0 END) AS BIGINT) AS n_suffix,
      |  CAST(sum(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
      |  CAST(sum(CASE WHEN text LIKE '%merge%sort%' THEN 1 ELSE 0 END) AS BIGINT) AS n_interior,
      |  CAST(sum(CASE WHEN lower(text) LIKE '%spark%' THEN 1 ELSE 0 END) AS BIGINT) AS n_fn_wrapped
      |FROM documents""".stripMargin

  /** hive-benchmark WEB_Q1 on the star schema: fact (events = uservisits)
    * joined to a dimension (customer = rankings), date-range filtered,
    * grouped by visitor, top-1 by total revenue. The dimension broadcasts;
    * the top-1 is a TakeOrdered, not a global sort. user_id breaks
    * revenue ties so the LIMIT row is deterministic in both engines. */
  def qHiveWeb(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-15"))
    val c = Tables.load(spark, dir, "customer")
    e.join(c, e("user_id") === c("c_custkey"))
      .groupBy(col("user_id"))
      .agg(round(dsum(col("c_acctbal")) / count(lit(1)), 2).as("avg_rank"),
        round(dsum(col("value"), 4), 4).as("totalrevenue"))
      .orderBy(col("totalrevenue").desc, col("user_id"))
      .limit(1)
  }

  val qHiveWebSql: String =
    s"""SELECT e.user_id,
       |       round(${Parity.dsumSql("c.c_acctbal")} / count(*), 2) AS avg_rank,
       |       round(${Parity.dsumSql("e.value", 4)}, 4) AS totalrevenue
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |WHERE e.ts >= '2024-01-08' AND e.ts < '2024-01-15'
       |GROUP BY e.user_id
       |ORDER BY totalrevenue DESC, e.user_id LIMIT 1""".stripMargin
}
