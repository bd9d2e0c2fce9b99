package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Parity._

/** Window / analytic functions — the reference's AnalyticEvalNode surface
  * (be/src/exec/analytic-eval-node.cc; frame rules
  * fe/.../analysis/AnalyticWindow.java:37-90; functions
  * BuiltinsDb.java:796-867) on Spark's WindowExec.
  *
  * Determinism: every ORDER BY within a partition ends on a unique key
  * (o_orderkey / (l_orderkey,l_linenumber)) — rank() ties are fine but
  * row_number/lag/frames over non-unique orders would be partition-order
  * dependent. Frame sums aggregate decimals (exact) and surface doubles.
  *
  * Scale: one shuffle per distinct partitioning; all four functions in a
  * query share Window.partitionBy(o_custkey) so Catalyst plans a single
  * sort+window over one exchange.
  */
object Windows {

  /** rank / dense_rank / row_number (reference: BuiltinsDb.java:796-822). */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowRankSql: String = """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS drnk,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn"""

  /** lag/lead with explicit offset + default (reference: BuiltinsDb.java:824-847;
    * offset/default semantics aggregate-functions.h:214-259). */
  def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"),
        lead(col("o_totalprice"), 1, 0.0).over(w).as("next_price"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"))
      .filter(col("o_custkey") <= 200)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val qWindowLagSql: String = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           LAG(o_totalprice, 1)        OVER w AS prev_price,
           LAG(o_totalprice, 2, -1.0)  OVER w AS prev2_price,
           LEAD(o_totalprice, 1, 0.0)  OVER w AS next_price,
           DATEDIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_orderkey"""

  /** ROWS and RANGE frames + first/last_value + agg-over-window
    * (reference frame rules: AnalyticWindow.java:37-90 — Impala restricts
    * RANGE to UNBOUNDED/CURRENT endpoints; Spark matches those and more).
    * Frame sums are decimal-exact then surfaced as double. */
  def qWindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // l_linenumber alone leaves the frame order ambiguous — the result
    // would then depend on scan order (caught by the 13-partition
    // robustness sweep, r7). The extra keys make the order total: the
    // full tuple is unique, so every frame is deterministic on any
    // partitioning/cluster layout.
    val ord = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber").asc, col("l_partkey").asc,
        col("l_suppkey").asc, col("l_extendedprice").asc,
        col("l_quantity").asc, col("l_discount").asc)
    val dec = col("l_extendedprice").cast("decimal(28,2)")
    li.filter(col("l_orderkey") <= 2000)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        sum(dec).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_sum"),
        sum(dec).over(ord.rowsBetween(-1, 1)).cast("double").as("window3_sum"),
        sum(dec).over(ord.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("double").as("order_total"),
        first(col("l_extendedprice")).over(ord).as("first_price"),
        last(col("l_extendedprice")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("last_price"),
        count(lit(1)).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_n"))
      // running_n completes the OUTPUT key the same way the extra window
      // keys above complete the frame order: (l_orderkey, l_linenumber)
      // alone leaves duplicate pairs order-ambiguous between engines
      // (r11 OrderAudit: 1161 tie groups at sf0.001), but running_n is the
      // 1..n position under the total in-partition order, so
      // (l_orderkey, running_n) is a row key on any layout.
      .orderBy(col("l_orderkey"), col("running_n"))
  }

  /** Analytic functions beyond the reference's set (ntile/percent_rank/
    * cume_dist are absent from BuiltinsDb.java:796-867 — Spark superset),
    * plus IGNORE NULLS variants of first/last_value. */
  def qWindowExtra(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    o.filter(col("o_orderkey") <= 3000)
      .select(
        col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 9).as("pr"),
        round(cume_dist().over(w), 9).as("cd"),
        first(when(col("o_orderpriority") === "1-URGENT", col("o_orderkey")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("first_urgent"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  val qWindowExtraSql: String = """
    SELECT o_orderstatus, o_orderkey, o_totalprice,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pr,
           ROUND(CUME_DIST() OVER w, 9) AS cd,
           FIRST_VALUE(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey END IGNORE NULLS)
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_urgent
    FROM orders
    WHERE o_orderkey <= 3000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_orderstatus, o_orderkey"""

  val qWindowFramesSql: String = """
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
                OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS window3_sum,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
                OVER (w RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS order_total,
           FIRST_VALUE(l_extendedprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
           LAST_VALUE(l_extendedprice)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           COUNT(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM lineitem
    WHERE l_orderkey <= 2000
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC,
                 l_suppkey ASC, l_extendedprice ASC, l_quantity ASC, l_discount ASC)
    ORDER BY l_orderkey, running_n"""
}
