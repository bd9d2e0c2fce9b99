package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS shape battery — the star-schema / reporting / window-over-join
  * query patterns the reference ships as its TPC-DS suite
  * (testdata/workloads/tpcds/queries/tpcds-q{3,19,27,34,42,43,46,47,88,98}.test),
  * re-targeted at the synthetic TPC-H-ish tables. The STRUCTURE is what is
  * ported — multi-dimension star joins with selective dim filters and fact
  * key-range pruning, ROLLUP reporting, count-HAVING-join-back, monthly
  * pivot, window-over-grouped-join with rn±1 self-joins, multi-block scalar
  * count cross-products, ratio-to-report windows — not the TPC-DS data.
  * Role mapping: lineitem=store_sales (fact), orders=date_dim (o_orderdate),
  * part=item, supplier=store, customer(+nation)=customer(+address/demo),
  * events=store_sales×time_dim for the hour-band shapes.
  *
  * All entries are single portable SQL strings shared verbatim with the
  * DuckDB oracle; double-valued aggregates go through the
  * DECIMAL→STRING→DOUBLE surface so accumulation order can't skew the hash,
  * and every ORDER BY is total (unique key suffix) so LIMIT cuts are
  * deterministic in both engines.
  */
object TpcdsShapes {

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql(sql)
  }

  /** TPC-DS Q3 shape: 2-dim star join, dim attribute filters + fact
    * key-range OR pruning (the partition-key filter in the reference),
    * group by year/brand, ORDER BY sum DESC LIMIT. */
  def qDs3Star(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs3StarSql)

  val qDs3StarSql: String = """
    SELECT year(o_orderdate) AS d_year, p_brand AS brand,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS sum_agg
    FROM lineitem, orders, part
    WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
      AND p_size = 30 AND month(o_orderdate) = 12
      AND (l_orderkey BETWEEN 100 AND 3000
        OR l_orderkey BETWEEN 5000 AND 8000
        OR l_orderkey BETWEEN 12000 AND 15000)
    GROUP BY year(o_orderdate), p_brand
    ORDER BY d_year, sum_agg DESC, brand
    LIMIT 100"""

  /** TPC-DS Q19 shape: 6-table star with a cross-dimension inequality
    * (reference: substr(ca_zip,1,5) <> substr(s_zip,1,5) — here the
    * customer's nation digits vs the supplier's). */
  def qDs19Star(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs19StarSql)

  val qDs19StarSql: String = """
    SELECT p_brand AS brand, p_type AS category,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS ext_price
    FROM orders, lineitem, part, customer, nation n1, supplier, nation n2
    WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
      AND p_size BETWEEN 10 AND 15
      AND month(o_orderdate) = 11 AND year(o_orderdate) = 1998
      AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
      AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
      AND substr(n1.n_name, 8, 2) <> substr(n2.n_name, 8, 2)
    GROUP BY p_brand, p_type
    ORDER BY ext_price DESC, brand, category
    LIMIT 100"""

  /** TPC-DS Q27 shape: 4-dim star + IN-list dim filter + ROLLUP reporting
    * over four averaged measures (the reference ships the rollup commented
    * out for Impala's grammar; Spark and DuckDB both speak it). */
  def qDs27Rollup(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs27RollupSql)

  val qDs27RollupSql: String = """
    SELECT p_brand, n_name,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS STRING) AS DOUBLE) / COUNT(*) AS agg1,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) / COUNT(*) AS agg2,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS STRING) AS DOUBLE) / COUNT(*) AS agg3,
           CAST(CAST(SUM(CAST(l_tax AS DECIMAL(28,6))) AS STRING) AS DOUBLE) / COUNT(*) AS agg4
    FROM lineitem, orders, customer, nation, part
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey AND l_partkey = p_partkey
      AND c_mktsegment = 'BUILDING' AND year(o_orderdate) = 1998
      AND n_name IN ('NATION_1','NATION_5','NATION_9','NATION_13','NATION_17','NATION_21')
    GROUP BY ROLLUP (p_brand, n_name)
    ORDER BY p_brand NULLS FIRST, n_name NULLS FIRST
    LIMIT 100"""

  /** TPC-DS Q34 shape: per-ticket count in a derived table, HAVING-style
    * band predicate on the count, join back to customer. */
  def qDs34CountBand(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs34CountBandSql)

  val qDs34CountBandSql: String = """
    SELECT c_name, ticket, cnt
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS custkey, COUNT(*) AS cnt
      FROM lineitem, orders, supplier
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND (month(o_orderdate) BETWEEN 1 AND 3 OR month(o_orderdate) BETWEEN 10 AND 12)
        AND year(o_orderdate) IN (1996, 1997, 1998)
        AND s_acctbal > 0
      GROUP BY l_orderkey, o_custkey
    ) dn, customer
    WHERE custkey = c_custkey AND cnt BETWEEN 5 AND 7
    ORDER BY c_name, ticket
    LIMIT 100"""

  /** TPC-DS Q42/Q52 shape: single-dim reporting — date filter, group by
    * (year, category), ORDER BY sum DESC LIMIT. */
  def qDs42Report(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs42ReportSql)

  val qDs42ReportSql: String = """
    SELECT year(o_orderdate) AS d_year, p_type AS category,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS sum_sales
    FROM orders, lineitem, part
    WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
      AND p_retailprice > 950 AND month(o_orderdate) = 11 AND year(o_orderdate) = 1998
    GROUP BY year(o_orderdate), p_type
    ORDER BY sum_sales DESC, d_year, category
    LIMIT 100"""

  /** TPC-DS Q43 shape: per-store monthly pivot — SUM(CASE WHEN month=k)
    * columns (the reference pivots on d_day_name; month() is the
    * dialect-portable axis — day-name numbering differs across engines). */
  def qDs43Pivot(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs43PivotSql)

  val qDs43PivotSql: String = {
    val buckets = (1 to 6).map { m =>
      s"""           CAST(CAST(SUM(CASE WHEN month(o_orderdate) = $m
         THEN CAST(l_extendedprice AS DECIMAL(28,4)) ELSE CAST(0 AS DECIMAL(28,4)) END)
         AS STRING) AS DOUBLE) AS m${m}_sales"""
    }.mkString(",\n")
    s"""
    SELECT s_name,
$buckets
    FROM lineitem, orders, supplier
    WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND year(o_orderdate) = 1997
    GROUP BY s_name
    ORDER BY s_name
    LIMIT 100"""
  }

  /** TPC-DS Q46 shape: derived per-ticket aggregate carrying a "bought"
    * dimension value, joined back to the customer's own dimension with an
    * inequality (reference: bought_city <> current ca_city). */
  def qDs46City(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs46CitySql)

  val qDs46CitySql: String = """
    SELECT c_name, n1.n_name AS home_nation, bought_nation, ticket, amt, profit
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS custkey, n2.n_name AS bought_nation,
             CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS amt,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS profit
      FROM lineitem, orders, supplier, nation n2
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND s_nationkey = n2.n_nationkey
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(o_orderdate) IN (1999, 2000, 2001)
      GROUP BY l_orderkey, o_custkey, n2.n_name
    ) dn, customer, nation n1
    WHERE custkey = c_custkey AND c_nationkey = n1.n_nationkey
      AND n1.n_name <> bought_nation
    ORDER BY c_name, ticket, bought_nation
    LIMIT 100"""

  /** TPC-DS Q47 shape: grouped join → windowed view (avg-over-partition +
    * rank), then rn±1 self-joins for prior/next period, deviation filter.
    * sum_sales stays DECIMAL through the CTEs; every double surfaces via
    * the STRING cast so both engines hash identical IEEE values. */
  def qDs47Window(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs47WindowSql)

  val qDs47WindowSql: String = """
    WITH v1 AS (
      SELECT p_brand, s_name, year(o_orderdate) AS d_year, month(o_orderdate) AS d_moy,
             SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS sum_sales
      FROM lineitem, orders, part, supplier
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey AND l_suppkey = s_suppkey
        AND (year(o_orderdate) = 1998
          OR (year(o_orderdate) = 1997 AND month(o_orderdate) = 12)
          OR (year(o_orderdate) = 1999 AND month(o_orderdate) = 1))
      GROUP BY p_brand, s_name, year(o_orderdate), month(o_orderdate)
    ),
    v1w AS (
      SELECT p_brand, s_name, d_year, d_moy, sum_sales,
             CAST(CAST(SUM(sum_sales) OVER (PARTITION BY p_brand, s_name, d_year) AS STRING) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand, s_name, d_year) AS avg_monthly_sales,
             RANK() OVER (PARTITION BY p_brand, s_name ORDER BY d_year, d_moy) AS rn
      FROM v1
    ),
    v2 AS (
      SELECT v.p_brand, v.s_name, v.d_year, v.d_moy, v.avg_monthly_sales,
             CAST(CAST(v.sum_sales AS STRING) AS DOUBLE) AS sum_sales,
             CAST(CAST(vl.sum_sales AS STRING) AS DOUBLE) AS psum,
             CAST(CAST(vn.sum_sales AS STRING) AS DOUBLE) AS nsum
      FROM v1w v, v1w vl, v1w vn
      WHERE v.p_brand = vl.p_brand AND v.p_brand = vn.p_brand
        AND v.s_name = vl.s_name AND v.s_name = vn.s_name
        AND v.rn = vl.rn + 1 AND v.rn = vn.rn - 1
    )
    SELECT * FROM v2
    WHERE d_year = 1998 AND avg_monthly_sales > 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY sum_sales - avg_monthly_sales, p_brand, s_name, d_moy
    LIMIT 100"""

  /** TPC-DS Q88 shape: N independent scalar-count star blocks (hour bands
    * over the time dimension) cross-joined into one row. Each block is a
    * 1-row aggregate, so the cross product is bounded by construction. */
  def qDs88MultiCount(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs88MultiCountSql)

  val qDs88MultiCountSql: String = {
    val blocks = (0 until 8).map { i =>
      val h0 = i * 3
      s"""     (SELECT COUNT(*) AS h${h0}_${h0 + 3}
      FROM events, customer
      WHERE user_id = c_custkey
        AND hour(ts) BETWEEN $h0 AND ${h0 + 2}
        AND event_type IN ('click', 'view', 'purchase')
        AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')) s${i + 1}"""
    }.mkString(",\n")
    s"""
    SELECT * FROM
$blocks"""
  }

  /** TPC-DS Q98 shape: ratio-to-report — grouped revenue with a
    * SUM-over-class window in the denominator. */
  def qDs98Ratio(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs98RatioSql)

  val qDs98RatioSql: String = """
    WITH agg AS (
      SELECT p_type, p_brand,
             SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS itemrevenue
      FROM lineitem, part, orders
      WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
        AND month(o_orderdate) IN (5, 6) AND year(o_orderdate) = 1998
      GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand,
           CAST(CAST(itemrevenue AS STRING) AS DOUBLE) AS itemrevenue,
           CAST(CAST(itemrevenue AS STRING) AS DOUBLE) * 100 /
             CAST(CAST(SUM(itemrevenue) OVER (PARTITION BY p_type) AS STRING) AS DOUBLE) AS revenueratio
    FROM agg
    ORDER BY p_type, revenueratio, p_brand"""
}
