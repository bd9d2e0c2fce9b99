package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Parity._

/** Second TPC-H shape battery (adapted to the synthetic schema) + the
  * set-op / grouping supersets Spark adds over the reference:
  * Q7 nation-pair volume, Q8 market share, Q9 profit breakdown, Q12
  * priority distribution, Q16 supplier-count distinct, Q17 avg-qty scalar
  * subquery, Q19 OR-of-ANDs predicates, Q22 ratio-to-global; plus
  * GROUPING SETS/ROLLUP and INTERSECT/EXCEPT (absent in the reference
  * grammar — sql-parser.y has no rule — but table stakes for a Spark
  * engine, so shipped and oracle-checked as supersets).
  */
object TpchShapes2 {

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql(sql)
  }

  /** Q7 shape: shipping volume between nation pairs (two nation roles). */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q7NationVolumeSql)

  val q7NationVolumeSql: String = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year"""

  /** Q8 shape: a nation's market share inside its region per year. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q8MarketShareSql)

  val q8MarketShareSql: String = """
    WITH all_orders AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1.0 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00')
    SELECT o_year,
           CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0.0 END AS DECIMAL(28,4))) AS STRING) AS DOUBLE)
             / CAST(CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n
    FROM all_orders
    GROUP BY o_year
    ORDER BY o_year"""

  /** Q9 shape: profit (revenue minus synthetic supply cost) by nation/year. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q9ProfitSql)

  val q9ProfitSql: String = """
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS STRING) AS DOUBLE)
             - CAST(CAST(SUM(CAST(p_retailprice * l_quantity AS DECIMAL(28,3)) * CAST(0.6 AS DECIMAL(3,1))) AS STRING) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year"""

  /** Q12 shape: order-priority distribution over a ship-date window
    * (original buckets ship modes; the synthetic schema buckets priority). */
  def q12Priority(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q12PrioritySql)

  val q12PrioritySql: String = """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
           CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_linenumber = 1
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** Q2 shape: minimum-cost supplier — CORRELATED scalar subquery
    * (`= (SELECT MIN(…) …)` correlated on the outer part + region filter),
    * the decorrelation plan the reference exercises in tpch-q2.test
    * (testdata/workloads/tpch/queries/tpch-q2.test; rewrite logic in
    * fe/.../analysis/StmtRewriter.java). No partsupp table in the
    * synthetic schema, so lineitem plays the part-supplier offer relation
    * with l_extendedprice as the cost; plan shape (correlated scalar-agg
    * decorrelated into an aggregated self-join) is identical. Catalyst
    * plans the subquery as a partial-agg + join on (l_partkey) — no
    * per-row re-execution, safe at any scale; DISTINCT + total ORDER BY
    * keeps the LIMIT cut deterministic for the oracle hash. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q2MinCostSupplierSql)

  val q2MinCostSupplierSql: String = """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND p_size <= 5
      AND p_type LIKE '%O%'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE p_partkey = l2.l_partkey
          AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  /** Q11 shape: important stock — UNCORRELATED scalar subquery under
    * HAVING (`HAVING SUM(…) > (SELECT SUM(…) * fraction)`), the other
    * scalar-subquery plan from the reference's corpus (tpch-q11.test).
    * The global threshold plans as a one-row subquery broadcast into the
    * aggregate filter — the group-by side shuffles once on l_partkey and
    * the scalar side reuses the same scan shape. Sums stay in exact
    * decimal space on BOTH sides of the `>` (the ×1000 cross-multiply
    * avoids any double fraction), so the boundary decision can't diverge
    * between Spark and DuckDB. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q11ImportantStockSql)

  val q11ImportantStockSql: String = """
    SELECT l_partkey,
           CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DECIMAL(28,4))
             * CAST(1000 AS DECIMAL(4,0)) >
           (SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DECIMAL(28,4))
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7')
    ORDER BY value DESC, l_partkey"""

  /** Q16 shape: distinct supplier count per part attribute combo. */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q16SupplierCountSql)

  val q16SupplierCountSql: String = """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q17 shape: small-quantity revenue vs per-part average (correlated
    * scalar subquery → aggregated join under Catalyst). */
  def q17AvgQty(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q17AvgQtySql)

  val q17AvgQtySql: String = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * (CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"""

  /** Q19 shape: OR-of-ANDs multi-attribute predicate pushdown. */
  def q19OrPredicates(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q19OrPredicatesSql)

  val q19OrPredicatesSql: String = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)"""

  /** Q22 shape: per-group acctbal stats vs the global positive average. */
  def q22Ratio(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q22RatioSql)

  val q22RatioSql: String = """
    SELECT c_nationkey % 5 AS cntry_bucket,
           COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    GROUP BY c_nationkey % 5
    ORDER BY cntry_bucket"""

  /** Q15 shape: top supplier(s) by revenue vs the global max (view + scalar
    * subquery over an aggregate). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q15TopSupplierSql)

  val q15TopSupplierSql: String = """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey"""

  /** Q20 shape: suppliers whose shipped quantity of a part family exceeds a
    * per-(supplier, part) threshold (nested IN over an aggregated subquery). */
  def q20PartSuppliers(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q20PartSuppliersSql)

  val q20PartSuppliersSql: String = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,2))) > 50)
    ORDER BY s_suppkey"""

  /** Q21 shape: suppliers with returned lines on multi-line orders where a
    * DIFFERENT supplier also shipped (correlated EXISTS + NOT EXISTS pair). */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, q21WaitingSupplierSql)

  val q21WaitingSupplierSql: String = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name"""

  /** GROUPING SETS + ROLLUP (superset: absent from the reference grammar). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qGroupingSetsSql)

  val qGroupingSetsSql: String = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_qty,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""

  /** INTERSECT / EXCEPT (superset: absent from the reference grammar). */
  def qIntersectExcept(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qIntersectExceptSql)

  val qIntersectExceptSql: String = """
    WITH both_nations AS (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier),
    cust_only AS (
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier)
    SELECT 'both' AS side, COUNT(*) AS n FROM both_nations
    UNION ALL
    SELECT 'cust_only' AS side, COUNT(*) AS n FROM cust_only
    ORDER BY side"""

  /** JSON scalar functions over the events props column (superset: the
    * reference parses JSON at scan only, no scalar JSON functions). */
  def qFnJson(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql("""
      SELECT event_id,
             get_json_object(props, '$.k') AS k_str,
             CAST(get_json_object(props, '$.k') AS INT) AS k_int,
             from_json(props, 'k INT').k AS k_struct,
             get_json_object(props, '$.missing') AS k_missing,
             to_json(named_struct('id', event_id, 'k', CAST(get_json_object(props, '$.k') AS INT))) AS rebuilt
      FROM events
      WHERE event_id <= 500
      ORDER BY event_id""")
  }

  val qFnJsonSql: String = """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
           json_extract_string(props, '$.missing') AS k_missing,
           concat('{"id":', event_id, ',"k":', json_extract_string(props, '$.k'), '}') AS rebuilt
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id"""
}
