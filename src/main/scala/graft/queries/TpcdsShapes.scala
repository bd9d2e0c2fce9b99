package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS shape battery — the star-schema / reporting / window-over-join
  * query patterns the reference ships as its TPC-DS suite
  * (testdata/workloads/tpcds/queries/tpcds-q*.test),
  * re-targeted at the synthetic TPC-H-ish tables. The STRUCTURE is what is
  * ported — multi-dimension star joins with selective dim filters and fact
  * key-range pruning, ROLLUP reporting, count-HAVING-join-back, monthly
  * pivot, window-over-grouped-join with rn±1 self-joins, multi-block scalar
  * count cross-products, ratio-to-report windows — not the TPC-DS data.
  * Role mapping: lineitem=store_sales (fact), orders=date_dim (o_orderdate),
  * part=item, supplier=store, customer(+nation)=customer(+address/demo),
  * events=store_sales×time_dim for the hour-band shapes.
  *
  * Reference file coverage (25 query files, ALL ported): 17 carry
  * structurally distinct plans and are shaped below — q3, q6, q7, q8,
  * q19, q27, q34, q42, q43, q46, q47, q59, q61, q65, q88, q89, q98. The
  * remaining 8 are family variants, ported as parameter deltas on their
  * shaped sibling (see the family-variants section at the bottom):
  *   q52, q55 ≈ q42 (same single-dim report; q55 drops the year column),
  *   q53, q63 ≈ q89 (same window-deviation screen, different dim filter),
  *   q68 ≈ q46 (same bought-vs-home derived join; different measures),
  *   q73 ≈ q34 (same count-band join-back, tighter HAVING band),
  *   q79 ≈ q46/q34 hybrid (per-ticket derived aggregate join-back),
  *   q96 ≈ q88 (one hour-band scalar count instead of eight).
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

  /** TPC-DS Q6 shape: star join filtered by a CORRELATED average
    * subquery (price > 1.005 × category average) plus an uncorrelated
    * scalar subquery, HAVING on the count, ORDER BY cnt LIMIT. The
    * correlated average is exact-decimal-summed then surfaced as one
    * double division, so both engines filter on bit-identical
    * thresholds (never a raw double AVG — accumulation order would make
    * the >-boundary engine-dependent). */
  def qDs6CorrAvg(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs6CorrAvgSql)

  val qDs6CorrAvgSql: String = """
    SELECT * FROM (
      SELECT n_name AS state, COUNT(*) AS cnt
      FROM customer c, orders o, lineitem l, part p, nation n
      WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
        AND l.l_partkey = p.p_partkey AND c.c_nationkey = n.n_nationkey
        AND year(o_orderdate) =
              (SELECT DISTINCT year(o_orderdate) FROM orders WHERE year(o_orderdate) = 1997)
        AND p.p_retailprice > 1.005 *
              (SELECT CAST(CAST(SUM(CAST(j.p_retailprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE)
                        / COUNT(*)
               FROM part j WHERE j.p_type = p.p_type)
      GROUP BY n_name
      HAVING COUNT(*) >= 10
      ORDER BY cnt, state
      LIMIT 100) t"""

  /** TPC-DS Q59 shape: period-over-period comparison — a pivoted CTE
    * (per-period per-store bucket sums) self-joined across two years,
    * emitting bucket ratios. Ratios divide two string-routed doubles, so
    * NULL buckets propagate and the quotients are engine-identical. */
  def qDs59Weekly(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs59WeeklySql)

  val qDs59WeeklySql: String = """
    WITH mss AS (
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS moy, l_suppkey,
             SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(28,4)) END) AS f_sales,
             SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(28,4)) END) AS o_sales,
             SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(l_extendedprice AS DECIMAL(28,4)) END) AS p_sales
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
      GROUP BY year(o_orderdate), month(o_orderdate), l_suppkey)
    SELECT y1.l_suppkey AS supp, y1.moy AS moy,
           CAST(CAST(y1.f_sales AS STRING) AS DOUBLE) / CAST(CAST(y2.f_sales AS STRING) AS DOUBLE) AS f_ratio,
           CAST(CAST(y1.o_sales AS STRING) AS DOUBLE) / CAST(CAST(y2.o_sales AS STRING) AS DOUBLE) AS o_ratio,
           CAST(CAST(y1.p_sales AS STRING) AS DOUBLE) / CAST(CAST(y2.p_sales AS STRING) AS DOUBLE) AS p_ratio
    FROM mss y1 JOIN mss y2
      ON y1.l_suppkey = y2.l_suppkey AND y1.moy = y2.moy
    WHERE y1.yr = 1998 AND y2.yr = 1997
    ORDER BY supp, moy
    LIMIT 100"""

  /** TPC-DS Q65 shape: two-level aggregate — per-(store,item) revenue,
    * per-store average of those revenues, then the low sellers
    * (revenue ≤ 0.1 × store average) joined back to both dimensions.
    * Both comparison sides are string-routed doubles from exact decimal
    * sums, so the ≤-boundary is engine-identical. */
  def qDs65MinAvg(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs65MinAvgSql)

  val qDs65MinAvgSql: String = """
    WITH sa AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS revenue
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND year(o_orderdate) = 1998
      GROUP BY l_suppkey, l_partkey),
    sb AS (
      SELECT l_suppkey,
             CAST(CAST(SUM(revenue) AS STRING) AS DOUBLE) / COUNT(*) AS ave
      FROM sa GROUP BY l_suppkey)
    SELECT s_name, p_name,
           CAST(CAST(sa.revenue AS STRING) AS DOUBLE) AS revenue,
           sb.ave
    FROM supplier, part, sa, sb
    WHERE sa.l_suppkey = sb.l_suppkey
      AND sa.l_suppkey = s_suppkey AND sa.l_partkey = p_partkey
      AND CAST(CAST(sa.revenue AS STRING) AS DOUBLE) <= 0.1 * sb.ave
    -- revenue/ave tiebreakers: p_name collides across partkeys in the
    -- synthetic corpus, so (s_name, p_name) alone is not a key — two
    -- low-seller rows for the same (supplier, part name) ordered
    -- engine-arbitrarily flipped the order-sensitive hash (caught by the
    -- r11 order-sensitive check.py; the driver had passed it by luck)
    ORDER BY s_name, p_name, revenue, ave
    LIMIT 100"""

  /** TPC-DS Q89 shape: window deviation screen — grouped star join with
    * an OR-of-IN-pairs dimension filter, month sales vs the
    * avg-over-(brand,store) window, keep rows deviating >10%, ORDER BY
    * the deviation. Same exact-sum / window-count discipline as Q47. */
  def qDs89WindowDev(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs89WindowDevSql)

  val qDs89WindowDevSql: String = """
    SELECT * FROM (
      SELECT p_type, p_brand, s_name, d_moy,
             CAST(CAST(sum_sales_dec AS STRING) AS DOUBLE) AS sum_sales,
             CAST(CAST(SUM(sum_sales_dec) OVER (PARTITION BY p_brand, s_name) AS STRING) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand, s_name) AS avg_monthly_sales
      FROM (
        SELECT p_type, p_brand, s_name, month(o_orderdate) AS d_moy,
               SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS sum_sales_dec
        FROM part, lineitem, orders, supplier
        WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND year(o_orderdate) = 1998
          AND ((p_type IN ('ECONOMY', 'LARGE') AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
            OR (p_type IN ('PROMO', 'STANDARD') AND p_brand IN ('Brand#4', 'Brand#5', 'Brand#6')))
        GROUP BY p_type, p_brand, s_name, month(o_orderdate)) tmp1) tmp2
    WHERE CASE WHEN avg_monthly_sales <> 0
               THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY sum_sales - avg_monthly_sales, s_name, p_type, p_brand, d_moy
    LIMIT 100"""

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

  /** TPC-DS Q7 shape (tpcds-q7.test): 4-dimension star — date, item,
    * customer DEMOGRAPHICS (two equality filters play cd_gender /
    * cd_marital_status) and a PROMOTION dim with an OR-of-attributes
    * filter (p_channel_email='N' OR p_channel_event='N' → the supplier
    * OR below) — plus the fact partition-key range filter, four averaged
    * measures, GROUP/ORDER BY the item id. Distinct from the Q27 shape:
    * plain GROUP BY (no ROLLUP) and the OR-filtered fourth dimension. */
  def qDs7DemoStar(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs7DemoStarSql)

  val qDs7DemoStarSql: String = """
    SELECT p_name AS item_id,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS STRING) AS DOUBLE) / COUNT(*) AS agg1,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) / COUNT(*) AS agg2,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS STRING) AS DOUBLE) / COUNT(*) AS agg3,
           CAST(CAST(SUM(CAST(l_tax AS DECIMAL(28,6))) AS STRING) AS DOUBLE) / COUNT(*) AS agg4
    FROM lineitem, orders, customer, part, supplier
    WHERE l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND c_mktsegment = 'BUILDING'
      AND c_acctbal > 0
      AND (s_acctbal < 5000 OR s_nationkey < 13)
      AND year(o_orderdate) = 1998
      AND l_orderkey BETWEEN 1000 AND 12000
    GROUP BY p_name
    ORDER BY item_id
    LIMIT 100"""

  /** TPC-DS Q8 shape (tpcds-q8.test): the store dimension is filtered by
    * a zip-prefix semi-join between TWO derived zip sets — zips whose
    * preferred-customer count clears a HAVING bar, intersected with a
    * literal zip IN-list — and the surviving zips reach the store on a
    * SHORTER prefix (reference: substr(s_zip,1,2) = substr(ca_zip,1,2)).
    * Nation-name digits play the zip; the semi-join is spelled IN
    * (portable to the oracle — the reference's LEFT SEMI JOIN is the
    * same plan). */
  def qDs8ZipSemi(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs8ZipSemiSql)

  val qDs8ZipSemiSql: String = """
    SELECT s_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS net_sales
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN (
      SELECT a.zip FROM (
        SELECT substr(n_name, 8, 2) AS zip, COUNT(*) AS cnt
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY substr(n_name, 8, 2)
        HAVING COUNT(*) > 3
      ) a
      WHERE a.zip IN (
        SELECT substr(n_name, 8, 2) FROM nation
        WHERE substr(n_name, 8, 2) IN
          ('1','3','5','7','9','11','13','15','17','19','21','23'))
    ) v1 ON substr(sn.n_name, 8, 1) = substr(v1.zip, 1, 1)
    JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1998 AND month(o_orderdate) BETWEEN 1 AND 3
    GROUP BY s_name
    ORDER BY s_name
    LIMIT 100"""

  /** TPC-DS Q61 shape (tpcds-q61.test): promo-to-total ratio of two
    * SINGLE-ROW aggregate blocks over the same 6-table star (customer
    * address gmt → customer nation region, store gmt → supplier nation
    * region, item category → p_type), the promotional block adding the
    * channel-OR filter (order priority here). The blocks cross-join —
    * 1×1 rows by construction — and the ratio divides two string-routed
    * doubles so the quotient is engine-identical. */
  def qDs61PromoRatio(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs61PromoRatioSql)

  val qDs61PromoRatioSql: String = """
    SELECT promotions, total,
           promotions / total * 100 AS promo_pct
    FROM (
      SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS promotions
      FROM lineitem, orders, customer, nation cn, supplier, nation sn, part
      WHERE l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND l_partkey = p_partkey
        AND cn.n_regionkey = 2
        AND sn.n_regionkey = 2
        AND p_type = 'ECONOMY'
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(o_orderdate) = 2000
    ) promotional_sales, (
      SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS total
      FROM lineitem, orders, customer, nation cn, supplier, nation sn, part
      WHERE l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
        AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        AND l_partkey = p_partkey
        AND cn.n_regionkey = 2
        AND sn.n_regionkey = 2
        AND p_type = 'ECONOMY'
        AND year(o_orderdate) = 2000
    ) all_sales
    ORDER BY promotions, total"""


  // ------------------------------------------------------------------
  // Family variants — the remaining 8 reference TPC-DS files. Each is a
  // parameter delta on a shaped sibling (see the header mapping); they
  // are ported file-for-file so every reference tpcds-q*.test has an
  // oracled counterpart, but add no new plan structure by design.
  // ------------------------------------------------------------------

  /** TPC-DS Q52 (≈ Q42 / tpcds-q52.test): 2-dim brand report — single
    * equality dim filter + month/year + fact key range, group by
    * (year, brand), ORDER BY ext_price DESC. */
  def qDs52BrandReport(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs52BrandReportSql)

  val qDs52BrandReportSql: String = """
    SELECT year(o_orderdate) AS d_year, p_brand AS brand_id,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS ext_price
    FROM orders, lineitem, part
    WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
      AND p_type = 'ECONOMY' AND month(o_orderdate) = 12 AND year(o_orderdate) = 1998
      AND l_orderkey BETWEEN 100 AND 1400
    GROUP BY year(o_orderdate), p_brand
    ORDER BY d_year, ext_price DESC, brand_id
    LIMIT 100"""

  /** TPC-DS Q55 (≈ Q42 / tpcds-q55.test): Q52 minus the year output
    * column, different manager/period constants. */
  def qDs55BrandOnly(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs55BrandOnlySql)

  val qDs55BrandOnlySql: String = """
    SELECT p_brand AS brand_id,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS ext_price
    FROM orders, lineitem, part
    WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
      AND p_size = 25 AND month(o_orderdate) = 12 AND year(o_orderdate) = 2000
    GROUP BY p_brand
    ORDER BY ext_price DESC, brand_id
    LIMIT 100"""

  /** TPC-DS Q53 (≈ Q89 / tpcds-q53.test): the reference ships this with
    * the quarterly window COMMENTED OUT (Impala grammar), leaving a plain
    * grouped star over (manufact, quarter) with the OR-of-IN-pairs dim
    * filter — ported as such, with the quarter key in the output so the
    * ORDER BY is total. */
  def qDs53Quarterly(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs53QuarterlySql)

  val qDs53QuarterlySql: String = """
    SELECT p_brand, qoy, sum_sales FROM (
      SELECT p_brand, quarter(o_orderdate) AS qoy,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS sum_sales
      FROM part, lineitem, orders, supplier
      WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND year(o_orderdate) = 1998
        AND ((p_type IN ('ECONOMY', 'LARGE') AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
          OR (p_type IN ('PROMO', 'STANDARD') AND p_brand IN ('Brand#4', 'Brand#5', 'Brand#6')))
      GROUP BY p_brand, quarter(o_orderdate)) tmp1
    ORDER BY sum_sales, p_brand, qoy
    LIMIT 100"""

  /** TPC-DS Q63 (≈ Q89 / tpcds-q63.test): same window-deviation screen
    * with a SINGLE partition key (manager → p_type) and monthly buckets;
    * ordered by the window average like the reference. */
  def qDs63MgrDev(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs63MgrDevSql)

  val qDs63MgrDevSql: String = """
    SELECT * FROM (
      SELECT p_type, d_moy,
             CAST(CAST(sum_sales_dec AS STRING) AS DOUBLE) AS sum_sales,
             CAST(CAST(SUM(sum_sales_dec) OVER (PARTITION BY p_type) AS STRING) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_type) AS avg_monthly_sales
      FROM (
        SELECT p_type, month(o_orderdate) AS d_moy,
               SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS sum_sales_dec
        FROM part, lineitem, orders, supplier
        WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND year(o_orderdate) = 1998
          AND ((p_type IN ('ECONOMY', 'LARGE') AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
            OR (p_type IN ('PROMO', 'STANDARD') AND p_brand IN ('Brand#4', 'Brand#5', 'Brand#6')))
        GROUP BY p_type, month(o_orderdate)) t) tmp
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.05
    ORDER BY p_type, avg_monthly_sales, sum_sales, d_moy
    LIMIT 100"""

  /** TPC-DS Q68 (≈ Q46 / tpcds-q68.test): the bought-vs-home derived
    * join with THREE summed measures (price, tax, list price) instead of
    * Q46's two. */
  def qDs68CityPair(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs68CityPairSql)

  val qDs68CityPairSql: String = """
    SELECT c_name, n1.n_name AS home_nation, bought_nation, ticket,
           extended_price, extended_tax, list_price
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS custkey, n2.n_name AS bought_nation,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS extended_price,
             CAST(CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS extended_tax,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS list_price
      FROM lineitem, orders, supplier, nation n2
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND s_nationkey = n2.n_nationkey
        AND o_orderpriority IN ('3-MEDIUM', '5-LOW')
        AND year(o_orderdate) IN (1996, 1997)
      GROUP BY l_orderkey, o_custkey, n2.n_name
    ) dn, customer, nation n1
    WHERE custkey = c_custkey AND c_nationkey = n1.n_nationkey
      AND n1.n_name <> bought_nation
    ORDER BY c_name, ticket, bought_nation
    LIMIT 100"""

  /** TPC-DS Q73 (≈ Q34 / tpcds-q73.test): count-band join-back with a
    * TIGHTER band (1..5), an OR-equality dim filter and the reference's
    * CASE-ratio guard predicate. */
  def qDs73CountBand(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs73CountBandSql)

  val qDs73CountBandSql: String = """
    SELECT c_name, ticket, cnt
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS custkey, COUNT(*) AS cnt
      FROM lineitem, orders, supplier
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND (s_nationkey = 7 OR s_acctbal > 3000)
        AND CASE WHEN s_nationkey > 0 THEN s_acctbal / s_nationkey ELSE NULL END > 100
        AND year(o_orderdate) = 1998 AND month(o_orderdate) BETWEEN 1 AND 3
      GROUP BY l_orderkey, o_custkey
    ) dj, customer
    WHERE custkey = c_custkey AND cnt BETWEEN 1 AND 5
    ORDER BY cnt DESC, c_name, ticket
    LIMIT 100"""

  /** TPC-DS Q79 (≈ Q46/Q34 hybrid / tpcds-q79.test): per-ticket derived
    * aggregate carrying the STORE dimension value, an OR dim filter plus
    * a store attribute band, joined back to customer. */
  def qDs79TicketProfit(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs79TicketProfitSql)

  val qDs79TicketProfitSql: String = """
    SELECT c_name, supp_name, ticket, amt, profit
    FROM (
      SELECT l_orderkey AS ticket, o_custkey AS custkey, s_name AS supp_name,
             CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS amt,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS profit
      FROM lineitem, orders, supplier
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND (s_nationkey = 8 OR s_acctbal > 0)
        AND s_suppkey BETWEEN 2 AND 7
        AND year(o_orderdate) = 1999 AND month(o_orderdate) BETWEEN 1 AND 3
      GROUP BY l_orderkey, o_custkey, s_name
    ) ms, customer
    WHERE custkey = c_custkey
    ORDER BY c_name, ticket, supp_name
    LIMIT 100"""

  /** TPC-DS Q96 (≈ Q88 / tpcds-q96.test): ONE hour-band scalar count
    * instead of Q88's eight cross-joined blocks. */
  def qDs96HourCount(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qDs96HourCountSql)

  val qDs96HourCountSql: String = """
    SELECT COUNT(*) AS total
    FROM events, customer
    WHERE user_id = c_custkey
      AND hour(ts) = 8 AND minute(ts) >= 30
      AND c_mktsegment = 'BUILDING'"""
}
