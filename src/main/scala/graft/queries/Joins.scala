package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Parity._

/** Join operator catalog — covers the reference's 10 join types
  * (fe/.../analysis/JoinOperator.java:20-33; exec
  * be/src/exec/partitioned-hash-join-node.cc:39-56) re-expressed as
  * declarative Spark joins so Catalyst/AQE pick broadcast-vs-shuffle
  * (reference cost model: fe/.../planner/DistributedPlanner.java:284-309).
  *
  * Scale posture: dimension sides (region/nation/customer/supplier) are
  * explicitly `broadcast()` — at 100 TB the fact tables (orders/lineitem)
  * shuffle only when joining each other, and AQE's skew-join splits any
  * hot keys. No crossJoin touches a fact table.
  */
object Joins {

  /** TPC-H Q3 shape: 3-table inner join → agg → deterministic TopN.
    * (TopN = TakeOrderedAndProject; reference: be/src/exec/topn-node.h:38-90.)
    * Tie-broken by unique l_orderkey so LIMIT is hash-stable vs the oracle.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val cutoff = lit("1998-06-01").cast("timestamp_ntz")
    lineitem
      .filter(col("l_shipdate") > cutoff)
      .join(orders.filter(col("o_orderdate") < cutoff), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3JoinSql: String = s"""
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
           ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10"""

  /** TPC-H Q5 shape: 6-table join (two fact tables + 4 broadcast dims). */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val q5MultiJoinSql: String = s"""
    SELECT r_name, n_name,
           ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY revenue DESC, n_name ASC"""

  /** LEFT SEMI join (reference JoinOperator LEFT_SEMI_JOIN — the plan shape
    * IN/EXISTS subqueries rewrite to, StmtRewriter.java:110-236). */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer
      .join(orders.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000.0),
        customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val qJoinSemiSql: String = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT' AND o_totalprice > 300000.0)
    ORDER BY c_custkey"""

  /** LEFT ANTI join (reference JoinOperator LEFT_ANTI_JOIN / NOT EXISTS). */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    customer
      .join(orders.filter(col("o_totalprice") > 250000.0),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_quiet_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val qJoinAntiSql: String = s"""
    SELECT c_mktsegment, COUNT(*) AS n_quiet_customers, ${dsumSql("c_acctbal")} AS sum_bal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** NULL_AWARE_LEFT_ANTI (reference JoinOperator.java:20-33 — the `NOT IN
    * (subquery)` shape). Expressed through the SQL surface so Catalyst's
    * RewritePredicateSubquery plans the null-aware anti join; NULLIF makes
    * the subquery column nullable, forcing the null-aware variant. */
  def qNullAwareAnti(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql("""
      SELECT p_brand, COUNT(*) AS n_parts, CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
      FROM part
      WHERE p_partkey NOT IN (SELECT NULLIF(l_partkey, -1) FROM lineitem
                              WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
      GROUP BY p_brand
      ORDER BY p_brand""")
  }

  val qNullAwareAntiSql: String = """
    SELECT p_brand, COUNT(*) AS n_parts, CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
    FROM part
    WHERE p_partkey NOT IN (SELECT NULLIF(l_partkey, -1) FROM lineitem
                            WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
    GROUP BY p_brand
    ORDER BY p_brand"""

  /** FULL OUTER join between two derived sides with genuinely disjoint key
    * sets in both directions (reference: FULL_OUTER_JOIN). Left side: per-
    * order revenue of 'R'-flag lineitems; right side: open orders. */
  def qJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val rev = lineitem.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice"), 2).as("returned_rev"))
    val open = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"))
    rev.join(open, rev("l_orderkey") === open("o_orderkey"), "full_outer")
      .select(
        when(col("l_orderkey").isNull, lit("right_only"))
          .when(col("o_orderkey").isNull, lit("left_only"))
          .otherwise(lit("both")).as("side"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("side"))
  }

  val qJoinOuterSql: String = """
    WITH rev AS (
      SELECT l_orderkey, CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS returned_rev
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
    open_o AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O')
    SELECT CASE WHEN l_orderkey IS NULL THEN 'right_only'
                WHEN o_orderkey IS NULL THEN 'left_only'
                ELSE 'both' END AS side,
           COUNT(*) AS n
    FROM rev FULL OUTER JOIN open_o ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1"""

  /** RIGHT OUTER join (reference: RIGHT_OUTER_JOIN). Lineitem → orders keeps
    * the 257 lineitem-less orders as null rows. */
  def qJoinRight(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"), "right_outer")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_matched"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .orderBy(col("o_orderstatus"))
  }

  val qJoinRightSql: String = """
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(l_orderkey) AS n_matched,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
    FROM lineitem RIGHT OUTER JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""

  /** CROSS join (reference: CrossJoinNode, be/src/exec/cross-join-node.cc)
    * — dimension × dimension only; a fact-table cross join would be a
    * scale bug, so none exists in this catalog. */
  def qJoinCross(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    region.crossJoin(nation)
      .select(col("r_name"), col("n_name"),
        (col("r_regionkey") * lit(100) + col("n_nationkey")).as("pair_code"),
        (col("n_regionkey") === col("r_regionkey")).as("is_home"))
      .orderBy(col("pair_code"))
  }

  val qJoinCrossSql: String = """
    SELECT r_name, n_name,
           r_regionkey * 100 + n_nationkey AS pair_code,
           n_regionkey = r_regionkey AS is_home
    FROM region CROSS JOIN nation
    ORDER BY pair_code"""

  /** Salted join over a pathologically skewed key (l_returnflag: 3 distinct
    * values over the whole fact table — every row lands in one of 3 shuffle
    * partitions unsalted). [[graft.operators.SaltedJoin]] spreads each hot
    * key over 16 salt buckets; the oracle is the PLAIN join (salting must
    * not change the result). At toy scale the dim is broadcastable anyway;
    * SaltedJoinSpec pins the shuffle-only plan this entry exists for. */
  def qJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    val dim = Seq(("A", "accepted"), ("N", "new"), ("R", "returned"))
      .toDF("flag", "label")
    graft.operators.SaltedJoin.join(li, dim, "l_returnflag", "flag", salts = 16)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("label"))
  }

  val qJoinSaltedSql: String = s"""
    WITH dim AS (SELECT * FROM (VALUES ('A','accepted'), ('N','new'), ('R','returned')) AS t(flag, label))
    SELECT label, COUNT(*) AS n, ${Parity.dsumSql("l_quantity")} AS sum_qty
    FROM lineitem JOIN dim ON l_returnflag = flag
    GROUP BY label
    ORDER BY label"""

  /** Fact×fact×fact self-join feeding a two-phase count(DISTINCT) — the
    * reference's spill/race stress shape (targeted-stress/queries/
    * agg_stress.test:1-22), the one join family the catalog's star shapes
    * never exercise: NO side is a broadcastable dimension. Scale posture
    * (pinned in PlannerFamilySpec): both joins sort-merge; the orderkey
    * join shuffles its two filtered legs once each, and the 3-key join
    * re-clusters both inputs on the FULL (orderkey, price, shipdate) set —
    * Spark's all-cluster-keys co-partition rule, which bounds per-key skew
    * that orderkey-subset reuse would concentrate. The DISTINCT dedups
    * map-side before its own shuffle, and the tax filters push into the
    * two filtered scans with the unfiltered leg pruned to 3 columns. */
  def qStressSelfJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"), col("l_tax"))
    li.filter(col("l_tax") < 0.05).as("l1")
      .join(li.filter(col("l_tax") < 0.05).as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey"))
      .join(li.as("l3"),
        col("l1.l_orderkey") === col("l3.l_orderkey") &&
          col("l1.l_extendedprice") === col("l3.l_extendedprice") &&
          col("l1.l_shipdate") === col("l3.l_shipdate"))
      .agg(countDistinct(col("l2.l_extendedprice")).as("u"))
  }

  val qStressSelfJoinSql: String = """
    SELECT count(DISTINCT l2.l_extendedprice) AS u
    FROM lineitem l1, lineitem l2, lineitem l3
    WHERE l1.l_tax < 0.05 AND l2.l_tax < 0.05
      AND l1.l_orderkey = l2.l_orderkey
      AND l1.l_orderkey = l3.l_orderkey
      AND l1.l_extendedprice = l3.l_extendedprice
      AND l1.l_shipdate = l3.l_shipdate"""
}
