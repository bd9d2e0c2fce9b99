package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Parity._

/** Set operations, VALUES, CTEs and correlated subqueries — the
  * reference's UnionNode (be/src/exec/union-node.cc; planned
  * fe/.../analysis/UnionStmt.java) and StmtRewriter subquery → join
  * rewrites (fe/.../analysis/StmtRewriter.java:110-236), both of which
  * Catalyst plans natively (Union / RewritePredicateSubquery).
  */
object SetOps {

  /** UNION ALL + UNION DISTINCT over heterogeneous SELECTs.
    * (UNION DISTINCT = UnionNode + dedup agg on top in the reference,
    * planned in SingleNodePlanner — Spark: Union + HashAggregate.) */
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    // UNION DISTINCT of the two nation-key populations, tagged...
    val c = customer.select(col("c_nationkey").as("nationkey")).distinct()
      .withColumn("who", lit("customer"))
    val s = supplier.select(col("s_nationkey").as("nationkey")).distinct()
      .withColumn("who", lit("supplier"))
    // ...then UNION ALL with a VALUES-style literal relation.
    val extra = spark.range(1).select(lit(-1).cast("int").as("nationkey"), lit("sentinel").as("who"))
    c.union(s).union(extra)
      .groupBy(col("who"))
      .agg(count(lit(1)).as("n_keys"), min(col("nationkey")).as("min_key"), max(col("nationkey")).as("max_key"))
      .orderBy(col("who"))
  }

  val qUnionSql: String = """
    WITH u AS (
      SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS who FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS who FROM supplier
      UNION ALL
      SELECT * FROM (VALUES (-1, 'sentinel')) v(nationkey, who))
    SELECT who, COUNT(*) AS n_keys, MIN(nationkey) AS min_key, MAX(nationkey) AS max_key
    FROM u GROUP BY who ORDER BY who"""

  /** WITH CTE + correlated EXISTS + scalar subquery, through the SQL
    * surface (reference grammar: sql-parser.y:336,1476-1494; rewrite
    * StmtRewriter.java:110-236). */
  def qCteExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql(qCteExistsSql)
  }

  val qCteExistsSql: String = """
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) / COUNT(*) * 1.5
                            FROM orders)
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_big,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_big
    FROM customer JOIN big_orders ON c_custkey = o_custkey
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** VALUES / SELECT-without-FROM constant relation (reference:
    * UnionNode over const exprs, SingleNodePlanner.java:482-496). */
  def qValues(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql("""
      SELECT v.code, v.label, COUNT(o_orderkey) AS n
      FROM VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending'), ('X', 'none') AS v(code, label)
      LEFT JOIN orders ON o_orderstatus = v.code
      GROUP BY v.code, v.label
      ORDER BY v.code""")
  }

  val qValuesSql: String = """
    SELECT v.code, v.label, COUNT(o_orderkey) AS n
    FROM (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending'), ('X', 'none')) v(code, label)
    LEFT JOIN orders ON o_orderstatus = v.code
    GROUP BY v.code, v.label
    ORDER BY v.code"""
}
