package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Parity.dsum

/** Round-3 catalog promotions: components that were unit-test-only get
  * driver-checked CORRECTNESS entries (madlib vector functions, the
  * DataSource V2 external scan, CHAR(n) padding, UTC timezone conversion,
  * right-semi join shape).
  */
object Extras {

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql(sql)
  }

  /** madlib vector surface (reference: udf-builtins.h:558 madlib interop)
    * + the codegen'd dot_product kernel, over the embeddings table.
    * Numeric outputs only — float→string encoding is format-sensitive
    * across oracle builds and stays in DialectSpec. */
  def qMadlibVector(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    emb.filter(col("vec_id") <= 200)
      .select(
        col("vec_id"),
        call_function("madlib_vector_get", lit(0), col("embedding")).as("e0"),
        call_function("madlib_vector_get", lit(7), col("embedding")).as("e7"),
        call_function("dot_product", col("embedding"), col("embedding")).as("dp"),
        sqrt(call_function("dot_product", col("embedding"), col("embedding"))).as("nrm"))
      .orderBy(col("vec_id"))
  }

  val qMadlibVectorSql: String = """
    SELECT vec_id,
           embedding[1] AS e0,
           embedding[8] AS e7,
           list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS dp,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
    WHERE vec_id <= 200
    ORDER BY vec_id"""

  /** Materialize a table bucketed+sorted on `key` once per sf dir (a
    * fixture like the JSON/CSV scan fixtures — the timed query reads it,
    * it is not part of the measured work). Handles the stale-warehouse-dir
    * case: an in-memory catalog forgets tables across JVMs while the
    * managed dir survives, which would otherwise fail the re-create. */
  private def ensureBucketed(spark: SparkSession, dir: String, name: String,
      key: String, buckets: Int = 8): String = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val tbl = s"${name}_bkt_$tag"
    if (!spark.catalog.tableExists(tbl)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      // One file per bucket (repartition on the bucket key first): with
      // multiple files per bucket Spark cannot trust the per-file sort
      // order and re-sorts both sides; with one it elides the sorts too.
      Tables.load(spark, dir, name)
        .repartition(buckets, col(key))
        .write.bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(tbl)
    }
    tbl
  }

  /** Pre-create the bucketed join fixtures (called by Bench's prewarm so
    * the one-time table write never lands inside a timed region). */
  def ensureBucketedTables(spark: SparkSession, dir: String): Unit = {
    ensureBucketed(spark, dir, "orders", "o_orderkey")
    ensureBucketed(spark, dir, "lineitem", "l_orderkey")
  }

  /** Bucketed co-located join (SURVEY §2.8 / DistributedPlanner's
    * partitioned-join path): both sides pre-bucketed and sorted on the
    * join key with the same bucket count, so the sort-merge join needs
    * NO exchange and NO sort — each task merges bucket i of both tables.
    * At 100 TB this turns an all-to-all shuffle of two fact tables into a
    * per-bucket local merge; the only shuffle left is the 5-row partial
    * aggregate. BucketedJoinSpec asserts the exchange-free plan. Oracle:
    * the identical join on the plain tables. */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    ensureBucketedTables(spark, dir)
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val o = spark.table(s"orders_bkt_$tag")
    val l = spark.table(s"lineitem_bkt_$tag")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice"), 2).as("rev"))
      .orderBy(col("o_orderpriority"))
  }

  val qBucketedJoinSql: String = s"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ${Parity.dsumSql("l_extendedprice", 2)} AS rev
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** External DataSource V2 scan (SeqSource — the ext-data-source
    * analogue): range filters push into the source, aggregation on top.
    * `v = id * 0.25` keeps every double sum exact, so the hash is
    * order-independent. */
  def qExtSource(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", "100000").option("slices", "8").load()
      .filter(col("id") >= 1000L && col("id") < 51000L)
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("id")).as("sum_id"),
        sum(col("v")).as("sum_v"))
      .orderBy(col("grp"))

  val qExtSourceSql: String = """
    SELECT CAST(range % 10 AS INT) AS grp,
           COUNT(*) AS n,
           CAST(SUM(range) AS BIGINT) AS sum_id,
           SUM(CAST(range AS DOUBLE) * 0.25) AS sum_v
    FROM range(100000)
    WHERE range >= 1000 AND range < 51000
    GROUP BY 1
    ORDER BY 1"""

  /** CHAR(n) read-side padding (reference types.h:44-47, chars.test):
    * values round-trip through a CHAR(25) table column and surface padded;
    * rtrim recovers the raw value. */
  def qCharPadding(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    // EXTERNAL table over an absolute fixture path: a managed table's
    // warehouse directory outlives the JVM (the in-memory catalog doesn't),
    // so a re-run's CREATE TABLE would collide with the stale directory.
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val base = new java.io.File(s"target/tmp/char_nation_$tag").getAbsolutePath
    if (!new java.io.File(s"$base/_SUCCESS").exists()) {
      nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").parquet(base)
    }
    spark.sql("DROP TABLE IF EXISTS graft_char_nation")
    spark.sql(
      "CREATE TABLE graft_char_nation (n_nationkey INT, n_name CHAR(25), n_regionkey INT) " +
        s"USING parquet LOCATION '$base'")
    spark.table("graft_char_nation")
      .select(
        col("n_nationkey"),
        col("n_name"),
        length(col("n_name")).as("ln"),
        rtrim(col("n_name")).as("trimmed"))
      .orderBy(col("n_nationkey"))
  }

  val qCharPaddingSql: String = """
    SELECT n_nationkey,
           rpad(n_name, 25, ' ') AS n_name,
           CAST(25 AS INT) AS ln,
           n_name AS trimmed
    FROM nation
    ORDER BY n_nationkey"""

  /** from_utc_timestamp / to_utc_timestamp (reference: timezone_db.cc —
    * TZ conversion is core timestamp surface). The oracle uses the
    * session-TZ-independent `timezone(tz, ts AT TIME ZONE 'UTC')` form.
    * Order dates sit at midnight, away from any DST transition hour. */
  def qFnTz(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT o_orderkey,
             CAST(to_utc_timestamp(o_orderdate, 'America/Los_Angeles') AS TIMESTAMP_NTZ) AS utc_from_la,
             CAST(from_utc_timestamp(o_orderdate, 'America/Los_Angeles') AS TIMESTAMP_NTZ) AS la_from_utc,
             CAST(from_utc_timestamp(o_orderdate, 'Asia/Tokyo') AS TIMESTAMP_NTZ)         AS tokyo_from_utc,
             CAST(to_utc_timestamp(o_orderdate, 'Europe/Paris') AS TIMESTAMP_NTZ)         AS utc_from_paris
      FROM orders
      WHERE o_orderkey <= 500
      ORDER BY o_orderkey""")

  val qFnTzSql: String = """
    SELECT o_orderkey,
           timezone('UTC', o_orderdate AT TIME ZONE 'America/Los_Angeles') AS utc_from_la,
           timezone('America/Los_Angeles', o_orderdate AT TIME ZONE 'UTC') AS la_from_utc,
           timezone('Asia/Tokyo', o_orderdate AT TIME ZONE 'UTC')          AS tokyo_from_utc,
           timezone('UTC', o_orderdate AT TIME ZONE 'Europe/Paris')        AS utc_from_paris
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey"""

  /** Partitioned table lifecycle via the ALTER path (reference
    * AlterTableAddPartitionStmt/AlterTableDropPartitionStmt): lay out
    * parquet files by partition, declare an EXTERNAL partitioned table,
    * register each partition with ALTER TABLE ADD PARTITION, drop one with
    * DROP PARTITION, then aggregate — the scan must prune to the two
    * surviving partitions (partition pruning is the core scale mechanism
    * this exercises). Oracle: same aggregate minus the dropped status. */
  def qPartitionedAlter(spark: SparkSession, dir: String): DataFrame = {
    import graft.Ddl
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    // absolute path: a relative LOCATION resolves against the warehouse
    // dir, silently pointing the table at an empty directory
    val base = new java.io.File(s"target/tmp/part_orders_$tag").getAbsolutePath
    if (!new java.io.File(s"$base/_SUCCESS").exists()) {
      Tables.load(spark, dir, "orders")
        .write.partitionBy("o_orderstatus").mode("overwrite").parquet(base)
    }
    spark.sql("DROP TABLE IF EXISTS graft_part_orders")
    spark.sql(
      """CREATE TABLE graft_part_orders (
        |  o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
        |  o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
        |USING parquet PARTITIONED BY (o_orderstatus STRING)
        |LOCATION '""".stripMargin.replaceAll("\n", " ") + base + "'")
    Seq("F", "O", "P").foreach(s =>
      Ddl.addPartition(spark, "graft_part_orders", s"o_orderstatus='$s'"))
    Ddl.dropPartition(spark, "graft_part_orders", "o_orderstatus='P'")
    spark.table("graft_part_orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("o_orderstatus"))
  }

  val qPartitionedAlterSql: String = s"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ${Parity.dsumSql("o_totalprice")} AS sum_price,
           MIN(o_orderkey) AS min_key
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""

  /** As-of join (point-in-time enrichment): every event picks up the
    * latest "rate update" at-or-before its timestamp per event_type. The
    * update stream is derived deterministically from the events table
    * (every 50th event, ties pre-aggregated with max). Oracle: DuckDB's
    * native ASOF LEFT JOIN — a strong independent check of the union-tag
    * windowed formulation in [[graft.operators.AsofJoin]]. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val updates = events.filter(col("event_id") % 50 === 0)
      .groupBy(col("event_type"), col("ts"))
      .agg(max(col("value")).as("rate"))
    val joined = graft.operators.AsofJoin.asofJoin(
      events, updates, key = "event_type", ts = "ts", valueCols = Seq("rate"))
    joined.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("rate")).as("n_matched"),
        dsum(col("rate")).as("sum_rate"))
      .orderBy(col("event_type"))
  }

  val qAsofJoinSql: String = """
    WITH upd AS (
      SELECT event_type, ts, MAX(value) AS rate
      FROM events
      WHERE event_id % 50 = 0
      GROUP BY event_type, ts)
    SELECT e.event_type,
           COUNT(*) AS n,
           COUNT(u.rate) AS n_matched,
           CAST(CAST(SUM(CAST(u.rate AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_rate
    FROM events e ASOF LEFT JOIN upd u
      ON e.event_type = u.event_type AND e.ts >= u.ts
    GROUP BY e.event_type
    ORDER BY e.event_type"""

  /** Range (point-in-interval) join: every 200th event spawns a ±60s
    * interval; all events of the same type landing inside an interval
    * match. Oracle: DuckDB's native inequality join — an independent
    * check of the time-binned equi-join formulation in
    * [[graft.operators.RangeJoin]]. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val intervals = events.filter(col("event_id") % 200 === 0)
      .select(
        col("event_type"),
        col("event_id").as("interval_id"),
        (col("ts") - expr("INTERVAL 60 SECONDS")).as("w_start"),
        (col("ts") + expr("INTERVAL 60 SECONDS")).as("w_end"))
    val points = events.select(col("event_type"), col("event_id"), col("ts"))
    graft.operators.RangeJoin.pointInInterval(
        points, intervals, key = "event_type", ts = "ts",
        startCol = "w_start", endCol = "w_end", binSeconds = 120L)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_matches"),
        countDistinct(col("interval_id")).as("n_intervals_hit"),
        countDistinct(col("event_id")).as("n_events_hit"))
      .orderBy(col("event_type"))
  }

  val qRangeJoinSql: String = """
    WITH iv AS (
      SELECT event_type, event_id AS interval_id,
             ts - INTERVAL 60 SECOND AS w_start,
             ts + INTERVAL 60 SECOND AS w_end
      FROM events WHERE event_id % 200 = 0)
    SELECT e.event_type,
           COUNT(*) AS n_matches,
           COUNT(DISTINCT iv.interval_id) AS n_intervals_hit,
           COUNT(DISTINCT e.event_id) AS n_events_hit
    FROM events e JOIN iv
      ON e.event_type = iv.event_type
     AND e.ts >= iv.w_start AND e.ts <= iv.w_end
    GROUP BY e.event_type
    ORDER BY e.event_type"""

  /** RIGHT SEMI JOIN shape (reference JoinOperator.java:27): semantically a
    * semi-join preserving the RIGHT input; Spark expresses it as left-semi
    * with sides swapped and the planner picks the build side (with AQE it
    * mirrors the reference's build-on-left physical choice). */
  def qJoinRightSemi(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    orders.filter(col("o_orderpriority") === "1-URGENT")
      .join(lineitem.filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"))
      .orderBy(col("o_orderstatus"))
  }

  val qJoinRightSemiSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS min_key
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""
}
