package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Formats
import graft.sinks.TableSink
import Parity._

/** Source/sink roundtrip catalog entries: each writes a deterministic
  * fixture derived from a parquet table, reads it back through the format
  * under test, and aggregates — the DuckDB oracle computes the same
  * aggregate straight from the parquet table, so any loss or corruption in
  * the roundtrip breaks the hash match. */
object SourceSink {

  /** JSON scan (the fork's signature feature): nested structs (user, props)
    * declared-schema read of an NDJSON fixture. */
  def qJsonScan(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val path = Formats.ensureJsonFixture(spark, events, dir)
    Formats.readJson(spark, path, Formats.eventsJsonSchema)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        sum(col("props.k")).as("sum_k"),
        max(col("user.id")).as("max_user"),
        sum(col("user.shard")).as("sum_shard"),
        min(col("ts_us")).as("min_ts_us"))
      .orderBy(col("event_type"))
  }

  val qJsonScanSql: String = s"""
    SELECT event_type,
           COUNT(*) AS n,
           ${dsumSql("value")} AS sum_value,
           CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k,
           MAX(user_id) AS max_user,
           CAST(SUM(user_id % 97) AS BIGINT) AS sum_shard,
           MIN(epoch_us(ts)) AS min_ts_us
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""

  /** Avro container scan (reference: hdfs-avro-scanner.cc) through
    * [[graft.sources.AvroIO]]: the fixture is supplier written as Avro;
    * the read declares a REORDERED SUBSET reader schema, so Avro's
    * writer-schema resolution (project by name, skip dropped fields) is on
    * the hash-checked path, not just unit-tested. */
  def qAvroScan(spark: SparkSession, dir: String): DataFrame = {
    val supplier = Tables.load(spark, dir, "supplier")
    val path = Formats.ensureAvroFixture(spark, supplier, dir)
    val readerSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "s_nationkey INT, s_suppkey BIGINT, s_acctbal DOUBLE")
    graft.sources.AvroIO.read(spark, path, Some(readerSchema))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("s_suppkey")).as("sum_key"),
        dsum(col("s_acctbal")).as("sum_bal"))
      .orderBy(col("s_nationkey"))
  }

  val qAvroScanSql: String = s"""
    SELECT s_nationkey,
           COUNT(*) AS n,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           ${dsumSql("s_acctbal")} AS sum_bal
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey"""

  /** Delimited-text scan with '|' row format (reference text scanner
    * option surface). */
  def qCsvScan(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val path = Formats.ensureCsvFixture(spark, nation, dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "n_nationkey INT, n_name STRING, n_regionkey INT")
    Formats.readDelimited(spark, path, schema, delimiter = "|")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_nation"))
      .orderBy(col("n_regionkey"))
  }

  val qCsvScanSql: String = """
    SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey"""

  /** Sink path: partitioned INSERT OVERWRITE + dynamic-partition overwrite
    * of one partition, then read-back aggregate. The oracle computes the
    * expected end-state directly: 'O' rows doubled, others untouched. */
  def qSinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val path = s"target/tmp/sink_orders_$tag"
    // step 1: full partitioned overwrite (INSERT OVERWRITE)
    TableSink.insertOverwrite(orders, path, Seq("o_orderstatus"))
    // step 2: dynamic overwrite of just the 'O' partition with doubled price
    TableSink.insertOverwriteDynamic(
      orders.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      path, Seq("o_orderstatus"))
    // step 3: read back and verify the merged end-state
    TableSink.read(spark, path)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("o_orderkey")).as("n_keys"))
      .orderBy(col("o_orderstatus"))
  }

  val qSinkRoundtripSql: String = """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
                              ELSE o_totalprice END AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_price,
           COUNT(DISTINCT o_orderkey) AS n_keys
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""

  /** Mixed-format table scan (reference QueryTest/mixed-format.test — one
    * table with parquet/text/avro partitions read transparently): nation
    * split by key into a parquet, a '|'-CSV and an Avro partition, read
    * back through [[graft.sources.MixedFormat]] and aggregated. The
    * oracle computes the same aggregate from the unsplit table, so any
    * loss/corruption in any branch — or a bad partition-value attach —
    * breaks the hash. */
  def qMixedFormat(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.MixedFormat
    val nation = Tables.load(spark, dir, "nation")
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val base = s"target/tmp/mixed_nation_$tag"
    val slices = Seq("parquet", "csv", "avro").zipWithIndex
    if (!new java.io.File(s"$base/_SUCCESS").exists()) {
      slices.foreach { case (fmt, i) =>
        val slice = nation.filter(col("n_nationkey") % 3 === i)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        fmt match {
          case "parquet" => slice.write.mode("overwrite").parquet(s"$base/$fmt")
          case "csv" => slice.write.mode("overwrite")
            .options(Map("delimiter" -> "|")).csv(s"$base/$fmt")
          case "avro" => graft.sources.AvroIO.write(slice, s"$base/$fmt")
        }
      }
      new java.io.File(s"$base/_SUCCESS").createNewFile()
    }
    val dataSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "n_nationkey INT, n_name STRING, n_regionkey INT")
    val partSchema = org.apache.spark.sql.types.StructType.fromDDL("fmt STRING")
    val parts = slices.map { case (fmt, _) =>
      MixedFormat.Part(s"$base/$fmt", fmt,
        if (fmt == "csv") Map("delimiter" -> "|") else Map.empty,
        Map("fmt" -> fmt))
    }
    MixedFormat.read(spark, parts, dataSchema, partSchema)
      .groupBy(col("fmt"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_nationkey")).as("sum_key"),
        min(col("n_name")).as("first_nation"),
        countDistinct(col("n_regionkey")).as("n_regions"))
      .orderBy(col("fmt"))
  }

  val qMixedFormatSql: String = """
    SELECT CASE WHEN n_nationkey % 3 = 0 THEN 'parquet'
                WHEN n_nationkey % 3 = 1 THEN 'csv'
                ELSE 'avro' END AS fmt,
           COUNT(*) AS n,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           MIN(n_name) AS first_nation,
           COUNT(DISTINCT n_regionkey) AS n_regions
    FROM nation
    GROUP BY 1
    ORDER BY fmt"""

  /** INSERT corner cases (reference QueryTest/insert.test, insert_null.test):
    * a NULL partition key must land in the `__HIVE_DEFAULT_PARTITION__`
    * directory and round-trip back as NULL, and a mixed static+dynamic
    * `PARTITION (p_status='O', p_pri)` overwrite must replace exactly the
    * ('O', *) partitions present in the incoming data — including the
    * ('O', NULL) one. The oracle computes the expected end-state straight
    * from orders: 'O' rows doubled, '5-LOW' priority routed through NULL. */
  def qSinkNullpart(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("p_pri",
        when(col("o_orderpriority") === "5-LOW", lit(null)).otherwise(col("o_orderpriority")))
      .withColumn("p_status", col("o_orderstatus"))
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val path = s"target/tmp/sink_nullpart_$tag"
    // step 1: full overwrite, two partition levels, NULL keys included
    TableSink.insertOverwrite(orders, path, Seq("p_status", "p_pri"))
    // step 2: mixed static+dynamic — PARTITION (p_status='O', p_pri)
    TableSink.insertOverwriteStaticDynamic(
      orders.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .drop("p_status"),
      path, staticSpec = Seq("p_status" -> "O"), dynamicCols = Seq("p_pri"))
    // step 3: read back; the NULL partition must resurface as NULL p_pri
    TableSink.read(spark, path)
      .groupBy(col("p_status"), col("p_pri"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("p_status").asc, col("p_pri").asc_nulls_first)
  }

  val qSinkNullpartSql: String = """
    SELECT o_orderstatus AS p_status,
           CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END AS p_pri,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
                              ELSE o_totalprice END AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY p_status ASC, p_pri ASC NULLS FIRST"""
}
