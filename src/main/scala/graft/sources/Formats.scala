package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format sources mirroring the reference's scanner matrix
  * (SURVEY §2.1): Parquet (native), delimited text / CSV with row-format
  * options (hdfs-text-scanner.cc), and JSON — the fork's signature feature
  * (delimited-text-parser-json.cc, dispatched at hdfs-text-scanner.cc:224-238).
  *
  * The reference parses JSON records to a *declared* schema with nested
  * paths flattened by name; Spark's `read.schema(...).json` is a strict
  * superset (true nested struct/array columns) — SURVEY §1.2's decision.
  *
  * Avro (hdfs-avro-scanner.cc): the spark-avro connector is absent from
  * this container's jar set, but core `org.apache.avro` IS on Spark's
  * classpath — [[AvroIO]] implements the container-file reader/writer
  * (with writer-schema resolution) directly on it.
  *
  * Scale: a JSON/CSV scan is schema-on-read and codegen'd; at 100 TB the
  * only knobs that matter are splittable files and pushed-down pruning of
  * the parsed columns, both of which Spark's text sources give natively.
  */
object Formats {

  /** Read newline-delimited JSON with a declared schema (nested allowed).
    * PERMISSIVE mode matches the reference's abort_on_error=false default:
    * malformed records become nulls instead of failing the scan. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Read delimited text with Impala-style row-format options
    * (field delimiter / escape char / header / NULL string — the
    * reference's text tables render SQL NULL as `\N`, hive-serde
    * compatible). */
  def readDelimited(
      spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", escape: String = "\\", header: Boolean = false,
      nullValue: String = "\\N"): DataFrame =
    spark.read.schema(schema)
      .option("sep", delimiter)
      .option("escape", escape)
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .csv(path)

  /** Read UNQUOTED delimited text with Hive/Impala `ESCAPED BY` semantics
    * (LazySimpleSerDe: no quoting — a backslash escapes the next char, so
    * `a\|b` is one field containing `a|b`, and bare `\N` is SQL NULL).
    * Spark's CSV reader only honors its escape char inside quotes, so this
    * path parses lines with codegen'd string builtins instead: split on
    * the un-escaped delimiter, strip the escapes, route the NULL string,
    * cast to the declared schema. Limitation (documented): an escaped
    * escape immediately before a delimiter (`a\\|b`) is treated as an
    * escaped delimiter — the regex split is not a stateful scanner.
    * Scale: one text scan + per-row projection, fully codegen'd. */
  def readDelimitedUnquoted(
      spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "|", escape: String = "\\",
      nullValue: String = "\\N"): DataFrame = {
    val d = java.util.regex.Pattern.quote(delimiter)
    val e = java.util.regex.Pattern.quote(escape)
    val fields = split(col("value"), s"(?<!$e)$d")
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val raw = element_at(fields, i + 1)
      val unescaped = regexp_replace(raw, s"$e(.)", "$1")
      when(raw === nullValue, lit(null)).otherwise(unescaped)
        .cast(f.dataType).as(f.name)
    }
    spark.read.text(path).select(cols.toSeq: _*)
  }

  /** Events table re-shaped as nested JSON records (user + props structs) —
    * the fixture generator for the JSON-scan path. Deterministic: derived
    * purely from the parquet events table. */
  def eventsAsJsonRows(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      struct(col("user_id").as("id"),
        pmod(col("user_id"), lit(97)).as("shard")).as("user"),
      col("event_type"),
      col("value"),
      from_json(col("props"), StructType.fromDDL("k INT")).as("props"))

  /** The declared schema for reading the fixture back. */
  val eventsJsonSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts_us BIGINT, user STRUCT<id: BIGINT, shard: BIGINT>, " +
      "event_type STRING, value DOUBLE, props STRUCT<k: INT>")

  /** Write the NDJSON fixture once per (sfDir) under target/tmp; returns
    * the fixture path. Idempotent across query invocations. */
  def ensureJsonFixture(spark: SparkSession, events: DataFrame, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val path = s"target/tmp/json_events_$tag"
    val done = new java.io.File(path + "/_SUCCESS")
    if (!done.exists()) {
      eventsAsJsonRows(events).write.mode("overwrite").json(path)
    }
    path
  }

  /** CSV fixture for the delimited-text path ('|' delimiter, the classic
    * Impala row format), from the nation table. */
  def ensureCsvFixture(spark: SparkSession, nation: DataFrame, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val path = s"target/tmp/csv_nation_$tag"
    val done = new java.io.File(path + "/_SUCCESS")
    if (!done.exists()) {
      nation.write.mode("overwrite").option("sep", "|").csv(path)
    }
    path
  }

  /** Avro fixture (supplier table written as Avro containers) for the
    * Avro-scan path. */
  def ensureAvroFixture(spark: SparkSession, supplier: DataFrame, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val path = s"target/tmp/avro_supplier_$tag"
    val done = new java.io.File(path + "/_SUCCESS")
    if (!done.exists()) {
      // AvroIO.write appends files into an existing dir (unlike Spark's
      // overwrite mode); clear any half-written remains first so a missing
      // _SUCCESS always means a clean rebuild, never a stale mix.
      val dir = new java.io.File(path)
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      AvroIO.write(supplier.coalesce(4), path)
    }
    path
  }
}
