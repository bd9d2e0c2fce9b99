package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog access for the driver-provided TPC-H-ish parquet tables
  * (TESTDATA.md). Mirrors the reference's catalog model (database → table →
  * files; fe/.../catalog/HdfsTable.java) at the granularity Spark needs:
  * a named view per parquet directory.
  *
  * Scale note: these are plain parquet scans — on a real cluster the same
  * code reads a partitioned table and Catalyst performs partition pruning
  * and predicate pushdown; nothing here assumes single-node layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS), surfaced as epoch-nano Long
    * (spark.sql.legacy.parquet.nanosAsLong) — convert to a proper
    * microsecond timestamp column, preserving the original name.
    *
    * Exactness: `div` is integer long division (epoch-nanos ~1.7e18 exceed
    * double's 2^53 exact range, so `/` would round ~12% of values off by
    * 1µs). The result is cast to timestamp_ntz to match how DuckDB reads
    * the same column (isAdjustedToUTC=false → naive timestamp); session TZ
    * is UTC so the instant is unchanged.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df

  /** Register every table as a temp view in `spark`'s catalog. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // Memoized per (session, dir) so SQL-surface queries can call this on
  // every invocation without re-building 10 scan plans each time.
  private val registered = new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Boolean]()

  /** Idempotent view registration; cheap after the first call. */
  def ensureViews(spark: SparkSession, dir: String): Unit =
    registered.computeIfAbsent((spark, dir), { _ => registerAll(spark, dir); true })
}
