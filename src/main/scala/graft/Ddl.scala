package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL / utility statement shims (SURVEY §2.12) — the reference's
  * non-query surface mapped onto Spark SQL DDL. Most statements are 1:1
  * (`CREATE/DROP/ALTER`, `SHOW`, `DESCRIBE` pass straight through
  * `spark.sql`); the shims below cover the Impala-isms that need a
  * translation:
  *
  *  - `CREATE TABLE ... LIKE PARQUET 'file'` (CreateTableLikeFileStmt.java):
  *    schema lifted from a parquet footer.
  *  - `COMPUTE STATS t` (ComputeStatsStmt.java) → `ANALYZE TABLE`.
  *  - `INVALIDATE METADATA` / `REFRESH t` (ResetMetadataStmt.java) →
  *    `REFRESH TABLE`.
  */
object Ddl {

  /** Schema from a parquet file/directory footer. */
  def schemaFromParquet(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** `CREATE TABLE name LIKE PARQUET 'schemaFile' [LOCATION loc]`. */
  def createTableLikeParquet(
      spark: SparkSession, name: String, schemaFile: String,
      location: Option[String] = None): Unit = {
    val schema = schemaFromParquet(spark, schemaFile)
    val ddlCols = schema.toDDL
    val locClause = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE $name ($ddlCols) USING parquet$locClause")
  }

  /** `COMPUTE STATS t` → table + column statistics for the CBO (the
    * reference's stats feed its join-order cost model the same way). */
  def computeStats(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")

  /** `INVALIDATE METADATA t` / `REFRESH t`. */
  def refresh(spark: SparkSession, table: String): Unit =
    spark.sql(s"REFRESH TABLE $table")

  /** `SHOW TABLES [IN db]` passthrough. */
  def showTables(spark: SparkSession): DataFrame = spark.sql("SHOW TABLES")

  /** `DESCRIBE [FORMATTED] t` passthrough. */
  def describe(spark: SparkSession, table: String, formatted: Boolean = false): DataFrame =
    spark.sql(s"DESCRIBE ${if (formatted) "FORMATTED " else ""}$table")
}
