package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Mixed-format table reader — the reference allows `ALTER TABLE ... SET
  * FILEFORMAT` PER PARTITION, so one logical table can have parquet, text
  * and Avro partitions side by side (mixed-format.test reads such a table
  * transparently; per-partition format plumbing in the scanners'
  * format-dispatch path). Spark native tables are single-format, so the
  * Spark-first equivalent is a UNION of per-format scans projected onto
  * one declared schema, with the partition values attached as literal
  * columns per branch.
  *
  * Scale: each branch is an ordinary FileScan — filters and column
  * pruning push into every branch independently (a predicate on a data
  * column reaches the parquet branch as PushedFilters and the text branch
  * as a reader filter), and a predicate on a partition column
  * constant-folds each branch's literal to true/false, so non-matching
  * partitions collapse to empty relations at plan time — the same
  * partition-pruning effect the reference gets from its catalog. Avro
  * partitions route through [[AvroIO]] (no Spark avro datasource needed).
  */
object MixedFormat {

  /** One partition of the mixed table: its directory, file format
    * ("parquet" | "csv" | "json" | "avro"), reader options, and the
    * partition-column values this directory holds. */
  final case class Part(
      dir: String,
      format: String,
      options: Map[String, String] = Map.empty,
      partitionValues: Map[String, String] = Map.empty)

  /** Read `parts` as one DataFrame with schema `dataSchema` plus the
    * partition columns (declared in `partitionSchema`, values from each
    * part, cast to the declared types). */
  def read(spark: SparkSession, parts: Seq[Part],
      dataSchema: StructType,
      partitionSchema: StructType = new StructType()): DataFrame = {
    require(parts.nonEmpty, "mixed-format table needs at least one partition")
    val branches = parts.map { p =>
      val base = p.format.toLowerCase match {
        case "avro" => AvroIO.read(spark, p.dir, Some(dataSchema))
        case f => spark.read.format(f).options(p.options).schema(dataSchema).load(p.dir)
      }
      partitionSchema.fields.foldLeft(base) { (df, f) =>
        val v = p.partitionValues.get(f.name).orNull
        df.withColumn(f.name, lit(v).cast(f.dataType))
      }
    }
    branches.reduce(_.unionByName(_)).select(
      (dataSchema.fieldNames ++ partitionSchema.fieldNames).map(col).toSeq: _*)
  }
}
