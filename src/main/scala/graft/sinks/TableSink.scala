package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table sink: INSERT INTO / INSERT OVERWRITE with static and dynamic
  * partitions — the reference's HdfsTableSink surface
  * (be/src/exec/hdfs-table-sink.cc; per-format writers
  * hdfs-parquet-table-writer.cc).
  *
  * Semantics matched:
  *  - INSERT INTO → append
  *  - INSERT OVERWRITE (unpartitioned) → full replace
  *  - INSERT OVERWRITE PARTITION (dynamic) → replace ONLY the partitions
  *    present in the incoming data (the reference's dynamic-partition
  *    behavior), via spark.sql.sources.partitionOverwriteMode=dynamic.
  *
  * Scale: partitioned parquet writes shard by partition value; writers run
  * per task — no single-writer coalesce anywhere near this path. Partition
  * count per task is bounded by a pre-repartition on the partition columns
  * when requested (avoids the many-small-files failure mode at 1000
  * executors).
  */
object TableSink {

  /** Append rows (INSERT INTO). */
  def insertInto(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    write(df, path, partitionBy, "append")

  /** Full overwrite (INSERT OVERWRITE, unpartitioned or static). */
  def insertOverwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit =
    write(df, path, partitionBy, "overwrite")

  /** Dynamic-partition overwrite: replaces only partitions present in df. */
  def insertOverwriteDynamic(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try write(df, path, partitionBy, "overwrite")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def write(df: DataFrame, path: String, partitionBy: Seq[String], mode: String): Unit = {
    val w0 = if (partitionBy.nonEmpty) {
      // co-locate rows of a partition before writing: one file per
      // (partition, task) instead of (partition × task) small files
      import org.apache.spark.sql.functions.col
      df.repartition(partitionBy.map(col): _*).write.partitionBy(partitionBy: _*)
    } else df.write
    w0.mode(mode).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
