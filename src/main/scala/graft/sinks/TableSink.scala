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
  def insertInto(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      format: String = "parquet", options: Map[String, String] = Map.empty): Unit =
    write(df, path, partitionBy, "append", format, options)

  /** Full overwrite (INSERT OVERWRITE, unpartitioned or static). */
  def insertOverwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      format: String = "parquet", options: Map[String, String] = Map.empty): Unit =
    write(df, path, partitionBy, "overwrite", format, options)

  /** Mixed static+dynamic partition INSERT OVERWRITE — the reference's
    * `PARTITION (p1='x', p2)` form (InsertStmt.java static/dynamic split):
    * the static prefix is pinned to a literal on every row and only the
    * (static, dynamic…) partitions present in the data are replaced. */
  def insertOverwriteStaticDynamic(df: DataFrame, path: String,
      staticSpec: Seq[(String, String)], dynamicCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.lit
    val pinned = staticSpec.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
    insertOverwriteDynamic(pinned, path, staticSpec.map(_._1) ++ dynamicCols)
  }

  /** Dynamic-partition overwrite: replaces only partitions present in df. */
  def insertOverwriteDynamic(df: DataFrame, path: String, partitionBy: Seq[String],
      format: String = "parquet", options: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try write(df, path, partitionBy, "overwrite", format, options)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** `INSERT OVERWRITE t SELECT ... FROM t` — overwriting a table the
    * query also reads. Spark rejects the direct form ("Cannot overwrite a
    * path that is also being read from"); the reference handles it by
    * writing to a staging directory and swapping on success
    * (hdfs-table-sink's staging protocol), which is what this does:
    * materialize the full result to `<path>__staging`, then replace the
    * table directory. The swap only happens after the staged write
    * commits, so a mid-query failure leaves the original data intact.
    *
    * Failure atomicity: if the staging→target swap fails after the
    * original was staged out to `<path>__old`, the old data is renamed
    * back into place before rethrowing, and the staging dir (the only
    * copy of the new result at that point) is deleted only after a
    * successful swap — a failed run can never leave the table path
    * empty. */
  def insertOverwriteFromSelf(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    fs.delete(staging, true)
    write(df, staging.toString, partitionBy, "overwrite", "parquet", Map.empty)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(old, true)
    val stagedOut = fs.exists(target) && {
      require(fs.rename(target, old), s"could not stage out $target"); true
    }
    try {
      require(fs.rename(staging, target), s"could not swap staging into $target")
    } catch {
      case t: Throwable =>
        // roll the original back into place; staging is left on disk for
        // forensics rather than deleted (it may be the only good copy)
        if (stagedOut && !fs.exists(target)) fs.rename(old, target)
        throw t
    }
    fs.delete(old, true)
    fs.delete(staging, true)
  }

  private def write(df: DataFrame, path: String, partitionBy: Seq[String],
      mode: String, format: String, options: Map[String, String]): Unit = {
    val w0 = if (partitionBy.nonEmpty) {
      // co-locate rows of a partition before writing: one file per
      // (partition, task) instead of (partition × task) small files
      import org.apache.spark.sql.functions.col
      df.repartition(partitionBy.map(col): _*).write.partitionBy(partitionBy: _*)
    } else df.write
    w0.mode(mode).format(format).options(options).save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)
}
