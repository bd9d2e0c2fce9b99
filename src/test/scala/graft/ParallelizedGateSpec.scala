package graft

import org.apache.spark.sql.functions._

/** `Tables.parallelized`'s gate input — the r9 soak regression, pinned.
  *
  * The failure class (VERDICT_r09 "What's wrong" #2): a single-row-group
  * parquet file yields ONE input split, and the old gate read
  * `optimizedPlan.stats.sizeInBytes` — a CBO ESTIMATE that column
  * pruning scales down by the projected-row-width ratio. Project a
  * narrow column out of a wide file and the estimate lands under the
  * 4 MB threshold while the file (and the per-row work fused onto its
  * scan) is far larger: the floor declined to repartition and a heavy
  * fused stage ran on one core (the q8 index build at sf1 — inverted
  * scaling, caught by the scale curve). The new gate reads the
  * FileIndex's on-disk bytes: facts, not estimates.
  */
class ParallelizedGateSpec extends SparkSpec {

  test("estimate-shrunk wide file still trips the parallelism floor (r9 q8-at-sf1 class)") {
    val dir = java.nio.file.Files.createTempDirectory("par_gate").toString
    // one file, one row group, >= 4 MB on disk (hex payload compresses
    // ~2x, hence the row count)
    spark.range(90000)
      .select(col("id"),
        concat_ws("", (0 until 20).map(_ => md5(col("id").cast("string"))): _*).as("payload"))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)

    // reproduce the single-split shape: with a large open cost (the
    // at-scale config where one split ~ one big row group) the whole
    // file is one planned split, exactly the one-row-group trap
    val prevOpenCost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", (32L * 1024 * 1024).toString)
    try {
      // narrow projection: the scan prunes to `id`, so the CBO estimate
      // is width-scaled far below the real file size
      val df = spark.read.parquet(dir).select(col("id"))
      val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val real = Tables.leafBytes(df)
      val gate = BigInt(4L * 1024 * 1024)
      assert(real >= gate, s"setup: file should exceed the 4 MB gate, got $real")
      assert(estimate < gate,
        s"setup: the pruned estimate should sit under the gate (the r9 trap), got $estimate")
      assert(df.rdd.getNumPartitions * 2 <
        spark.sparkContext.defaultParallelism, "setup: single-split scan")

      // old gate (estimate-based) would skip; the new gate must repartition
      val out = Tables.parallelized(df)
      assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism,
        "the floor must distribute a single-split multi-MB scan regardless of the estimate")

      // and a genuinely tiny relation still passes through exchange-free
      val tinyDir = java.nio.file.Files.createTempDirectory("par_tiny").toString
      spark.range(100).coalesce(1).write.mode("overwrite").parquet(tinyDir)
      val tiny = spark.read.parquet(tinyDir)
      assert(Tables.parallelized(tiny).rdd.getNumPartitions === tiny.rdd.getNumPartitions)
    } finally spark.conf.set("spark.sql.files.openCostInBytes", prevOpenCost)
  }
}
