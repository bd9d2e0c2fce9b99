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

  /** The r10 soak regression, pinned: planned byte-range splits OVERSTATE
    * a parquet scan's working parallelism (rows materialize only in the
    * split holding each row group's midpoint, and pushed-down filters
    * prune row groups by footer stats), so a scan whose planned splits
    * cleared the old `>= cores/2` bar could still execute its heavy
    * fused stage on one core (q_text_stats alpha 1.59, q_dedup_components
    * 18.9s→83.5s on an identically-sized bounded slice — both at sf10d,
    * both because the 72 MB file planned 18 splits on 32 cores). The
    * floor now requires ABUNDANCE (planned >= 2x cores) to skip. */
  test("ambiguous-band split counts trip the floor; abundant ones don't (r10 class)") {
    val dir = java.nio.file.Files.createTempDirectory("par_band").toString
    spark.range(90000)
      .select(col("id"),
        concat_ws("", (0 until 20).map(_ => md5(col("id").cast("string"))): _*).as("payload"))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val cores = spark.sparkContext.defaultParallelism
    val bytes = Tables.leafBytes(spark.read.parquet(dir)).toLong
    assert(bytes >= 4L * 1024 * 1024, s"setup: file should exceed the 4 MB gate, got $bytes")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      // ambiguous band: planned in [cores/2, 2*cores) — the r10 trap.
      // Split-size the file so it plans ~cores splits: enough for the
      // old gate to skip, but (on a one-row-group file) only ONE of
      // them would ever materialize rows.
      spark.conf.set("spark.sql.files.maxPartitionBytes", (bytes / cores + 1).toString)
      val banded = spark.read.parquet(dir).select(col("id"))
      val planned = banded.rdd.getNumPartitions
      assert(planned * 2 >= cores && planned < cores * 2,
        s"setup: planned splits should land in the ambiguous band, got $planned on $cores cores")
      assert(Tables.parallelized(banded).rdd.getNumPartitions === math.max(cores, planned),
        "an ambiguous-band scan over a multi-MB source must be floored to cores " +
          "WITHOUT narrowing a scan that already plans more than cores")

      // floor, not ceiling: planned in (cores, 2*cores) keeps its width —
      // repartition(cores) here would CUT working parallelism on a scan
      // whose splits are all genuine
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (bytes / (cores + cores / 2) + 1).toString)
      val wide = spark.read.parquet(dir).select(col("id"))
      val plannedW = wide.rdd.getNumPartitions
      if (plannedW > cores && plannedW < cores * 2) {
        assert(Tables.parallelized(wide).rdd.getNumPartitions === plannedW,
          "the floor must never reduce partition count in the ambiguous band")
      }

      // abundance: planned >= 2x cores — the at-scale regime; unchanged
      spark.conf.set("spark.sql.files.maxPartitionBytes", (bytes / (3 * cores) + 1).toString)
      val abundant = spark.read.parquet(dir).select(col("id"))
      val plannedA = abundant.rdd.getNumPartitions
      assert(plannedA >= cores * 2,
        s"setup: expected abundant splits, got $plannedA on $cores cores")
      assert(Tables.parallelized(abundant).rdd.getNumPartitions === plannedA,
        "a split-abundant scan must pass through exchange-free")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }
}
