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

  /** Source-parallelism floor for heavy per-row stages. A parquet file is
    * splittable only at row-group boundaries, so a single-row-group file
    * yields ONE input split no matter what maxPartitionBytes says — and
    * every operator fused into the scan stage (regex stats, shingling,
    * per-shingle hashing, partial aggregates) then runs on one core while
    * the rest of the cluster idles. Unless the planned scan has splits in
    * clear ABUNDANCE (>= 2x the cluster's cores), insert one round-robin
    * exchange so downstream per-row work distributes; the shuffled bytes
    * are the (small, that's why it mattered) source itself. At production
    * scale — many files / many row groups, splits >> cores — this is a
    * no-op and the plan is unchanged.
    *
    * WORKING splits, not planned splits (r11, closing the r10 gate's
    * 2x-cores ambiguity): planned byte-range splits OVERSTATE a parquet
    * scan's working parallelism in two ways the r10 distinct-corpus soak
    * measured, both on a 72 MB / 10-row-group file that planned ~18
    * splits:
    *  - rows materialize only in the split containing each ROW GROUP's
    *    midpoint, so 18 planned splits were 10 working tasks and the
    *    fused regex-stats stage ran 10-wide (q_text_stats sf3d→sf10d
    *    alpha 1.59);
    *  - a pushed-down filter prunes row groups by their min/max stats,
    *    so a bounded slice (doc_id < 50000) left ONE working row group
    *    and the whole by-gram kernel ran on one core
    *    (q_dedup_components 18.9s→83.5s on a slice of IDENTICAL size).
    * The r10 gate bought protection with an abundance margin (skip only
    * when planned >= 2x cores) — which over-exchanged scans whose row
    * groups genuinely abound (a pure tax in the cores..2x band) and
    * still MISSED the phantom-abundant shape (70 planned splits over a
    * one-row-group file sail past any planned-count bar). This gate
    * reads the truth instead: row-group counts from the parquet FOOTERS
    * of the scan's files (one footer read per file, cached — a metadata
    * walk, not a scan). Working parallelism = min(planned splits,
    * row groups); that is exact for an unfiltered scan, so the floor
    * skips exactly when working >= cores. Footer counts still can't see
    * FILTER pruning (re-implementing min/max row-group pruning is the
    * non-goal it was in r10), so a plan with a Filter keeps the 2x
    * abundance margin on the row-group count — pruning may cut working
    * groups further, and the margin is the insurance.
    *
    * Call it AFTER slicing/selecting (pushdown happens at the scan,
    * below the exchange) and only ahead of compute-heavy projections:
    * a plain aggregate over a small scan doesn't need the shuffle.
    *
    * Size-gated on the REAL on-disk bytes of the source leaves, not the
    * CBO estimate. The r9 soak showed why the estimate is the wrong gate
    * input: `optimizedPlan.stats.sizeInBytes` is scaled by column pruning
    * and CBO guesses, and the q8 index build at sf1 sat UNDER the old
    * estimate gate while its one-row-group file sat well over it — the
    * heavy fused quantization stage ran on one core (inverted scaling,
    * caught by the curve). FileIndex sizes and footer row-group counts
    * are facts, not estimates.
    *
    * Gate level (r12): TWO floors, by the caller's per-row cost.
    * [[parallelizedHeavy]] gates at 256 KB for stages whose fused
    * per-row work is orders of magnitude above scan cost (md5 cascades,
    * shingle explodes, regex stats): there a few-hundred-KB round-robin
    * exchange pays for itself immediately — measured at the r12 bench
    * (sf0.1 documents = 584 KB, one row group), q_text_stats's regex
    * stage ran 2×1.1 s single-task under the old uniform 4 MB gate and
    * 0.6 s total with the low floor. The plain [[parallelized]] keeps
    * the r9 4 MB gate for everything else: the SAME r12 sweep measured
    * the low floor as a pure tax on light projections (one extra
    * exchange + stage per kernel re-execution — q_sim_search_lsh 0.65 →
    * 1.43 s, vocab/sample/mix entries all regressed), because a filter
    * or bucket-assignment pass costs no more than the shuffle itself.
    * Both floors are env-overridable (`SPARK_GRAFT_PAR_FLOOR_BYTES`,
    * `SPARK_GRAFT_PAR_FLOOR_HEAVY_BYTES`) for deployment tuning. */
  def parallelized(df: DataFrame): DataFrame =
    parallelizedImpl(df, parFloorBytes)

  /** [[parallelized]] with the low byte gate — for callers fusing
    * compute-heavy per-row work onto the scan (see gate-level doc). */
  def parallelizedHeavy(df: DataFrame): DataFrame =
    parallelizedImpl(df, parFloorHeavyBytes)

  private def parallelizedImpl(df: DataFrame, floorBytes: Long): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    // min(planned, row groups): each row group materializes rows in
    // exactly one split, and a split materializes at most the groups
    // whose midpoints it contains — None (non-parquet/local leaves)
    // falls back to the planned count, the pre-r11 behavior
    val working = sourceRowGroups(df).fold(parts.toLong)(math.min(parts.toLong, _))
    // a Filter anywhere in the plan may prune row groups at the scan
    // (footer min/max stats), invisibly to the footer count — demand
    // abundance; an unfiltered count is exact, so cores suffice
    val hasFilter = df.queryExecution.optimizedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]).isDefined
    val need = if (hasFilter) 2L * cores else cores.toLong
    if (working >= need) return df
    val bytes = leafBytes(df)
    if (bytes < floorBytes) return df
    // Width is volume-aware (r13, VERDICT #2/#5): one task per
    // SPARK_GRAFT_PAR_FLOOR_TARGET_BYTES (default 64 KB) of source,
    // clamped to [1, max(cores, planned splits)] — the r12 bare
    // max(cores, parts) width sprayed a few hundred KB over 32 tasks,
    // measured as dedup/BM25 entries running FASTER at 8 cores than 32
    // (pure task-dispatch overhead). The clamp's upper bound keeps it a
    // floor, never a ceiling (repartition(cores) would cut a 48-working-
    // split scan to 32 tasks on 32 cores), and any source past
    // cores×64KB gets exactly the r12 width — at-scale behavior
    // unchanged, no local constant.
    val width = (bytes / parFloorTargetBytes + 1)
      .min(math.max(cores, parts)).max(1).toInt
    df.repartition(width)
  }

  /** Source bytes per floor task (see [[parallelized]]'s width note). */
  private[graft] lazy val parFloorTargetBytes: Long =
    envBytes("SPARK_GRAFT_PAR_FLOOR_TARGET_BYTES", 64L * 1024)

  /** Parse a byte-count env override, failing with a message that names
    * the variable — a malformed deployment value must not surface as a
    * bare NumberFormatException at first kernel use (r12 ADVICE). */
  private[graft] def envBytes(name: String, default: Long): Long =
    sys.env.get(name).map { v =>
      try {
        val n = v.trim.toLong
        require(n > 0, s"$name must be positive, got '$v'")
        n
      } catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$name must be a byte count (long), got '$v'")
      }
    }.getOrElse(default)

  /** Minimum source bytes before the parallelism floor inserts its
    * exchange (see [[parallelized]]'s gate-level doc). */
  private[graft] lazy val parFloorBytes: Long =
    envBytes("SPARK_GRAFT_PAR_FLOOR_BYTES", 4L * 1024 * 1024)

  /** The low gate for compute-heavy fused stages ([[parallelizedHeavy]]). */
  private[graft] lazy val parFloorHeavyBytes: Long =
    envBytes("SPARK_GRAFT_PAR_FLOOR_HEAVY_BYTES", 256L * 1024)

  // Footer reads are pure metadata (file immutable within a run); cache by
  // path so each file pays one footer read per JVM.
  private val rowGroupCache = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Total parquet row groups behind the plan's file-scan leaves, from
    * the file FOOTERS (a metadata read, not a scan). None when any leaf
    * is not a parquet file scan (local/cached relations, other formats) —
    * callers then fall back to planned-split counts. */
  private[graft] def sourceRowGroups(df: DataFrame): Option[Long] = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val counts = leaves.map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if fs.fileFormat.isInstanceOf[
                org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
            Some(fs.location.inputFiles.map { p =>
              rowGroupCache.computeIfAbsent(p, path => {
                val in = org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(new org.apache.hadoop.fs.Path(path), conf)
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                try r.getRowGroups.size.toLong finally r.close()
              })
            }.sum)
          case _ => None
        }
      case _ => None
    }
    if (counts.nonEmpty && counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  /** Actual bytes behind a plan's source leaves: file-index sizes for
    * file scans (exact, estimate-free); plan-stats sizeInBytes for
    * non-file leaves (local/cached relations — there the "estimate" IS
    * the materialized size). */
  private[graft] def leafBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        BigInt(lr.relation.sizeInBytes)
      case other => other.stats.sizeInBytes
    }.sum

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

  // Temp views are session-global, so memoizing every (session, dir) pair
  // is wrong: after views point at dir B, a call for previously-seen dir A
  // would be skipped and silently read B's data. Track the ONE currently
  // registered dir per session and re-register whenever it differs.
  private val registered = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Idempotent view registration; cheap when `dir` is already current. */
  def ensureViews(spark: SparkSession, dir: String): Unit =
    registered.compute(spark, { (s, cur) =>
      if (cur != dir) registerAll(s, dir)
      dir
    })
}
