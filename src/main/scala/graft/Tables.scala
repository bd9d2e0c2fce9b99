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
    * Why an abundance margin and not "splits >= cores/2": planned
    * byte-range splits OVERSTATE a parquet scan's working parallelism in
    * two ways the r10 distinct-corpus soak measured, both on a 72 MB /
    * 10-row-group file that planned ~18 splits (>= cores/2, so the old
    * gate skipped the exchange on 32 cores):
    *  - rows materialize only in the split containing each ROW GROUP's
    *    midpoint, so 18 planned splits were 10 working tasks and the
    *    fused regex-stats stage ran 10-wide (q_text_stats sf3d→sf10d
    *    alpha 1.59 — sf3d planned 5 splits, tripped the floor, and ran
    *    32-wide, FASTER per byte than the bigger corpus);
    *  - a pushed-down filter prunes row groups by their min/max stats,
    *    so a bounded slice (doc_id < 50000) left ONE working row group
    *    and the whole by-gram kernel ran on one core
    *    (q_dedup_components 18.9s→83.5s on a slice of IDENTICAL size).
    * Counting working splits pre-execution would mean reading footers
    * and re-implementing row-group pruning; the margin buys the same
    * protection for one cheap exchange of the (by construction small)
    * source in the ambiguous band, and leaves genuinely parallel scans
    * — splits >= 2x cores, the only at-scale regime — untouched.
    *
    * Call it AFTER slicing/selecting (pushdown happens at the scan,
    * below the exchange) and only ahead of compute-heavy projections:
    * a plain aggregate over a small scan doesn't need the shuffle.
    *
    * Size-gated on the REAL on-disk bytes of the source leaves, not the
    * CBO estimate: below ~4 MB (Spark's own openCostInBytes scale) the
    * exchange cannot pay for itself — especially under the LSH kernels'
    * recompute-over-cache design, where the source subtree (and thus the
    * exchange) re-executes several times per query — so tiny relations
    * pass through untouched. The r9 soak showed why the estimate is the
    * wrong gate input: `optimizedPlan.stats.sizeInBytes` is scaled by
    * column pruning and CBO guesses, and the q8 index build at sf1 sat
    * UNDER the old 4 MB estimate gate while its one-row-group file sat
    * well over it — the heavy fused quantization stage ran on one core
    * (inverted scaling, caught by the curve). FileIndex sizes are facts,
    * not estimates; an un-ANALYZE'd or projection-shrunk source can no
    * longer dodge the floor. */
  def parallelized(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    if (parts >= cores * 2) return df
    // floor, never a ceiling: in the ambiguous band (cores <= parts <
    // 2*cores) the exchange exists to redistribute possibly-phantom
    // splits, not to NARROW genuinely parallel ones — repartition(cores)
    // here would cut a 48-working-split scan to 32 tasks on 32 cores
    if (leafBytes(df) >= 4L * 1024 * 1024) df.repartition(math.max(cores, parts)) else df
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
