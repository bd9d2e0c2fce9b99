package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sinks.TableSink
import graft.sources.AvroIO

/** Fails every task's FIRST attempt at the point the injected column is
  * evaluated; retries (attempt >= 1) pass the value through untouched.
  * One object-level counter proves the failures actually fired (valid
  * only when tasks share the driver JVM — local[n,f] masters). */
object RetryInjector extends Serializable {
  val thrown = new AtomicInteger(0)
  def armed(x: Long): Long = {
    val ctx = TaskContext.get()
    if (ctx != null && ctx.attemptNumber() == 0) {
      thrown.incrementAndGet()
      throw new RuntimeException(
        s"injected failure: stage ${ctx.stageId()} partition ${ctx.partitionId()} attempt 0")
    }
    x
  }
}

/** Correctness under TASK RETRIES — the failure-recovery class the
  * reference handles through its fragment-retry machinery and that no
  * plain local[n] run can reach (local masters default to
  * maxFailures=1, so the first task failure kills the job; the shared
  * test session runs local[4,3] precisely to make this class testable).
  *
  * Each scenario injects a deterministic failure into EVERY task's
  * first attempt of the stage evaluating the injected column, then
  * asserts the job (a) succeeds via retries, (b) produces output
  * IDENTICAL to the uninjected run, and (c) actually retried (the
  * injector's throw counter advanced). The interesting failure modes
  * this pins:
  *  - UDA partial buffers (GroupConcat-family TypedImperativeAggregates,
  *    TopKFront heaps, HLL sketches) must rebuild cleanly when a map
  *    task dies mid-aggregation and re-runs;
  *  - the file-sink commit protocols (parquet via TableSink, the Avro
  *    writer's task-attempt-temp + rename dance) must produce
  *    exactly-once output when attempt 0 dies after opening files —
  *    a failed attempt's partials must never be visible to readers;
  *  - connectedComponents' convergence accumulator must not
  *    double-count updates from failed attempts (Spark applies
  *    accumulator updates only from successful tasks; a double-applied
  *    `improves` tick would stall convergence detection).
  */
class TaskRetrySpec extends SparkSpec {

  private def retryCapable: Boolean = {
    val m = spark.sparkContext.master
    m.matches("""local\[\d+\s*,\s*\d+\]""") || m.startsWith("local-cluster") ||
      m.startsWith("spark://")
  }

  /** Same-JVM masters expose the injector's counter to the driver. */
  private def counterVisible: Boolean =
    spark.sparkContext.master.startsWith("local[")

  private val inject = udf(RetryInjector.armed _)

  /** Both frames are BY-NAME: operators that materialize eagerly at
    * construction (connectedComponents localCheckpoints its inputs) must
    * build after the injector-counter snapshot, or the throws land
    * before `before` and the fired-assertion can't see them. */
  private def assertRetriedIdentical(injected: => DataFrame, clean: => DataFrame): Unit = {
    assume(retryCapable, s"master ${spark.sparkContext.master} cannot retry tasks")
    val before = RetryInjector.thrown.get()
    val got = injected.collect().map(_.toString).sorted
    if (counterVisible)
      assert(RetryInjector.thrown.get() > before,
        "injector never fired — the failure path was not exercised")
    val want = clean.collect().map(_.toString).sorted
    assert(got.toSeq === want.toSeq)
  }

  private def base = spark.range(0, 1000, 1, 4)

  test("UDA partial buffers survive first-attempt task failures") {
    def frame(id: org.apache.spark.sql.Column): DataFrame =
      base.select(id.as("id"))
        .select(col("id"), (col("id") % 7).as("g"),
          concat(lit("d"), col("id")).as("s"))
        .groupBy(col("g"))
        .agg(
          sum(col("id")).as("total"),
          count(lit(1)).as("n"),
          expr("ndv(s)").as("ndv_s"),
          expr("group_concat(s, ',')").as("gc"),
          expr("top_k_front(struct(cast(id as double) as score, s as id), 3)").as("front"))
        // group_concat order is input-partition-dependent; normalize it
        // (the retry question is whether the MULTISET survives, not order)
        .select(col("g"), col("total"), col("n"), col("ndv_s"),
          array_sort(split(col("gc"), ",")).as("gc_set"),
          expr("transform(front, x -> x.id)").as("front_ids"))
    assertRetriedIdentical(frame(inject(col("id"))), frame(col("id")))
  }

  test("parquet sink commit is exactly-once under task retries") {
    assume(retryCapable)
    val dir = java.nio.file.Files.createTempDirectory("retry_sink").toString
    val before = RetryInjector.thrown.get()
    TableSink.insertOverwrite(
      base.select(inject(col("id")).as("id"), (col("id") % 5).as("p")),
      dir, partitionBy = Seq("p"))
    if (counterVisible) assert(RetryInjector.thrown.get() > before)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000L)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) === 499500L)
    assert(back.select(col("id")).distinct().count() === 1000L,
      "duplicate rows — a failed attempt's files leaked into the committed output")
  }

  test("avro writer's rename-on-commit is exactly-once under task retries") {
    assume(retryCapable)
    val dir = java.nio.file.Files.createTempDirectory("retry_avro").toString + "/t"
    val before = RetryInjector.thrown.get()
    AvroIO.write(
      base.select(inject(col("id")).as("id"), concat(lit("v"), col("id")).as("s")),
      dir)
    if (counterVisible) assert(RetryInjector.thrown.get() > before)
    val back = AvroIO.read(spark, dir)
    assert(back.count() === 1000L)
    assert(back.select(col("id")).distinct().count() === 1000L,
      "duplicate rows — an attempt-0 container file survived the commit")
  }

  test("connected components converge correctly when input tasks fail and retry") {
    // ring-of-pairs graph: 0-1, 2-3, ... plus chain links joining pairs
    // 0..249 into one big component; 500+ stay singleton pairs.
    def edges(src: org.apache.spark.sql.Column): DataFrame =
      spark.range(0, 500, 1, 4)
        .select(src.as("id_a"), (col("id") + lit(500)).as("id_b"))
        .union(spark.range(0, 249, 1, 4)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b")))
    def run(e: DataFrame): DataFrame = {
      val nodes = spark.range(0, 1000, 1, 4).toDF("id")
      Dedup.connectedComponents(nodes, e)
    }
    assertRetriedIdentical(run(edges(inject(col("id")))), run(edges(col("id"))))
  }
}
