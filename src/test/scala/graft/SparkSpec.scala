package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one local SparkSession for the whole suite run
  * (Spark startup is ~5s; per-suite sessions would dominate test time).
  *
  * local[4,3] — the retry-capable local master (4 threads, 3 task
  * attempts) — so TaskRetrySpec can exercise task-failure recovery;
  * plain local[n] kills the job on the first task failure. For every
  * other suite the extra attempts are invisible: deterministic injected
  * failures still fail (after retries), and nothing else throws in
  * tasks. */
object SparkSpec {
  lazy val spark: SparkSession = EngineSession.build(
    master = "local[4,3]", shufflePartitions = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkSpec.spark

  /** Evaluate a scalar SQL expression and return the single value. */
  protected def sql1(expr: String): Any =
    spark.sql(s"SELECT $expr").collect()(0).get(0)
}
