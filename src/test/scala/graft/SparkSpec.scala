package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one local SparkSession for the whole suite run
  * (Spark startup is ~5s; per-suite sessions would dominate test time). */
object SparkSpec {
  lazy val spark: SparkSession = EngineSession.build(
    master = "local[4]", shufflePartitions = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkSpec.spark

  /** Evaluate a scalar SQL expression and return the single value. */
  protected def sql1(expr: String): Any =
    spark.sql(s"SELECT $expr").collect()(0).get(0)
}
