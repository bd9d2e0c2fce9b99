package org.apache.spark.sql.graftplan

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}

/** Test-only bridge: builds a SparkSession with NO extensions on the
  * existing context — the shape of an externally-built (driver) session
  * that `EngineSession.adopt` receives. A session built by
  * `EngineSession.build` always carries the injected optimizer rule, so
  * the adopted-session fallback is untestable against it. */
object TestSessionBridge {
  def bareSession(spark: SparkSession): SparkSession =
    new CSparkSession(spark.sparkContext)
}
