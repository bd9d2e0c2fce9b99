package org.apache.spark.sql.graftplan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Lives under org.apache.spark.sql to reach `private[sql]` plan internals:
  * turns a hand-rewritten logical plan back into a DataFrame — needed by
  * the ADOPTED-session path of the APPX_COUNT_DISTINCT rewrite: extensions
  * can't be injected into a live session, so there the rewrite runs on the
  * ANALYZED plan (before `RewriteDistinctAggregates` expands multi-distinct
  * aggregates out of the rule's reach) and the result re-enters query
  * execution here.
  */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
