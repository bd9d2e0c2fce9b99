package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** The one custom optimizer rule this engine needs (SURVEY §7 step 7):
  * Impala's `SET APPX_COUNT_DISTINCT=true` query option
  * (be/src/service/query-options.cc) transparently evaluates
  * `COUNT(DISTINCT x)` as `ndv(x)` — trading exactness for a
  * shuffle-free sketch aggregation.
  *
  * Same trade here: HLL++ replaces the two-phase distinct expansion, so a
  * 100 TB count-distinct stops shuffling the distinct keys and ships
  * fixed-size sketches instead. Gated on a session conf so default
  * semantics stay exact.
  */
object AppxCountDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.appxCountDistinct"

  /** The reference's query options accept 0/1 as booleans
    * (be/src/service/query-options.cc) — parse leniently so a value that
    * reached the conf un-normalized (e.g. a direct `spark.conf.set`)
    * toggles the rewrite instead of throwing in the optimizer. */
  def parseBool(v: String): Boolean = {
    val t = v.trim
    t.equalsIgnoreCase("true") || t == "1"
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!parseBool(conf.getConfString(ConfKey, "false"))) plan
    else rewrite(plan)

  /** The unconditional rewrite — also applied directly to ANALYZED plans
    * on the adopted-session SQL path ([[graft.EngineSession.sql]]), where
    * the optimizer-batch placement that makes the rule see multi-distinct
    * aggregates intact is unavailable. */
  def rewrite(plan: LogicalPlan): LogicalPlan =
    plan transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), Complete, true, _, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
    }
}
