package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The point of bucketing is the PLAN: a join of two tables bucketed and
  * sorted on the join key must execute with no exchange and no sort — the
  * property that makes co-located fact-fact joins viable at 100 TB. */
class BucketedJoinSpec extends SparkSpec {

  private def withSQLConf[A](kv: (String, String)*)(body: => A): A = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = pf.lift(p).toSeq
    val kids = p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    })
    here ++ kids.flatMap(collectAll(_)(pf))
  }

  test("bucketed equi-join plans with no exchange and no sort below the join") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // keep the small sides out of broadcast so the bucketed SMJ path is
    // what gets planned, as it would be for two fact tables at scale;
    // the legacy flag lets the scan expose per-bucket sort order (Spark 3+
    // hides it by default because multi-file buckets would need a merge —
    // ensureBucketed writes exactly one file per bucket, the case the
    // flag is for)
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      Extras.ensureBucketedTables(spark, dir)
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val o = spark.table(s"orders_bkt_$tag")
      val l = spark.table(s"lineitem_bkt_$tag")
      val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(o("o_orderkey"), $"o_orderpriority", $"l_extendedprice")
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan
      val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
      val sorts = collectAll(plan) { case s: SortExec => s }
      assert(exchanges.isEmpty, s"expected exchange-free bucketed join:\n$plan")
      assert(sorts.isEmpty, s"expected sort-free bucketed join (bucket files pre-sorted):\n$plan")
    }
  }

  test("bucketed join result equals the plain-table join") {
    val dir = "/root/testdata/sf0.001"
    val got = Extras.qBucketedJoin(spark, dir).collect()
    val plain = {
      val o = graft.Tables.load(spark, dir, "orders")
      val l = graft.Tables.load(spark, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), Parity.dsum(col("l_extendedprice"), 2).as("rev"))
        .orderBy(col("o_orderpriority"))
        .collect()
    }
    assert(got.map(_.toString).toSeq === plain.map(_.toString).toSeq)
  }
}
