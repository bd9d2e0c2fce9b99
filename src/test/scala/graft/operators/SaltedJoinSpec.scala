package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join: identical result to the plain join, and — the point —
  * under a forced shuffle join the exchange partitions on (key, salt) so
  * a single hot key spreads over `salts` reducers instead of one. */
class SaltedJoinSpec extends SparkSpec {

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

  private lazy val facts = {
    import spark.implicits._
    // pathological skew: 90% of rows on one key
    (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "v")
  }

  private lazy val dim = {
    import spark.implicits._
    (Seq("hot") ++ (0 until 7).map(i => s"k$i")).map(k => (k, s"label_$k"))
      .toDF("dk", "label")
  }

  test("salted join equals the plain join") {
    val plain = facts.join(dim, facts("k") === dim("dk"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SaltedJoin.join(facts, dim, "k", "dk", salts = 8)
      .groupBy(col("label")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("an input that already has a __salt column is rejected, not corrupted") {
    val withSalt = facts.withColumn("__salt", lit(1))
    val e = intercept[IllegalArgumentException] {
      SaltedJoin.join(withSalt, dim, "k", "dk", salts = 8)
    }
    assert(e.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      SaltedJoin.join(facts, dim.withColumn("__salt", lit(1)), "k", "dk", salts = 8)
    }
    assert(e2.getMessage.contains("__salt"))
  }

  test("under a forced shuffle join, the exchange partitions on (key, salt)") {
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = SaltedJoin.join(facts, dim, "k", "dk", salts = 8)
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan
      assert(collectAll(plan) { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"broadcast must be disabled for this assertion:\n$plan")
      val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      // both sides hash-partition on the composite (key, salt) — the salt
      // must be part of the partitioning or the hot key still collapses
      // onto a single reducer
      assert(exchanges.forall(_.outputPartitioning.toString.contains("__salt")),
        exchanges.map(_.outputPartitioning).mkString("; "))
    }
  }
}
