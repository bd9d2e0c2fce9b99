package graft

import org.apache.spark.sql.functions._

/** Executable evidence for the engine's skew posture (SURVEY §2.8).
  *
  * The reference handles hot keys by static planning only (its
  * DistributedPlanner has no runtime re-plan); the engine's posture is
  * AQE skew-join split (`EngineSession.staticConfs` turns it on) plus the
  * explicit [[operators.SaltedJoin]] for deliberate salting (spec'd in
  * SaltedJoinSpec). This spec proves the AQE half actually fires: a join
  * whose left side is 50%-one-key must come out of execution with the
  * skewed shuffle partition SPLIT (the final adaptive plan carries the
  * skew marker) and bit-identical results.
  *
  * Thresholds are scaled down to test size (the production defaults trip
  * at 256MB partitions); the CONFIG KNOBS exercised are exactly the ones
  * a 100 TB deployment would tune. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime, results unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join (no broadcast escape hatch), and scale the
      // skew trigger to test data volume
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")

      // left: 200k rows, HALF on key 0 — one shuffle partition ~4x the median
      val left = spark.range(0, 200000)
        .select(when(col("id") < 100000, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      // right: 50k distinct keys, evenly spread
      val right = spark.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("w"))

      val joined = left.join(right, "k")
      // execute THIS frame (count() would spawn a separate query execution
      // and leave joined's adaptive plan unfinalized)
      val n = joined.collect().length
      // only the hot key (0) and nothing in [100000, 200000) matches
      assert(n === 100000, "join result must be exact despite the skew split")

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"),
        "the test must exercise the shuffle-join path (no broadcast)")
      assert(finalPlan.toLowerCase.contains("skew"),
        s"the final adaptive plan must mark the skewed partition as split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
