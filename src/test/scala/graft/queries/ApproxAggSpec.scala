package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Band-flag behavior of the q_agg_approx driver entry: the flags must be
  * TRUE under the shipped bands at both driver scale factors (the oracle
  * pins literal TRUE), and must flip FALSE under unreachable bands — the
  * same non-vacuity guarantee the ANN recall_ok gate carries, so a
  * plumbing regression in the band logic itself surfaces locally instead
  * of as an unexplained driver hash-red. */
class ApproxAggSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("shipped bands hold at both driver scale factors") {
    for (dir <- dirs) {
      val rows = Aggregates.qAggApprox(spark, dir)
        .select(col("ndv_part_ok"), col("ndv_order_ok"), col("median_ok"))
        .collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2)),
        s"band flag false at $dir")
    }
  }

  test("unreachable bands flip every flag FALSE (flags are not vacuous)") {
    val rows = Aggregates.qAggApproxBanded(spark, "/root/testdata/sf0.001",
        ndvLo = 10.0, ndvHi = 10.1, rankLo = 0.999, rankHi = 1.0)
      .select(col("ndv_part_ok"), col("ndv_order_ok"), col("median_ok"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2)))
  }
}
