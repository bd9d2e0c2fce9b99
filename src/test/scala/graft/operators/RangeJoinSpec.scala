package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-join semantics on a hand-built case; boundary inclusivity and
  * bin-straddling intervals (the catalog entry q_range_join cross-checks
  * against DuckDB's native inequality join at sf scale). */
class RangeJoinSpec extends SparkSpec {

  test("points match exactly the containing intervals, boundaries inclusive") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1, 10L, t("2024-01-01 00:00:30")),
      (1, 11L, t("2024-01-01 00:02:00")), // exact upper boundary of iv 100
      (1, 12L, t("2024-01-01 00:05:00")), // in no interval
      (2, 13L, t("2024-01-01 00:00:30"))  // right time, wrong key
    ).toDF("k", "pid", "ts")
    val intervals = Seq(
      (1, 100L, t("2024-01-01 00:00:00"), t("2024-01-01 00:02:00")),
      (1, 101L, t("2024-01-01 00:01:30"), t("2024-01-01 00:03:00"))
    ).toDF("k", "iid", "s", "e")
    // bin (30s) smaller than interval length: intervals straddle bins
    val got = RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e", binSeconds = 30L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 100L), (11L, 100L), (11L, 101L)))
  }

  test("no duplicate candidate pairs when an interval spans many bins") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq((1, 1L, t("2024-01-01 00:10:00"))).toDF("k", "pid", "ts")
    val intervals = Seq((1, 9L, t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00"))).toDF("k", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e", binSeconds = 60L)
    assert(got.count() === 1)
  }
}
