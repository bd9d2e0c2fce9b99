package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on a hand-built case (the catalog entry
  * q_asof_join cross-checks the operator against DuckDB's native ASOF
  * LEFT JOIN at sf scale). */
class AsofJoinSpec extends SparkSpec {

  test("left rows pick the latest right row at-or-before their ts per key") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1, t("2024-01-01 00:10:00"), 100),
      (1, t("2024-01-01 00:15:00"), 150), // exactly at an update -> inclusive
      (1, t("2024-01-01 00:20:00"), 200),
      (2, t("2024-01-01 00:05:00"), 300)  // before any update -> null
    ).toDF("k", "ts", "v")
    val updates = Seq(
      (1, t("2024-01-01 00:00:00"), 7),
      (1, t("2024-01-01 00:15:00"), 8),
      (2, t("2024-01-01 00:30:00"), 9)
    ).toDF("k", "ts", "rate")

    val got = AsofJoin.asofJoin(events, updates, "k", "ts", Seq("rate"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getInt(0), r.getInt(2), if (r.isNullAt(3)) null else r.getInt(3)))
      .toSeq
    assert(got === Seq((1, 100, 7), (1, 150, 8), (1, 200, 8), (2, 300, null)))
  }

  test("left schema and row count are preserved (no join explosion)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = (0 until 100).map(i => (i % 3, t(f"2024-01-01 00:${i % 60}%02d:00"), i)).toDF("k", "ts", "v")
    val updates = (0 until 30).map(i => (i % 3, t(f"2024-01-01 00:${i % 60}%02d:30"), i * 10)).toDF("k", "ts", "rate")
    val out = AsofJoin.asofJoin(events, updates, "k", "ts", Seq("rate"))
    assert(out.columns.toSeq === Seq("k", "ts", "v", "rate"))
    assert(out.count() === 100)
  }
}
