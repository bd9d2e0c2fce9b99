package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row

/** Spill semantics (SURVEY §2.6/§2.4: the reference spills sort/agg/join
  * state to scratch under memory pressure; on Spark the same role is
  * played by UnsafeExternalSorter spills and sort-based aggregate
  * fallback). These tests FORCE the fallback/spill paths via the internal
  * thresholds Spark's own test suite uses and assert bit-identical
  * results — correctness must not depend on everything fitting in memory,
  * which is the whole premise of running at 100 TB.
  */
class SpillSemanticsSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, o) => o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def rows(sql: String): Seq[Row] = {
    Tables.ensureViews(spark, "/root/testdata/sf0.001")
    spark.sql(sql).collect().toSeq
  }

  test("sort-merge join with 1-row spill threshold returns identical results") {
    val q = """SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS mk
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey
               GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    val base = rows(q)
    val spilled = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2") {
      rows(q)
    }
    assert(spilled === base)
  }

  test("object-hash aggregate (group_concat) forced to sort fallback stays deterministic") {
    val q = """SELECT n_regionkey, group_concat(n_name, '|') AS names
               FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
    val base = rows(q)
    val spilled = withConf(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1") {
      rows(q)
    }
    assert(spilled === base)
    assert(base.size === 5)
  }
}
