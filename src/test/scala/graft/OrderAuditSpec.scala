package graft

import graft.plans.OrderAudit
import graft.plans.OrderAudit._

/** Data half of the output-order contract (shape half:
  * SparkEntryContractSpec): within every sort-key tie group that can reach
  * an entry's output, all rows must be IDENTICAL — otherwise Spark and
  * DuckDB may deliver the tied rows in different orders and the driver's
  * order-sensitive hash flips on scheduler whim. Caught live in r11:
  * q_ds65_min_avg sorted on (s_name, p_name), which collide across
  * partkeys at sf0.01 — value-correct, order-ambiguous, driver-green only
  * by luck. This spec audits the full catalog at sf0.001 every test run;
  * the round protocol also runs `graft.plans.OrderAudit` standalone at
  * sf0.01, where the toy scale's missing tie collisions actually appear. */
class OrderAuditSpec extends SparkSpec {

  test("unit: the audit flags ambiguity, honors limits, peels projections") {
    import spark.implicits._
    val df = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30)).toDF("k", "s", "v")

    // distinct rows tied on the sort key → ambiguous
    assert(!OrderAudit.audit(spark, df.orderBy($"k")).ok)
    // a unique key → total order
    assert(OrderAudit.audit(spark, df.orderBy($"k", $"s")) == TotalOrder)
    // ties distinguishable only by a column the top projection DROPS are
    // not real ambiguity: the visible rows are identical
    assert(OrderAudit.audit(spark, df.orderBy($"k", $"s").select($"k", $"s")) == TotalOrder)
    assert(!OrderAudit.audit(spark, df.orderBy($"k").select($"k", $"v")).ok)
    // ...but identical visible rows ARE fine even when tied
    assert(OrderAudit.audit(spark, df.orderBy($"k").select($"k")) == TotalOrder)
    // tie group wholly beyond the LIMIT cut can't reach the output
    val tailTied = Seq((1, "x"), (2, "y"), (3, "a"), (3, "b")).toDF("k", "s")
    assert(OrderAudit.audit(spark, tailTied.orderBy($"k").limit(2)) == TotalOrder)
    // tie group straddling the boundary: which row survives is scheduler's
    assert(!OrderAudit.audit(spark, tailTied.orderBy($"k").limit(3)).ok)
    // no sort at all
    assert(!OrderAudit.audit(spark, df).ok)
    // ≤1-row shapes are vacuously ordered
    assert(OrderAudit.audit(spark, df.agg(Map("v" -> "sum"))) == MaxOneRow)
    assert(OrderAudit.audit(spark, df.orderBy($"k").limit(0)) == LimitZero)
  }

  test("every catalog entry's output order is TOTAL at sf0.001") {
    spark.catalog.clearCache()
    val offenders = OrderAudit.auditCatalog(spark, "/root/testdata/sf0.001")
    assert(offenders.isEmpty,
      "entries whose sort keys do not form a row key (extend the ORDER BY " +
        s"in both the entry and its oracle): $offenders")
  }
}
