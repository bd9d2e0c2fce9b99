package graft

/** Golden EXPLAIN shapes (reference: explain-level{0..3}.test pins the
  * rendered plan per level). Two things are pinned here:
  *
  *  1. the LEVEL CONTRACT — each of the four levels exposes the sections
  *     the reference's corresponding level does (minimal physical plan →
  *     full logical history → costs → formatted operator list);
  *  2. the POSITIVE PLAN SHAPE for the flagship join (q3_join), making
  *     the PLANS_r*.md audits executable: both dimension joins broadcast,
  *     predicates reach the parquet scan, the ORDER BY+LIMIT is a TopN
  *     (not a global sort), and the aggregation's shuffle is the ONLY
  *     hash-partitioned exchange. A regression that drops a broadcast,
  *     un-pushes a filter, or sneaks in an extra shuffle fails here
  *     instead of waiting for a manual audit. */
class GoldenExplainSpec extends SparkSpec {

  private lazy val q3 = queries.Joins.q3Join(spark, "/root/testdata/sf0.001")

  test("level 0 is the minimal physical plan") {
    val s = Options.explain(q3, 0)
    assert(s.contains("== Physical Plan =="))
    assert(!s.contains("== Optimized Logical Plan =="), "level 0 must stay minimal")
  }

  test("level 1 adds the full logical plan history") {
    val s = Options.explain(q3, 1)
    for (section <- Seq("== Parsed Logical Plan ==", "== Analyzed Logical Plan ==",
        "== Optimized Logical Plan ==", "== Physical Plan =="))
      assert(s.contains(section), s"missing $section")
  }

  test("level 2 carries cost statistics") {
    val s = Options.explain(q3, 2)
    assert(s.contains("Statistics("), "cost mode must render stats")
  }

  test("level 3 is the formatted operator list with per-operator detail") {
    val s = Options.explain(q3, 3)
    assert(s.contains("(1) Scan parquet"), "formatted mode numbers operators")
    // per-operator detail sections (codegen ids only materialize once AQE
    // finalizes the plan, so the pre-execution golden pins Output/Arguments)
    assert(s.contains("Output [") && s.contains("Arguments:"),
      "formatted mode must render the per-operator detail blocks")
  }

  test("TPC-DS star shape: both dims broadcast, range filter pushed AND propagated") {
    val s = Options.explain(
      queries.TpcdsShapes.qDs3Star(spark, "/root/testdata/sf0.001"), 0)
    assert("BroadcastHashJoin".r.findAllIn(s).size === 2,
      "orders and part must both broadcast against the lineitem fact")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"))
    // the fact's orderkey-range OR filter reaches the lineitem scan...
    assert(s.contains("PushedFilters: [Or(Or(And(GreaterThanOrEqual(l_orderkey,100)"),
      "fact key-range filter must be pushed to the fact scan")
    // ...and constraint propagation applies the same ranges to the orders
    // dim scan through the join key (partition-pruning analogue)
    assert(s.contains("Or(Or(And(GreaterThanOrEqual(o_orderkey,100)"),
      "range filter must propagate to the joined dimension scan")
    // column pruning: the fact reads exactly the 3 needed columns
    assert(s.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_extendedprice:double>"))
    assert("Exchange hashpartitioning".r.findAllIn(s).size === 1,
      "exactly one shuffle: the aggregation")
  }

  // ---- rewrite-family pins (reference PlannerTest parity: -------------
  // predicate-propagation.test / subquery-rewrite.test / analytic-fns.test)

  test("predicate propagation: dim key range reaches the fact scan through the join") {
    // reference predicate-propagation.test: a predicate on one side of a
    // join equivalence class must be derived for the other side. The DS3
    // pin covers fact→dim; this pins dim→fact.
    Tables.ensureViews(spark, "/root/testdata/sf0.001")
    val s = Options.explain(spark.sql(
      """SELECT count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderkey BETWEEN 100 AND 200"""), 0)
    assert(s.contains("GreaterThanOrEqual(l_orderkey,100)") &&
      s.contains("LessThanOrEqual(l_orderkey,200)"),
      "orders' key range must be derived for lineitem and pushed to its scan")
  }

  test("subquery decorrelation: EXISTS/NOT EXISTS plan as semi/anti joins, no nested loop") {
    // reference subquery-rewrite.test: correlated subqueries must rewrite
    // to joins. q4 = correlated EXISTS; q21 = EXISTS + NOT EXISTS pair.
    val q4 = Options.explain(
      queries.TpchShapes.q4Exists(spark, "/root/testdata/sf0.001"), 0)
    assert(q4.contains("LeftSemi"), "correlated EXISTS must plan as a semi join")
    val q21 = Options.explain(
      queries.TpchShapes2.q21WaitingSupplier(spark, "/root/testdata/sf0.001"), 0)
    assert(q21.contains("LeftSemi"), "EXISTS must plan as a semi join")
    assert(q21.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    for (s <- Seq(q4, q21)) {
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        "decorrelation must never fall back to a nested-loop/cartesian plan")
    }
  }

  test("analytic coalescing: same-spec window functions share one sort and shuffle") {
    // reference analytic-fns.test: multiple analytic functions over one
    // (partition, order) spec must evaluate in a single sort group.
    Tables.ensureViews(spark, "/root/testdata/sf0.001")
    val s = Options.explain(spark.sql(
      """SELECT l_orderkey, l_linenumber,
                RANK() OVER (PARTITION BY l_returnflag
                             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rnk,
                LAG(l_quantity, 1) OVER (PARTITION BY l_returnflag
                             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty,
                SUM(l_extendedprice) OVER (PARTITION BY l_returnflag
                             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS run_sum
         FROM lineitem"""), 0)
    assert("Window ".r.findAllIn(s).size === 1,
      "three same-spec analytic functions must share ONE Window operator")
    assert("Sort ".r.findAllIn(s).size === 1,
      "the shared window spec must sort exactly once")
    assert("Exchange hashpartitioning".r.findAllIn(s).size === 1,
      "one partitioning exchange serves the whole analytic group")
  }

  test("q3_join physical shape: broadcasts, pushdown, TopN, single shuffle") {
    val s = Options.explain(q3, 0)
    assert("BroadcastHashJoin".r.findAllIn(s).size === 2,
      "both dimension joins must broadcast (orders, customer builds)")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"))
    // the shipdate range predicate reaches the lineitem parquet scan
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      "lineitem filter must be pushed to the scan")
    // ORDER BY + LIMIT plans as TopN, never a global sort
    assert(s.contains("TakeOrderedAndProject"))
    assert(!s.contains("Sort ["), "no global sort may appear")
    // the grouped aggregation is the only hash-partitioned exchange
    assert("Exchange hashpartitioning".r.findAllIn(s).size === 1,
      "exactly one shuffle: the aggregation")
  }
}
