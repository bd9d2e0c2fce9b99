package graft

/** Executable pins for the reference's remaining planner-test families
  * (`testdata/workloads/functional-planner/queries/PlannerTest/&lt;name&gt;.test`),
  * one test per file, completing the PlannerTest parity started in
  * GoldenExplainSpec (predicate-propagation / subquery-rewrite /
  * analytic-fns live there):
  *
  *   - join-order.test        — cost, not written FROM order, picks the build side
  *   - implicit-joins.test    — comma joins: equi preds become hash joins,
  *                              non-equi preds ride a nested-loop join (never a
  *                              bare cartesian that filters later)
  *   - inline-view-limit.test — a LIMIT inside a view is a pushdown barrier;
  *                              without it the filter reaches the scan
  *   - small-query-opt.test   — a bare tiny LIMIT never shuffles (Spark's
  *                              CollectLimit incremental-scan analogue of the
  *                              reference's coordinator-only execution)
  *   - constant.test          — constant folding happens at plan time, both in
  *                              projections and inside pushed-down predicates
  *   - outer-joins.test       — a null-rejecting WHERE on the nullable side
  *                              simplifies LEFT OUTER to INNER
  *   - union.test             — filters push through UNION ALL into every branch
  *   - distinct-estimate.test — ndv() plans as a streaming sketch aggregate
  *                              (no Expand, one partial/final pair)
  *
  * Like GoldenExplainSpec, a regression that re-orders a join badly,
  * un-pushes a filter, or materializes an estimate exactly fails HERE
  * instead of waiting for a manual plan audit. */
class PlannerFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def explain0(sql: String): String = {
    Tables.ensureViews(spark, sf)
    Options.explain(spark.sql(sql), 0)
  }

  test("join-order: the small side builds regardless of written FROM order") {
    // reference join-order.test: the planner re-orders so the big table
    // streams and the small one builds; syntax must not decide.
    val dimFirst = explain0(
      """SELECT s_name, count(*) AS cnt
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         GROUP BY s_name""")
    assert(dimFirst.contains("BroadcastHashJoin") && dimFirst.contains("BuildLeft"),
      "supplier written first: the dim must still be the (broadcast) build side")
    val factFirst = explain0(
      """SELECT s_name, count(*) AS cnt
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name""")
    assert(factFirst.contains("BroadcastHashJoin") && factFirst.contains("BuildRight"),
      "fact written first: the dim must still be the (broadcast) build side")
    for (s <- Seq(dimFirst, factFirst))
      assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"))
  }

  test("implicit joins: comma syntax plans equi preds as hash joins, non-equi as NLJ with the predicate") {
    // reference implicit-joins.test: t1, t2 WHERE t1.k = t2.k is a hash
    // join; a non-equi-only predicate becomes a nested-loop join carrying
    // the predicate, never an unconditioned cartesian filtered later.
    val equi = explain0(
      """SELECT n_name, r_name FROM region, nation
         WHERE r_regionkey = n_regionkey""")
    assert(equi.contains("BroadcastHashJoin"),
      "comma join with an equality predicate must plan as a hash join")
    val nonEqui = explain0(
      """SELECT a.n_name, b.n_name FROM nation a, nation b
         WHERE a.n_nationkey < b.n_nationkey""")
    assert(nonEqui.contains("BroadcastNestedLoopJoin"),
      "non-equi comma join must plan as a nested-loop join")
    assert(nonEqui.contains("(n_nationkey"),
      "the range predicate must ride the join, not a post-hoc filter")
    assert(!nonEqui.contains("CartesianProduct"))
  }

  test("inline-view limit: LIMIT is a pushdown barrier; without it the filter reaches the scan") {
    // reference inline-view-limit.test: predicate pushdown is prevented in
    // presence of a limit clause (limit-then-filter != filter-then-limit).
    val barred = explain0(
      """SELECT * FROM (SELECT * FROM orders LIMIT 10) t
         WHERE o_orderkey < 5""")
    assert(!barred.contains("PushedFilters: [IsNotNull(o_orderkey)"),
      "the filter must NOT cross the inner LIMIT into the scan")
    assert(barred.contains("Filter") && barred.contains("Limit"),
      "the plan must keep a Filter above the inner Limit")
    val free = explain0(
      """SELECT * FROM (SELECT * FROM orders) t WHERE o_orderkey < 5""")
    assert(free.contains("LessThan(o_orderkey,5)"),
      "without the limit the same filter must reach the parquet scan")
  }

  test("small-query opt: a bare tiny LIMIT never shuffles") {
    // reference small-query-opt.test: a small limit runs coordinator-only;
    // the Spark analogue is CollectLimit's incremental partition scan —
    // either way, no exchange may appear.
    val s = explain0("SELECT * FROM nation LIMIT 5")
    assert(s.contains("CollectLimit"),
      "a bare LIMIT must plan as CollectLimit (incremental scan)")
    assert(!s.contains("Exchange"), "a tiny bare LIMIT must not shuffle")
  }

  test("constant folding reaches projections and pushed predicates") {
    // reference constant.test: constant expressions evaluate at plan time.
    val proj = Options.explain(spark.sql("SELECT 1 + 1 AS x"), 0)
    assert(proj.contains("[2 AS x"), "1+1 must fold to 2 in the plan")
    assert(proj.contains("OneRowRelation") && !proj.contains("Scan parquet"))
    val pred = explain0(
      "SELECT count(*) AS n FROM orders WHERE o_orderkey < 10 + 20")
    assert(pred.contains("LessThan(o_orderkey,30)"),
      "10+20 must fold to 30 INSIDE the pushed-down scan filter")
  }

  test("outer-join simplification: null-rejecting WHERE turns LEFT OUTER into INNER") {
    // reference outer-joins.test: predicates in WHERE (vs ON) evaluate
    // after the join, and a null-rejecting one licenses the rewrite.
    val s = explain0(
      """SELECT count(*) AS n
         FROM orders o LEFT JOIN customer c ON o_custkey = c_custkey
         WHERE c.c_mktsegment = 'BUILDING'""")
    assert(s.contains("Inner"), "the outer join must simplify to inner")
    assert(!s.contains("LeftOuter"), "no residual outer join may remain")
    // and the now-inner build side gets the dim filter pushed to its scan
    assert(s.contains("EqualTo(c_mktsegment,BUILDING)"),
      "the WHERE filter must reach the customer scan after simplification")
  }

  test("union: filters push through UNION ALL into every branch") {
    // reference union.test: a predicate above a union applies per-branch
    // (partition-pruning analogue: each side scans only what it must).
    val s = explain0(
      """SELECT k FROM (
           SELECT o_orderkey AS k FROM orders
           UNION ALL
           SELECT l_orderkey AS k FROM lineitem
         ) u WHERE k < 100""")
    assert(s.contains("Union"))
    assert(s.contains("LessThan(o_orderkey,100)"),
      "the filter must reach the orders branch's scan")
    assert(s.contains("LessThan(l_orderkey,100)"),
      "the filter must reach the lineitem branch's scan")
  }

  test("aggregation: map-side partial combine below the shuffle, merge above") {
    // reference aggregation.test DISTRIBUTEDPLAN: AGGREGATE below the hash
    // exchange, AGGREGATE [FINALIZE] with :merge functions above. This is
    // THE property that keeps a 100 TB groupBy from shuffling raw rows.
    val s = explain0(
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS qty
         FROM lineitem GROUP BY l_returnflag""")
    assert("HashAggregate".r.findAllIn(s).size === 2,
      "exactly one partial/final aggregate pair")
    assert(s.contains("partial_count(1)") && s.contains("partial_sum"),
      "the pre-shuffle aggregate must compute partial states (map-side combine)")
    assert("Exchange hashpartitioning".r.findAllIn(s).size === 1,
      "one shuffle, carrying partial states only")
  }

  test("distinct aggregation: pre-shuffle dedup, two phases (distinct.test)") {
    // reference distinct.test: count(DISTINCT x) plans as dedup-by-x (with
    // a map-side partial dedup) then count — never raw rows to one node.
    val s = explain0("SELECT count(DISTINCT o_custkey) AS u FROM orders")
    assert("HashAggregate".r.findAllIn(s).size === 4,
      "two phases of two: dedup pair on the key, then count pair")
    assert(s.contains("keys=[o_custkey"),
      "phase 1 must group by the distinct key (map-side dedup)")
    assert("Exchange hashpartitioning".r.findAllIn(s).size === 1,
      "the only hash shuffle carries deduped keys")
    assert(!s.contains("Expand"), "single-distinct must not expand rows")
  }

  test("stress self-join: both fact joins sort-merge, full-key re-cluster, map-side distinct dedup") {
    // targeted-stress agg_stress shape (q_stress_selfjoin): with no
    // broadcastable side (threshold off = the 100 TB posture), both joins
    // must be sort-merge; the orderkey join shuffles its two legs on
    // l_orderkey and the 3-key join re-clusters BOTH inputs on the full
    // (orderkey, price, shipdate) set — Spark's all-cluster-keys
    // co-partition rule, which keeps per-key fan-in bounded instead of
    // concentrating every orderkey's cross product on one reducer. The
    // count(DISTINCT) must dedup map-side below its own shuffle, and the
    // tax filter must reach the two filtered scans with the unfiltered
    // leg pruned to its 3 join columns.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val s = explain0(SparkEntry.oracleSql("q_stress_selfjoin"))
      assert("SortMergeJoin".r.findAllIn(s).size === 2,
        "both fact joins must be sort-merge (nothing broadcastable)")
      assert("Exchange hashpartitioning\\(l_orderkey#\\d+L, \\d".r.findAllIn(s).size === 2,
        "the orderkey join shuffles exactly its two filtered legs")
      assert("Exchange hashpartitioning\\(l_orderkey#\\d+L, knownfloat".r.findAllIn(s).size === 2,
        "the 3-key join re-clusters both inputs on the full key set")
      assert("LessThan\\(l_tax,0.05\\)".r.findAllIn(s).size === 2,
        "the tax filter must reach both filtered parquet scans")
      assert(s.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate:timestamp_ntz>"),
        "the unfiltered leg must prune to exactly its 3 join columns")
      assert(s.contains("HashAggregate(keys=[knownfloat") ||
             s.contains("HashAggregate(keys=[l_extendedprice"),
        "count(DISTINCT) must dedup map-side below its shuffle")
      assert(!s.contains("CartesianProduct") && !s.contains("NestedLoop"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("distinct estimate: ndv() plans as a streaming sketch, no Expand, one agg pair") {
    // reference distinct-estimate.test: ndv() must not plan like exact
    // DISTINCT (no duplicate-elimination pre-aggregation).
    val s = explain0("SELECT ndv(o_custkey) AS est FROM orders")
    assert(s.contains("approx_count_distinct"),
      "ndv must plan as the HLL sketch aggregate")
    assert(!s.contains("Expand"), "no Expand: ndv is not exact-distinct")
    assert("HashAggregate".r.findAllIn(s).size === 2,
      "exactly one partial/final aggregate pair")
    assert("Exchange".r.findAllIn(s).size === 1,
      "one single-partition exchange merges the sketches")
  }
}
