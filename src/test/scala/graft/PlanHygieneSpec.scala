package graft

/** Catalog-wide scale-killer detector: compiles every SparkEntry query's
  * physical plan at sf0.001 and asserts no CartesianProduct anywhere and
  * no BroadcastNestedLoopJoin outside the explicit allowlist below. A
  * future regression that silently degrades an equi-join to a
  * nested-loop/cartesian plan (dropped join key, non-equi rewrite,
  * broadcast of an unbounded side) fails here instead of surfacing as an
  * OOM at scale. Plans are only compiled, not executed, so the whole
  * catalog checks in seconds. */
class PlanHygieneSpec extends SparkSpec {

  /** Entries whose nested-loop join is the DESIGN, each with a bounded
    * build side by construction:
    * - q_join_cross: the §2.3 CROSS JOIN component itself (5×25 dims);
    * - q_sim_search / q_sim_search_lsh / q_sim_search_ivf: the exact
    *   brute-force kernel broadcasts the small QUERY set over the corpus
    *   (one pass, documented 100 TB shape — the ANN variants embed it as
    *   their oracle-checked exact side);
    * - q_dedup_cosine: the exact pair kernel, contract-bounded by the
    *   caller (the production path is the LSH bucket equi-join). */
  private val allowedNestedLoop = Set(
    "q_join_cross", "q_sim_search", "q_sim_search_lsh", "q_sim_search_ivf",
    "q_dedup_cosine")

  test("no entry plans a cartesian product or an unexpected nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad =
        (if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (plan.contains("BroadcastNestedLoopJoin") && !allowedNestedLoop(name))
           Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
      bad
    }
    assert(offenders.isEmpty, s"scale-killer plans: ${offenders.mkString("; ")}")
  }
}
