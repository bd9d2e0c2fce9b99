package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `heavy_hitters` — the Misra-Gries frequency summary behind
  * `q_vocab_topk_approx`. Binding properties: the MG error contract
  * (est ≤ true ≤ est + (N−M)/(m+1), every frequent item present), exact
  * equivalence of the sketch+re-count path with the exact top-k on the
  * real corpus, partial-merge correctness across many partitions, and
  * the fail-loud assert when the capacity cannot certify exactness. */
class HeavyHittersSpec extends SparkSpec {

  private def summarize(df: org.apache.spark.sql.DataFrame, m: Int) = df
    .agg(call_function("heavy_hitters", col("item"), lit(m)).as("hh"),
      count(col("item")).as("n"))
    .select(col("n"), explode(col("hh")).as("s"))
    .select(col("n"), col("s.item").as("item"), col("s.est").as("est"))
    .collect()

  test("MG contract on skewed data: undercount bounded by (N-M)/(m+1); every frequent item retained") {
    import spark.implicits._
    // Zipf-ish: item i appears (1000 / (i+1)) times, plus a long tail of
    // singletons — the shape the sketch exists for.
    val rows = (0 until 50).flatMap(i => Seq.fill(1000 / (i + 1))(s"hot_$i")) ++
      (0 until 3000).map(i => s"tail_$i")
    val df = rows.toDF("item").repartition(17)
    val m = 64
    val out = summarize(df, m)
    val n = out.head.getLong(0)
    assert(n === rows.size.toLong)
    val est = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est.size <= m)
    val retained = est.values.sum
    val eps = (n - retained).toDouble / (m + 1)
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // est never overcounts, and undercounts by at most eps
    est.foreach { case (k, e) =>
      assert(e <= truth(k), s"$k overcounted: est=$e true=${truth(k)}")
      assert(truth(k) - e <= eps + 1e-9, s"$k undercount ${truth(k) - e} > eps=$eps")
    }
    // containment: anything truly above eps must be in the summary
    truth.filter(_._2 > eps).keys.foreach { k =>
      assert(est.contains(k), s"frequent item $k (true=${truth(k)} > eps=$eps) missing")
    }
  }

  test("distinct universe within capacity: the summary is exact") {
    import spark.implicits._
    val rows = (0 until 2000).map(i => s"k_${i % 40}")
    val df = rows.toDF("item").repartition(9)
    val out = summarize(df, 64)
    val est = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est.size === 40)
    assert(est.values.forall(_ === 50L))
  }

  test("nulls are ignored; long items serialize through the partial merge") {
    import spark.implicits._
    val df = ((0 until 300).map(i => Some((i % 10).toLong)) ++ Seq.fill(50)(Option.empty[Long]))
      .toDF("item").repartition(13)
    val out = summarize(df, 16)
    assert(out.head.getLong(0) === 300L) // count(col) skips nulls like the sketch
    val est = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(est === (0L until 10L).map(_ -> 30L).toMap)
  }

  test("q_vocab_topk_approx equals the exact q_vocab_topk on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.LlmOps.qVocabTopk(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val approx = graft.queries.LlmOps.qVocabTopkApprox(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(approx.length === exact.length)
    assert(approx.toSet === exact.toSet)
  }

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

  test("fail-loud: a capacity too small to certify exactness raises instead of returning wrong rows") {
    import spark.implicits._
    // near-uniform universe far above the capacity: no candidate's exact
    // count can clear the containment bound — and depending on partition
    // layout the MG merges may cancel to an EMPTY summary (all counts at
    // the subtraction threshold), so the certification must fire from the
    // always-present cert row, not from per-row asserts that vacuously
    // pass when the front has no rows (caught under local-cluster, where
    // 32 partial buffers produced exactly that empty-summary regime).
    val docs = (0 until 4000).map(i => (i.toLong, s"u$i v${i % 2000} w${(i * 7) % 2000}"))
      .toDF("doc_id", "text")
    for (m <- Seq(5, 8, 64)) {
      val gated = graft.operators.TextAnalysis.vocabularyCertified(docs, "text", m.min(5), m)
      val e = intercept[Exception] { gated.collect() }
      assert(messages(e).exists(_.contains("certify")), s"m=$m: ${e.toString}")
    }
  }

  test("certification accepts the exact-regime edge: universe within capacity, fewer rows than k") {
    import spark.implicits._
    // 12 distinct tokens, k=100 > distinct: eps == 0 (no decrement ever
    // happened), so a short result is provably exact and must NOT raise.
    val docs = (0 until 600).map(i => (i.toLong, s"a${i % 12} a${i % 3}"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.vocabularyCertified(docs, "text", 100, 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = graft.operators.TextAnalysis.vocabulary(docs, "text", 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet === want.toSet)
    assert(got.length === 12)
  }

  test("plan: partial ObjectHashAggregate — the exchange carries bounded summaries, not tokens") {
    import spark.implicits._
    val df = Seq("a", "b", "a").toDF("item")
    val plan = df.agg(call_function("heavy_hitters", col("item"), lit(4)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial"), plan)
  }
}
