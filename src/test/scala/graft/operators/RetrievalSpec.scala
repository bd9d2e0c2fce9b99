package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 top-k — binding properties: the score formula against a
  * hand-derivable reference computation, partitioning invariance of the
  * decimal-summed scores (the whole point of the decimal routing), rank
  * semantics (score desc, doc_id asc), and the bounded-front plan. */
class RetrievalSpec extends SparkSpec {

  private def refScore(terms: Seq[(Long, Int)], n: Long, dfs: Map[String, Long],
      tfs: Seq[(String, Long)], dl: Int, avgdl: Double): BigDecimal =
    tfs.map { case (t, tf) =>
      val idf = math.log(1.0 + ((n - dfs(t)) + 0.5) / (dfs(t) + 0.5))
      val w = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      BigDecimal(idf * w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum

  test("matches a hand-computed BM25 reference on a three-document corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple apple apple apple")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", Seq(1 -> "apple cherry"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getAs[Number]("rank").intValue(), r.getDecimal(3)))
      .sortBy(_._3)

    val n = 3L
    val dfs = Map("apple" -> 2L, "cherry" -> 1L)
    val avgdl = (3 + 2 + 4) / 3.0
    val want = Map(
      1L -> refScore(Nil, n, dfs, Seq("apple" -> 2L), 3, avgdl),
      2L -> refScore(Nil, n, dfs, Seq("cherry" -> 1L), 2, avgdl),
      3L -> refScore(Nil, n, dfs, Seq("apple" -> 4L), 4, avgdl))

    assert(out.map(_._2).toSeq === Seq(2L, 3L, 1L),
      "rank order must be score desc (cherry is rare, d3 has the densest apple run)")
    out.foreach { case (_, doc, _, score) =>
      assert(BigDecimal(score).setScale(6) === want(doc).setScale(6), s"doc $doc")
    }
  }

  test("decimal-summed scores are partitioning-invariant; ties break doc_id asc") {
    import spark.implicits._
    // 40 docs over a tiny vocabulary: plenty of exact score ties
    val docs = (1L to 40L).map(i => (i, Seq.fill((i % 3).toInt + 1)("red blue").mkString(" ")))
      .toDF("doc_id", "text")
    val q = Seq(7 -> "red")
    val a = Retrieval.bm25TopK(docs, "text", "doc_id", q, 15)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getAs[Number]("rank").intValue(),
        r.getDecimal(3).toPlainString)).toSet
    val b = Retrieval.bm25TopK(docs.repartition(13), "text", "doc_id", q, 15)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getAs[Number]("rank").intValue(),
        r.getDecimal(3).toPlainString)).toSet
    assert(a === b)
    // within an exact-score tie class, ranks ascend with doc_id
    val byScore = a.toSeq.groupBy(_._4)
    byScore.values.foreach { grp =>
      val sorted = grp.sortBy(_._3)
      assert(sorted.map(_._2) === sorted.map(_._2).sorted, s"tie class $grp")
    }
  }

  test("documents without any query term never appear; k bounds each query") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha alpha"),
      (4L, "epsilon zeta"), (5L, "beta")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq(1 -> "alpha", 2 -> "beta gamma"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out.map(_._1) === Set(1, 2))
    assert(!out.contains((1, 2L)) && !out.contains((1, 4L)), "no-hit docs must not rank")
    val perQuery = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.values.forall(_ <= 2))
  }

  test("plan: bounded top-k front (no Window over scored docs), broadcast term pruning") {
    import spark.implicits._
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(docs, "text", "doc_id", Seq(1 -> "x"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
