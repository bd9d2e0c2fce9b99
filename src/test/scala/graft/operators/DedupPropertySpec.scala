package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded generative invariants for the dedup family — the operators the
  * SQL differential fuzzer structurally can't reach (their kernels aren't
  * a grammar production; their oracles are bespoke CTE chains). Each
  * property runs over several seeded random corpora and checks the
  * operator against a driver-side reference computation, so a kernel bug
  * has to fool an independent implementation, not a fixed fixture.
  *
  * Sample counts are deliberately small (Spark jobs, not pure functions):
  * 4-6 corpora per property, distinct seeds, documented shapes. */
class DedupPropertySpec extends SparkSpec {

  private val vocab = Vector("red", "blue", "green", "fast", "slow", "spark",
    "table", "row", "scan", "merge", "batch", "join", "agg", "window")

  /** Random corpus: base docs + exact copies + one-word perturbations. */
  private def corpus(seed: Int, nBase: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    def doc() = Seq.fill(5 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0 until nBase).map(i => doc())
    val copies = (0 until nBase / 2).map(_ => base(rng.nextInt(nBase)))
    val perturbed = (0 until nBase / 3).map { _ =>
      val t = base(rng.nextInt(nBase)).split(" ")
      t.updated(rng.nextInt(t.length), vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    (base ++ copies ++ perturbed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("exact dedup is a partition: one survivor per distinct text, min-id representative, counts add up") {
    import spark.implicits._
    for (seed <- Seq(11, 12, 13, 14)) {
      val rows = corpus(seed, 30)
      val docs = rows.toDF("doc_id", "text").repartition(7)
      val byText = rows.groupBy(_._2)
      val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
      assert(groups.map(_.getAs[Long]("n_copies")).sum === rows.size.toLong, s"seed=$seed")
      assert(groups.length === byText.size, s"seed=$seed distinct-text count")
      val survivors = Dedup.exact(docs, "text", "doc_id")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val wantSurvivors = byText.values.map(_.map(_._1).min).toSet
      assert(survivors === wantSurvivors, s"seed=$seed min-id survivors")
    }
  }

  test("minhash clusters: exact duplicates always share a cluster; labels are min-of-cluster ids") {
    import spark.implicits._
    for (seed <- Seq(21, 22, 23, 24)) {
      val rows = corpus(seed, 24)
      val docs = rows.toDF("doc_id", "text").repartition(5)
      val got = Dedup.minhashClusters(docs, "text", "doc_id")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
      assert(got.keySet === rows.map(_._1).toSet, s"seed=$seed total labeling")
      // identical texts MUST co-cluster (identical signature, same buckets)
      rows.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
        val labels = grp.map(g => got(g._1)).toSet
        assert(labels.size === 1, s"seed=$seed exact dups split: $grp -> $labels")
      }
      // every label is itself a doc in the same cluster, and is minimal
      // within the docs that carry it (one-hop representative contract)
      got.groupBy(_._2).foreach { case (rep, members) =>
        assert(members.keySet.min >= rep && got.contains(rep), s"seed=$seed rep=$rep")
      }
    }
  }

  test("connectedComponents equals a driver-side union-find on random graphs (incl. a deep chain)") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to canonical minimum (labels are min-of-component
      // by construction: unions always point larger root at smaller)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val shapes = Seq(
      (31, 60, 40),  // random sparse
      (32, 60, 90),  // random denser
      (33, 50, 0)    // no edges: every node its own component
    )
    for ((seed, n, m) <- shapes) {
      val rng = new scala.util.Random(seed)
      val edges = (0 until m).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = (0L until n.toLong).toDF("id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(n, edges), s"seed=$seed n=$n m=$m")
    }
    // deep chain: diameter 48 forces real pointer-jumping rounds
    val chain = (0L until 48L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents((0L to 48L).toDF("id"), chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(0L), "a single chain is one component labeled 0")
  }

  test("exactSubstringSpans: fractions bounded, exact copies fully duplicated, unique docs absent") {
    import spark.implicits._
    for (seed <- Seq(41, 42, 43)) {
      val rng = new scala.util.Random(seed)
      def doc(len: Int) = Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      // long unique-ish docs + one exact-copy family of 3
      val uniques = (0 until 8).map(i => (i.toLong, doc(40 + rng.nextInt(20))))
      val copied = doc(30)
      val fam = (100 until 103).map(i => (i.toLong, copied))
      val docs = (uniques ++ fam).toDF("doc_id", "text").repartition(3)
      val out = Dedup.exactSubstringSpans(docs, "text", "doc_id", k = 13)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("dup_token_frac")).toMap
      out.values.foreach(f => assert(f >= 0.0 && f <= 1.0, s"seed=$seed frac=$f"))
      // each member of the copy family: every window occurs >= 3 times
      // corpus-wide, so the merged span covers the whole doc
      fam.foreach { case (id, _) =>
        assert(out.get(id).contains(1.0), s"seed=$seed copy doc $id should be fully duplicated")
      }
      // unique docs never share a 13-gram (14-word vocab, ~50 windows:
      // collision odds ~14^-13) and must not appear in the span table
      uniques.foreach { case (id, _) =>
        assert(!out.contains(id), s"seed=$seed unique doc $id has a span")
      }
    }
  }

  test("simhash clusters: identical texts co-cluster; labeling is total and idempotent under repartition") {
    import spark.implicits._
    val rows = corpus(51, 20)
    val docs = rows.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.simhashClusters(df, "text", "doc_id")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    val a = run(docs.repartition(3))
    val b = run(docs.repartition(11))
    assert(a === b, "partitioning must not change cluster labels")
    assert(a.keySet === rows.map(_._1).toSet)
    rows.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      assert(grp.map(g => a(g._1)).toSet.size === 1, s"exact dups split: $grp")
    }
  }
}
