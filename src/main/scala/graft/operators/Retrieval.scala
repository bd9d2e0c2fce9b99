package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text retrieval over the documents shape: BM25 (Robertson/Spärck Jones)
  * relevance scoring with bounded per-query top-k.
  *
  * The reference engine has no retrieval surface (SURVEY §2 stops at SQL);
  * this is extension surface for the training-data use case: given seed
  * queries describing a target domain, score every document and keep the
  * best k per query (targeted upsampling / seed-relevance filtering — the
  * lexical twin of the embedding ANN family in [[Similarity]]).
  *
  * Scale shape (the 100 TB argument):
  *  - per-doc length (dl) comes from the SAME projection that tokenizes —
  *    no doc-keyed shuffle for corpus statistics; N and avgdl are one
  *    single-row aggregate;
  *  - the token stream is filtered by a BROADCAST of the query-term set
  *    BEFORE the tf groupBy, so the only corpus-sized exchange carries
  *    (doc, matched-term) rows — documents without query terms never
  *    shuffle at all;
  *  - df/idf live on a per-term relation (≤ |query terms| rows, broadcast
  *    back), and the final ranking is [[graft.functions.TopKFront]], so
  *    the last exchange carries bounded fronts instead of every scored
  *    document.
  *
  * Determinism / oracle parity: per-term scores are doubles (one `ln` per
  * term — transcendentals are libm-dependent across builds, the repo's r2
  * lesson), but each term score is cast to DECIMAL(28,6) BEFORE the
  * per-document sum. Decimal addition is exact and associative, so the
  * document score is independent of partitioning and summation order in
  * both engines; ranking then happens on those exact decimals (ties break
  * on doc_id, and equal decimals are equal in both engines — unlike raw
  * double sums, whose last bits depend on add order). A one-ulp libm
  * difference only matters if a term score sits within ~1e-16 of a 1e-6
  * rounding midpoint.
  */
object Retrieval {

  private val TOKEN_SPLIT = "[^a-z0-9']+"

  /** BM25 top-k per query. `queries` is a small in-memory seed list —
    * (query_id, text) — broadcast throughout; k1 = 1.2, b = 0.75 (the
    * standard defaults, folded into the expression as 2.2/1.2/0.25/0.75).
    * Returns (query_id, doc_id, rank, score: decimal(38,6)). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, String)], k: Int): DataFrame = {
    require(k > 0, s"need positive k, got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    // Per-doc length WITHOUT materializing the token array (r12): dl is
    // the number of maximal token runs, i.e. one codegen'd regexp_count —
    // identical to len(filter(split(...), length > 0)) by construction
    // (split's separators are exactly the non-token runs). The old form
    // built the array through an interpreted higher-order `filter` per
    // doc; the stats pass below consumed a full tokenize for one integer.
    val dl = regexp_count(lower(col(textCol)), lit("[a-z0-9']+"))
    val base = docs.select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"), dl.as("dl"))

    // corpus stats: one row. avgdl spelled as exact-sum / count so both
    // engines do ONE correctly-rounded double division of exact integers
    // (a running-mean AVG implementation would not be bit-mirrorable).
    // This pass now reads (doc_id, dl) only — one regex count per doc,
    // no token array.
    val stats = base.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    // query terms, tokenized exactly like the corpus
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(lower(col("qtext")), TOKEN_SPLIT)).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val terms = qterms.select(col("token")).distinct()

    // tf over query terms ONLY: the broadcast join prunes the exploded
    // stream before the groupBy, so non-matching tokens never shuffle.
    // dl rides in the grouping key (functionally dependent on doc_id).
    // Both the scoring join and the df aggregate consume tf, but the two
    // subtrees are canonically identical below the tf exchange, so
    // ReuseExchange computes the corpus scan + tokenize ONCE and both
    // branches read the same shuffle output (verified in the AQE-final
    // plan: one ReusedExchange, single corpus scan). No persist: an
    // unreleased MEMORY_AND_DISK cache here leaked blocks for the
    // SparkContext lifetime across soak iterations (r10 ADVICE), and the
    // reuse gives the same single-scan property for free.
    // empty tokens are dropped AFTER the explode (a codegen'd Filter on
    // the generated rows) rather than by an interpreted higher-order
    // array filter before it — same token multiset, no lambda dispatch
    val tf = base
      .select(col("doc_id"), col("dl"), explode(split(col("t"), TOKEN_SPLIT)).as("token"))
      .filter(length(col("token")) > 0)
      .join(broadcast(terms), Seq("token"))
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // sum(least(tf, 1)), not count(*): the VALUE is identical — tf >= 1 on
    // every grouped row, so least(tf, 1) is the constant 1 and the sum is
    // the row count — but the tf reference keeps this branch's subtree
    // below the tf exchange byte-identical to the scoring branch's, so
    // ReuseExchange computes the corpus scan + tokenize + explode ONCE.
    // With count(*) (or even count(tf), which Catalyst rewrites to
    // count(1) on the non-nullable column and then prunes), the partial
    // aggregate under THIS branch loses tf's count function, the two
    // exchanges stop being canonically equal, and the full corpus pass
    // silently runs twice — the r13 profile caught it as a second
    // 0.9-1.0 s 32-task stage at sf0.1 behind a plan note claiming one
    // pass. The optimizer cannot fold least(tf, 1) (it cannot prove
    // tf >= 1), which is exactly what keeps the subtrees shared; the
    // ReusedExchange is asserted by RetrievalSpec so a future optimizer
    // change cannot silently cost a corpus pass again.
    val dfs = tf.groupBy(col("token"))
      .agg(sum(least(col("tf"), lit(1L))).as("df"))

    val scored = tf
      .join(broadcast(dfs), Seq("token"))
      .join(broadcast(qterms), Seq("token"))
      .crossJoin(broadcast(stats))
      // textual twin of the oracle SQL — same tree, same rounding path
      .withColumn("s", expr(
        "CAST(ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) * " +
          "((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS DECIMAL(28,6))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score")) // decimal sum: exact, order-free

    // bounded per-query ranking; the decimal→double image is injective at
    // this magnitude (6-decimal grid ≫ double ulp), so the front's order
    // equals the decimal order and ranks are engine-stable
    scored.groupBy(col("query_id"))
      .agg(call_function("top_k_front",
        struct(col("score").cast("double").as("sc"), col("doc_id")), lit(k)).as("front"))
      .select(col("query_id"), posexplode(col("front")).as(Seq("i", "e")))
      .select(
        col("query_id"),
        col("e.doc_id").as("doc_id"),
        (col("i") + 1).as("rank"),
        col("e.sc").cast("decimal(38,6)").as("score"))
  }
}
