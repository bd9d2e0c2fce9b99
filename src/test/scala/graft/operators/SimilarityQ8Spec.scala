package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 scalar-quantized ANN: the kernel expression, the quantization
  * error bound, and the top-k contract vs the exact brute-force path. */
class SimilarityQ8Spec extends SparkSpec {

  test("dot_product_q8: exact integer dot over tinyint codes, null on length mismatch") {
    assert(sql1("dot_product_q8(array(CAST(1 AS TINYINT), CAST(-2 AS TINYINT)), " +
      "array(CAST(3 AS TINYINT), CAST(4 AS TINYINT)))") === (1L * 3 + -2L * 4))
    assert(sql1("dot_product_q8(array(CAST(127 AS TINYINT), CAST(-128 AS TINYINT)), " +
      "array(CAST(127 AS TINYINT), CAST(-128 AS TINYINT)))") === (127L * 127 + 128L * 128))
    assert(sql1("dot_product_q8(array(CAST(1 AS TINYINT)), " +
      "array(CAST(1 AS TINYINT), CAST(2 AS TINYINT)))") === null)
  }

  test("quantized cosine approximates exact cosine within 1e-2 on the real corpus") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 200)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"),
      Similarity.quantizeQ8(col("embedding")).as("qa"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      Similarity.quantizeQ8(col("embedding")).as("qb"))
    val err = a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(abs(
        Similarity.cosineQ8(col("qa"), col("qb")) -
          Similarity.cosine(col("va"), col("vb"))).as("e"))
      .agg(max(col("e"))).collect()(0).getDouble(0)
    assert(err < 1e-2, s"max |approx - exact| cosine error $err")
    // self-similarity sanity: quantized cosine of a vector with itself ~ 1
    val selfErr = a.select(abs(Similarity.cosineQ8(col("qa"), col("qa")) - 1.0).as("e"))
      .agg(max(col("e"))).collect()(0).getDouble(0)
    assert(selfErr < 1e-2)
  }

  test("q8TopK matches bruteForceTopK ids exactly at both driver scales (recall 30/30)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rnk", "cand_id").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val exact = key(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3))
      val q8 = key(Similarity.q8TopK(queries, corpus, "vec_id", "embedding", 3))
      assert(q8 === exact, s"q8 top-3 diverged from exact at $dir")
    }
  }

  test("gated entry: recall_ok TRUE on every row at both gate scales") {
    import graft.queries.LlmOps
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val flags = LlmOps.qSimSearchQ8(spark, dir)
        .select(col("recall_ok")).distinct().collect()
      assert(flags.map(_.getBoolean(0)).toSeq === Seq(true))
    }
  }

  test("constant vector quantizes without division blowup") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(0.5f)))
      .toDF("id", "v")
    val a = df.filter(col("id") === 1).select(Similarity.quantizeQ8(col("v")).as("q"))
    val b = df.filter(col("id") === 2).select(Similarity.quantizeQ8(col("v")).as("q2"))
    val sim = a.crossJoin(b)
      .select(Similarity.cosineQ8(col("q"), col("q2")).as("s"))
      .collect()(0).getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }
}
