package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `top_k_front` — the bounded partial top-k aggregate that replaces
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
  * in the ANN candidate paths. The binding property is EXACT equality
  * with the window form (same rows, same ranks), plus the plan property
  * the operator exists for: a partial (map-side) aggregation phase, so
  * the exchange carries bounded fronts instead of every scored row. */
class TopKFrontSpec extends SparkSpec {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("rnk", row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
    .filter(col("rnk") <= k)
    .select(col("query_id"), col("cand_id"), col("sim"), col("rnk"))

  private def frontTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy(col("query_id"))
    .agg(call_function("top_k_front", struct(col("sim"), col("cand_id")), lit(k)).as("front"))
    .select(col("query_id"), posexplode(col("front")).as(Seq("i", "e")))
    .select(col("query_id"), col("e.cand_id").as("cand_id"),
      col("e.sim").as("sim"), (col("i") + 1).as("rnk"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
      r.get(3).asInstanceOf[Number].intValue())).toSet

  test("equals the row_number window form exactly on real scored data (ranks included)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.filter(col("vec_id") >= 8).select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", graft.operators.Similarity.cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("cand_id"), col("sim"))
      // many input partitions → many per-task partial fronts → the FINAL
      // phase genuinely merges serialized buffers
      .repartition(13)
    for (k <- Seq(1, 5, 40)) {
      assert(rows(frontTopK(scored, k)) === rows(windowTopK(scored, k)), s"k=$k")
    }
  }

  test("groups smaller than k return every row; null scores sort last like DESC NULLS LAST") {
    import spark.implicits._
    val df = Seq[(Long, Long, Option[Double])](
      (1L, 10L, Some(0.9)), (1L, 11L, None), (1L, 12L, Some(0.7)),
      (2L, 20L, None), (2L, 21L, None)
    ).toDF("query_id", "cand_id", "sim").repartition(4)
    for (k <- Seq(2, 10)) {
      assert(rows(frontTopK(df, k)) === rows(windowTopK(df, k)), s"k=$k")
    }
  }

  test("string ids: ties broken id-ASC, serialized partials roundtrip length-prefixed bytes") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i % 7L, f"cand_$i%04d", (i % 5).toDouble))
      .toDF("query_id", "cand_id", "sim").repartition(11)
    val got = frontTopK(df, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.get(3).asInstanceOf[Number].intValue())).toSet
    val want = windowTopK(df, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === want)
  }

  test("plan: partial ObjectHashAggregate below the exchange, no Window on the scored rows") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5)).toDF("query_id", "cand_id", "sim")
    val plan = frontTopK(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_front") || plan.toLowerCase.contains("partial"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
