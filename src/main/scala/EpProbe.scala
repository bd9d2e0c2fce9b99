import org.apache.spark.sql.SparkSession
object EpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.build("local[32]")
    val dir = "/root/testdata/sf0.1"
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.queries.LlmOps.qPipelineE2e(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"run1 ${run()}%.2f run2 ${run()}%.2f run3 ${run()}%.2f")
    // compare: plain minhash clusters over the same survivor count from parquet
    val t0 = System.nanoTime()
    graft.queries.LlmOps.qDedupMinhash(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"minhash_full ${(System.nanoTime() - t0) / 1e9}%.2f")
    val df = graft.queries.LlmOps.qPipelineE2e(spark, dir)
    df.collect()
    println(graft.Options.summary(df).split("\n").take(60).mkString("\n"))
    spark.stop()
  }
}
