package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

class UdfCachingSpec extends SparkSpec {

  test("CREATE FUNCTION surface: scalar UDFs callable from SQL") {
    Udf.registerScalar1[String, Int](spark, "vowel_count", s => s.count("aeiou".contains(_)))
    Udf.registerScalar2[Long, Long, Long](spark, "gcd_udf", (a, b) => BigInt(a).gcd(BigInt(b)).toLong)
    assert(sql1("vowel_count('hello world')") === 3)
    assert(sql1("gcd_udf(12, 18)") === 6L)
  }

  test("CREATE AGGREGATE FUNCTION surface: typed Aggregator via udaf") {
    val geomean = new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)): Double = if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    Udf.registerAggregate(spark, "geomean", geomean)(Encoders.scalaDouble)
    import spark.implicits._
    Seq(2.0, 8.0).toDF("x").createOrReplaceTempView("geo_t")
    val got = spark.sql("SELECT geomean(x) FROM geo_t").collect()(0).getDouble(0)
    assert(math.abs(got - 4.0) < 1e-12)
  }

  test("dfs_cache analogue: prepare warms the cache, progress reaches 1.0") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    try {
      val fut = Caching.prepare(df)
      val n = scala.concurrent.Await.result(fut, 60.seconds)
      assert(n > 0)
      assert(Caching.progress(df) === 1.0)
      // progress is per-dataset: an uncached df must report 0 even while
      // another dataset is fully cached (regression: max-cached fallback)
      val other = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      assert(Caching.progress(other) === 0.0)
    } finally Caching.release(df)
  }
}
