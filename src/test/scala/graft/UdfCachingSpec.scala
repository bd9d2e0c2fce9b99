package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** A reflective Hive UDF for the call-through test (must be a top-level
  * class — Hive instantiates it by zero-arg reflection). */
class TestHiveShoutUdf extends org.apache.hadoop.hive.ql.exec.UDF {
  def evaluate(s: String): String = if (s == null) null else s.toUpperCase + "!"
}

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

  test("CREATE FUNCTION AS 'HiveUdfClass': reflective UDF and GenericUDF call through") {
    // a user-supplied reflective Hive UDF (reference hive-udf-call.cc path)
    Udf.registerHiveUdf(spark, "hive_shout", classOf[TestHiveShoutUdf].getName)
    assert(spark.sql("SELECT hive_shout('abc')").collect()(0).getString(0) === "ABC!")
    assert(spark.sql("SELECT hive_shout(NULL)").collect()(0).isNullAt(0))
    // a GenericUDF straight out of hive-exec, as a USING JAR stand-in
    Udf.registerHiveUdf(spark, "hive_concat",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFConcat")
    assert(spark.sql("SELECT hive_concat('a', '-', 'b')").collect()(0).getString(0) === "a-b")
    // over a column, not just literals
    import spark.implicits._
    Seq("x", "yz").toDF("s").createOrReplaceTempView("hive_udf_t")
    assert(spark.sql("SELECT hive_shout(s) FROM hive_udf_t ORDER BY s")
      .collect().map(_.getString(0)).toSeq === Seq("X!", "YZ!"))
    // non-UDF classes are rejected up front
    intercept[IllegalArgumentException] {
      Udf.registerHiveUdf(spark, "bad", "java.lang.String")
    }
  }

  test("a throwing UDF fails the query with its error, not a silent NULL") {
    // reference udf-errors.test: a UDF runtime error aborts the query and
    // surfaces the message — it must never be swallowed into a NULL row
    Udf.registerScalar1[Int, Int](spark, "boom_udf", x =>
      if (x > 1) throw new IllegalStateException("boom: bad input") else x)
    assert(sql1("boom_udf(1)") === 1)
    val e = intercept[Exception] {
      spark.sql("SELECT boom_udf(2)").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("boom: bad input")),
      s"error chain must carry the UDF message: ${chain(e)}")
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
      // space accounting: a fully-warm cache holds real bytes; an
      // uncached dataset reports zero residency
      val (mem, disk) = Caching.stats(df)
      assert(mem + disk > 0, "warm cache must report resident bytes")
      // progress is per-dataset: an uncached df must report 0 even while
      // another dataset is fully cached (regression: max-cached fallback)
      val other = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      assert(Caching.progress(other) === 0.0)
      assert(Caching.stats(other) === ((0L, 0L)))
    } finally Caching.release(df)
  }
}
