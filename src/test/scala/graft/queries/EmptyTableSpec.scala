package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Empty-TABLE semantics (reference QueryTest/empty.test — distinct from
  * the WHERE-false EmptySet short-circuit the golden corpus pins): a
  * 0-row table must still produce correct aggregate/join/window/sort
  * results, and a global aggregate over it yields its defined row. */
class EmptyTableSpec extends SparkSpec {

  private lazy val empty = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toFile
    dir.deleteOnExit()
    val schema = StructType.fromDDL("k INT, v DOUBLE, s STRING")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    spark.read.parquet(dir.getAbsolutePath)
  }

  test("global aggregates over an empty table: COUNT 0, MIN/MAX/SUM/AVG NULL") {
    val r = empty.agg(
      count(lit(1)).as("n"), min(col("v")), max(col("v")),
      sum(col("v")), avg(col("v")), count_distinct(col("s"))).collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getLong(5) === 0L)
  }

  test("grouped aggregate, sort, and window over an empty table: zero rows, no failure") {
    assert(empty.groupBy(col("k")).agg(sum(col("v"))).count() === 0)
    assert(empty.orderBy(col("v").desc).limit(10).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    assert(empty.select(row_number().over(w)).count() === 0)
  }

  test("joins against an empty table: inner empty, outer keeps the probe side") {
    import spark.implicits._
    val other = Seq((1, "a"), (2, "b")).toDF("k", "name")
    assert(other.join(empty, Seq("k"), "inner").count() === 0)
    assert(other.join(empty, Seq("k"), "left_outer").count() === 2)
    assert(other.join(empty, Seq("k"), "left_anti").count() === 2)
    assert(empty.join(other, Seq("k"), "right_outer").count() === 2)
  }
}
