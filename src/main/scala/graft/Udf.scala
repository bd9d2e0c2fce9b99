package graft

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** User-facing function registration — the reference's `CREATE FUNCTION` /
  * `CREATE AGGREGATE FUNCTION` surface (fe/.../analysis/CreateUdfStmt.java,
  * CreateUdaStmt.java; native ABI be/src/udf/udf.h).
  *
  * The reference loads native .so symbols; here a UDF is a Scala closure
  * and a UDA is a typed [[Aggregator]] (the same
  * Init/Update/Merge/Finalize protocol as udf.h, with Spark handling
  * serialization and partial aggregation). Registered names are callable
  * from SQL alongside the dialect surface.
  *
  * Note the priority order from SURVEY §2.10: prefer a native Catalyst
  * Expression (codegen) over a Scala UDF — these registrations are the
  * user extension point, not how the engine's own builtins are built.
  */
object Udf {

  /** `CREATE FUNCTION name(...) RETURNS ...` — scalar Scala UDF. */
  def registerScalar1[A, R](spark: SparkSession, name: String, f: A => R)(
      implicit rt: reflect.runtime.universe.TypeTag[R], at: reflect.runtime.universe.TypeTag[A]): Unit =
    spark.udf.register(name, f)

  def registerScalar2[A, B, R](spark: SparkSession, name: String, f: (A, B) => R)(
      implicit rt: reflect.runtime.universe.TypeTag[R],
      at: reflect.runtime.universe.TypeTag[A], bt: reflect.runtime.universe.TypeTag[B]): Unit =
    spark.udf.register(name, f)

  /** `CREATE AGGREGATE FUNCTION` — typed Aggregator with the UDA
    * Init/Update/Merge/Finalize lifecycle. */
  def registerAggregate[IN, BUF, OUT](
      spark: SparkSession, name: String, agg: Aggregator[IN, BUF, OUT])(
      implicit enc: Encoder[IN]): Unit =
    spark.udf.register(name, functions.udaf(agg, enc))

  /** `CREATE FUNCTION name AS 'HiveUdfClass'` — call-through to a Hive
    * Java UDF (reference: be/src/exprs/hive-udf-call.cc invokes the class
    * over JNI; here the JVM is native ground, so the class binds directly
    * as a Catalyst expression via Spark's Hive wrappers). Works with both
    * reflective `UDF` and `GenericUDF` classes; no metastore required. */
  def registerHiveUdf(spark: SparkSession, name: String, className: String): Unit =
    org.apache.spark.sql.hive.GraftHiveUdf.register(spark, name, className)
}
