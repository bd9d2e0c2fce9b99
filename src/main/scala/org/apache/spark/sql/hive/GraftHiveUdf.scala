package org.apache.spark.sql.hive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.hive.HiveShim.HiveFunctionWrapper

/** Package-placed helper (the CacheIntrospect pattern): `HiveSimpleUDF` /
  * `HiveGenericUDF` are `private[hive]`, so the call-through shim lives in
  * `org.apache.spark.sql.hive` and re-exposes just a registration entry
  * point. This wraps a Hive `UDF`/`GenericUDF` class as a Catalyst
  * expression without requiring a Hive metastore catalog — the same
  * in-process invocation the reference performs (be/src/exprs/
  * hive-udf-call.cc calls the class through JNI; on Spark the JVM is
  * already home, so the wrapper binds ObjectInspectors directly).
  */
object GraftHiveUdf {

  /** Register `name` to call through to a Hive UDF class. Supports both
    * the reflective `org.apache.hadoop.hive.ql.exec.UDF` (evaluate
    * overloads) and `GenericUDF` (ObjectInspector protocol). The class
    * must be loadable from the session's classloader — e.g. shipped via
    * `spark.jars` / `ADD JAR`, mirroring `CREATE FUNCTION ... USING JAR`.
    */
  def register(spark: SparkSession, name: String, className: String): Unit = {
    val clazz = org.apache.spark.util.Utils.classForName(className)
    val isGeneric =
      classOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDF].isAssignableFrom(clazz)
    require(isGeneric || classOf[org.apache.hadoop.hive.ql.exec.UDF].isAssignableFrom(clazz),
      s"$className is neither a Hive UDF nor a GenericUDF")
    val builder = (children: Seq[Expression]) =>
      if (isGeneric) HiveGenericUDF(name, new HiveFunctionWrapper(className), children)
      else HiveSimpleUDF(name, new HiveFunctionWrapper(className), children)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "hive")
  }
}
