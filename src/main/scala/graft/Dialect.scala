package graft

import org.apache.spark.sql.SparkSession

/** Impala-dialect function surface registered onto a SparkSession.
  * (Filled in by the functions layer; kept minimal while slice 0 lands.)
  */
object Dialect {
  def registerAll(spark: SparkSession): Unit = {
    functions.ImpalaFunctions.register(spark)
  }
}
