package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for the Impala scalar-function alias surface
  * (reference: common/function-registry/impala_functions.py — the canonical
  * builtin list). Aliases land here as SQL-level function registrations so
  * both `spark.sql` text and the Column API can use them.
  */
object ImpalaFunctions {
  def register(spark: SparkSession): Unit = {
    // populated by the dialect layer (SURVEY §7 step 2)
  }
}
