package graft

import org.apache.spark.sql.SparkSession

/** Impala-dialect function surface registered onto a SparkSession.
  * Memoized per session — `EngineSession.adopt` runs on every catalog
  * query invocation and re-registering 40+ functions each time would spam
  * "function replaced" warnings (and waste registry churn).
  */
object Dialect {
  private val done =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit =
    if (done.add(spark)) functions.ImpalaFunctions.register(spark)

  /** Impala plan-hint pre-rewrite (reference grammar: plan_hints at
    * sql-parser.y:343 — `JOIN [broadcast] t` / `JOIN [shuffle] t`):
    * translated to Spark's hint framework before parsing. Covers the
    * common single-table-name form; subquery targets pass through
    * untouched (Spark's own comment hints work there directly).
    */
  private val bracketHint = """(?is)\bJOIN\s*\[\s*(broadcast|shuffle)\s*\]\s+(\w+)""".r

  def rewriteImpalaHints(sql: String): String = {
    var hints = List.empty[String]
    val stripped = bracketHint.replaceAllIn(sql, m => {
      val table = m.group(2)
      hints ::= (m.group(1).toLowerCase match {
        case "broadcast" => s"BROADCAST($table)"
        case _ => s"SHUFFLE_HASH($table)"
      })
      s"JOIN $table"
    })
    if (hints.isEmpty) sql
    else {
      // inject the collected hints into the first SELECT
      val selectRe = "(?i)\\bSELECT\\b".r
      selectRe.findFirstMatchIn(stripped) match {
        case Some(m) =>
          stripped.substring(0, m.end) + " /*+ " + hints.reverse.mkString(", ") + " */" +
            stripped.substring(m.end)
        case None => stripped
      }
    }
  }
}
