package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static contract between the driver-facing maps: every catalog entry
  * must carry a DuckDB oracle (a key typo in `oracleSql` would silently
  * demote the entry to the driver's weaker rows-only check — exactly the
  * regression this spec exists to catch), and no oracle may point at a
  * nonexistent query. */
class SparkEntryContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover the same entry names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("oracle SQL bodies are non-empty and single-statement") {
    // semicolons inside single-quoted literals (regex char classes etc.)
    // are data; only a bare one would split the driver's single execute
    def bareSemicolon(sql: String): Boolean = {
      var lit = false
      sql.trim.stripSuffix(";").exists { c =>
        if (c == '\'') { lit = !lit; false } else c == ';' && !lit
      }
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name has an empty oracle")
      assert(!bareSemicolon(sql), s"$name oracle contains multiple statements")
    }
  }
}
