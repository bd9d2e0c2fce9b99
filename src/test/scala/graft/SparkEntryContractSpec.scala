package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static contract between the driver-facing maps: every catalog entry
  * must carry a DuckDB oracle (a key typo in `oracleSql` would silently
  * demote the entry to the driver's weaker rows-only check — exactly the
  * regression this spec exists to catch), and no oracle may point at a
  * nonexistent query. */
class SparkEntryContractSpec extends AnyFunSuite {

  /** The deliberate rows-only entries: raw ANN candidate paths whose
    * bucket contents DuckDB can't derive — their gated twins
    * (q_sim_search_lsh/ivf) carry the hash-checked oracle. Anything else
    * missing an oracle is a typo this spec exists to catch. */
  private val rowsOnlyByDesign =
    Set("q_sim_search_lsh_raw", "q_sim_search_ivf_raw", "q_sim_search_q8_raw")

  test("queries and oracleSql cover the same entry names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o -- rowsOnlyByDesign).isEmpty,
      s"queries without an oracle: ${(q -- o -- rowsOnlyByDesign).toSeq.sorted}")
    assert((rowsOnlyByDesign -- q).isEmpty, "rows-only allowlist names a missing query")
  }

  // semicolons inside single-quoted literals (regex char classes etc.)
  // or behind `--` line comments are data; only a bare one would split
  // the driver's single execute
  private def bareSemicolon(sql: String): Boolean = {
    val noComments = sql.linesIterator.map { line =>
      var lit = false
      val cut = line.indices.find { i =>
        if (line(i) == '\'') { lit = !lit; false }
        else !lit && line(i) == '-' && i + 1 < line.length && line(i + 1) == '-'
      }
      cut.map(line.substring(0, _)).getOrElse(line)
    }.mkString("\n")
    var lit = false
    noComments.trim.stripSuffix(";").exists { c =>
      if (c == '\'') { lit = !lit; false } else c == ';' && !lit
    }
  }

  test("bareSemicolon scanner: comments and literals never read as statement splits") {
    // regression (r6 ADVICE): semicolons behind `--` comments are data
    assert(!bareSemicolon("SELECT 1 -- trailing; note\nFROM t"))
    assert(!bareSemicolon("SELECT 1\n-- whole-line; comment\nFROM t"))
    // ... as are semicolons and `--` sequences inside string literals
    assert(!bareSemicolon("SELECT ';' AS c FROM t"))
    assert(!bareSemicolon("SELECT 'a--b;c' AS c FROM t"))
    // a single trailing semicolon is one statement
    assert(!bareSemicolon("SELECT 1;"))
    // real multi-statement input must still be caught
    assert(bareSemicolon("SELECT 1; SELECT 2"))
    assert(bareSemicolon("SELECT ';'; SELECT 2"))
  }

  test("oracle SQL bodies are non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name has an empty oracle")
      assert(!bareSemicolon(sql), s"$name oracle contains multiple statements")
    }
  }
}
