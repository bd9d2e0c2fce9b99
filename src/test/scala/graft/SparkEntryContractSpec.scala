package graft

/** Static contract between the driver-facing maps: every catalog entry
  * must carry a DuckDB oracle (a key typo in `oracleSql` would silently
  * demote the entry to the driver's weaker rows-only check — exactly the
  * regression this spec exists to catch), no oracle may point at a
  * nonexistent query, and every entry's OUTPUT ORDER must be
  * deterministic (the driver's hash is order-sensitive, so a value-
  * correct entry without a total output order flips red whenever the
  * partition delivery order shifts — the r10 `q_bm25_topk` red cell). */
class SparkEntryContractSpec extends SparkSpec {

  test("queries and oracleSql cover the same entry names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    // No rows-only allowlist anymore: the last holdouts (raw ANN candidate
    // paths) became certified entries in r11 — structural assert_true
    // guards in-plan, the (query, rank) grid + TRUE flags as the oracle.
    assert((q -- o).isEmpty,
      s"queries without an oracle: ${(q -- o).toSeq.sorted}")
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

  /** Shape half of the order contract: every entry's plan must end in a
    * global Sort (under order-preserving wrappers), a ≤1-row aggregate, or
    * LIMIT 0 — anything else hands the driver's order-sensitive hash
    * whatever order the scheduler delivered that day. The DATA half (sort
    * keys actually forming a row key — ds65's near-miss) is
    * OrderAuditSpec / graft.plans.OrderAudit. */
  test("every catalog entry's plan ends in a deterministic output order") {
    val sfDir = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.analyzed
      if (graft.plans.OrderAudit.deterministicOrderShape(plan)) None else Some(name)
    }
    assert(offenders.isEmpty,
      s"entries without a total output order (append .orderBy on a key of " +
        s"the result, and ORDER BY to the oracle): $offenders")
  }
}
