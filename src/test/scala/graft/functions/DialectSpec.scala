package graft.functions

import graft.SparkSpec

/** Golden cases for the Impala dialect alias surface — shapes ported from
  * the reference's per-function eval suite (be/src/exprs/expr-test.cc). */
class DialectSpec extends SparkSpec {

  test("string family aliases") {
    assert(sql1("strleft('hello world', 5)") === "hello")
    assert(sql1("strleft('ab', 5)") === "ab")
    assert(sql1("strright('hello world', 5)") === "world")
    assert(sql1("strright('ab', 5)") === "ab")
  }

  test("conditional family") {
    assert(sql1("nullifzero(0)") === null)
    assert(sql1("nullifzero(0.0)") === null)
    assert(sql1("nullifzero(5)") === 5)
    assert(sql1("zeroifnull(CAST(NULL AS INT))") === 0)
    assert(sql1("zeroifnull(42)") === 42)
    assert(sql1("istrue(1 = 1)") === true)
    assert(sql1("istrue(CAST(NULL AS BOOLEAN))") === false)
    assert(sql1("isfalse(1 = 2)") === true)
    assert(sql1("isfalse(CAST(NULL AS BOOLEAN))") === false)
    assert(sql1("isnottrue(CAST(NULL AS BOOLEAN))") === true)
    assert(sql1("isnotfalse(CAST(NULL AS BOOLEAN))") === true)
    assert(sql1("nullvalue(CAST(NULL AS INT))") === true)
    assert(sql1("nonnullvalue(3)") === true)
    // Impala's 2-arg isnull == coalesce; Spark's 1-arg isnull preserved
    assert(sql1("isnull(NULL, 'fallback')") === "fallback")
    assert(sql1("isnull('x', 'fallback')") === "x")
    assert(sql1("isnull(CAST(NULL AS INT))") === true)
  }

  test("math family") {
    assert(sql1("quotient(13, 4)") === 3L)
    assert(sql1("quotient(-13, 4)") === -3L) // truncates toward zero
    assert(sql1("fmod(10.5, 3.0)").asInstanceOf[Double] === 1.5)
    // decimal in -> decimal out (exact), double in -> double out
    assert(sql1("CAST(truncate(3.4567, 2) AS DOUBLE)").asInstanceOf[Double] === 3.45)
    assert(sql1("CAST(truncate(-3.4567, 2) AS DOUBLE)").asInstanceOf[Double] === -3.45)
    assert(sql1("truncate(CAST(3.99 AS DOUBLE))").asInstanceOf[Double] === 3.0)
    assert(sql1("truncate(CAST(-3.4567 AS DOUBLE), 2)").asInstanceOf[Double] === -3.45)
    // exact past 2^53: the old double round-trip lost the low digits
    assert(sql1("CAST(truncate(CAST('123456789012345678.987' AS DECIMAL(21,3)), 2) AS STRING)")
      === "123456789012345678.980")
    assert(sql1("CAST(truncate(CAST('-123456789012345678.987' AS DECIMAL(21,3)), 0) AS STRING)")
      === "-123456789012345678.000")
    // strright(s, 0) is '' (substr(s, -0) would return the whole string)
    assert(sql1("strright('hello', 0)") === "")
    // any division by zero is NULL under ansi=false (Impala x/0 → NULL too)
    assert(sql1("is_inf(CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE))") === null)
    assert(sql1("is_inf(CAST('Infinity' AS DOUBLE))") === true)
    assert(sql1("is_inf(CAST('-Infinity' AS DOUBLE))") === true)
    assert(sql1("is_inf(1.0)") === false)
    assert(sql1("is_nan(CAST('NaN' AS DOUBLE))") === true)
  }

  test("timestamp arithmetic matches calendar semantics") {
    assert(sql1("CAST(years_add(TIMESTAMP_NTZ '2000-02-29 00:00:00', 1) AS STRING)")
      === "2001-02-28 00:00:00") // leap-day clamps to month end
    assert(sql1("CAST(days_add(TIMESTAMP_NTZ '1999-12-31 23:00:00', 1) AS STRING)")
      === "2000-01-01 23:00:00")
    assert(sql1("CAST(months_sub(TIMESTAMP_NTZ '2000-03-31 00:00:00', 1) AS STRING)")
      === "2000-02-29 00:00:00")
    assert(sql1("CAST(hours_add(TIMESTAMP_NTZ '2000-01-01 23:30:00', 2) AS STRING)")
      === "2000-01-02 01:30:00")
    assert(sql1("CAST(seconds_sub(TIMESTAMP_NTZ '2000-01-01 00:00:30', 31) AS STRING)")
      === "1999-12-31 23:59:59")
    assert(sql1("CAST(milliseconds_add(TIMESTAMP_NTZ '2000-01-01 00:00:00', 1500) AS STRING)")
      === "2000-01-01 00:00:01.5")
    assert(sql1("CAST(nanoseconds_add(TIMESTAMP_NTZ '2000-01-01 00:00:00', 1500) AS STRING)")
      === "2000-01-01 00:00:00.000001") // ns floor to µs (documented delta)
    assert(sql1("dayname(DATE '2024-01-01')") === "Monday")
  }

  test("aggregate aliases") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 10, i)).toDF("g", "x")
    df.createOrReplaceTempView("agg_t")
    val ndv = spark.sql("SELECT ndv(x) FROM agg_t").collect()(0).getLong(0)
    assert(math.abs(ndv - 1000) <= 50, s"ndv=$ndv") // HLL++ ~2% error
    val med = spark.sql("SELECT appx_median(x) FROM agg_t").collect()(0).getInt(0)
    assert(math.abs(med - 500) <= 25, s"appx_median=$med")
    val gc = spark.sql("SELECT group_concat(DISTINCT g, '|') FROM (SELECT CAST(g AS STRING) g FROM agg_t)")
      .collect()(0).getString(0)
    assert(gc === "0|1|2|3|4|5|6|7|8|9")
    val hist = spark.sql("SELECT histogram(x) FROM agg_t").collect()(0).getString(0)
    assert(hist.split(", ").length === 11)
  }

  test("string/url/number-base builtins match reference goldens (expr-test shapes)") {
    val url = "http://usr:pw@example.com:8080/docs/books/index.html?name=networking#DOWN"
    assert(sql1(s"parse_url('$url', 'HOST')") === "example.com")
    assert(sql1(s"parse_url('$url', 'PATH')") === "/docs/books/index.html")
    assert(sql1(s"parse_url('$url', 'QUERY')") === "name=networking")
    assert(sql1(s"parse_url('$url', 'REF')") === "DOWN")
    assert(sql1(s"parse_url('$url', 'PROTOCOL')") === "http")
    assert(sql1(s"parse_url('$url', 'QUERY', 'name')") === "networking")
    assert(sql1("conv('ff', 16, 10)") === "255")
    assert(sql1("conv(255, 10, 16)") === "FF")
    assert(sql1("bin(13)") === "1101")
    assert(sql1("hex(255)") === "FF")
    assert(sql1("unhex('4D')") === Array(0x4d.toByte))
    assert(sql1("initcap('hello wORLD')") === "Hello World")
    assert(sql1("chr(65)") === "A")
    assert(sql1("char_length('héllo')") === 5)
    assert(sql1("find_in_set('b', 'a,b,c')") === 2)
    assert(sql1("regexp_extract('abc123def', '([0-9]+)', 1)") === "123")
    assert(sql1("regexp_replace('foo bar', '\\\\s+', '_')") === "foo_bar")
    assert(sql1("from_utc_timestamp(TIMESTAMP_NTZ '2024-06-01 12:00:00', 'America/New_York')").toString
      === "2024-06-01 08:00:00.0")
    assert(sql1("to_utc_timestamp(TIMESTAMP_NTZ '2024-06-01 08:00:00', 'America/New_York')").toString
      === "2024-06-01 12:00:00.0")
    assert(sql1("extract(YEAR FROM DATE '2024-03-05')") === 2024)
    assert(sql1("date_part('month', DATE '2024-03-05')") === 3)
  }

  test("sample aggregate: deterministic bottom-k-by-hash reservoir") {
    import spark.implicits._
    (1 to 1000).map(_.toString).toDF("x").repartition(7).createOrReplaceTempView("sample_t")
    val s1 = spark.sql("SELECT sample(x) FROM sample_t").collect()(0).getString(0)
    assert(s1.split(", ").length === graft.functions.SampleAgg.K)
    // deterministic across partitionings
    (1 to 1000).map(_.toString).toDF("x").repartition(3).createOrReplaceTempView("sample_t2")
    val s2 = spark.sql("SELECT sample(x) FROM sample_t2").collect()(0).getString(0)
    assert(s1 === s2)
    // small group returns all values
    assert(spark.sql("SELECT sample(CAST(c AS STRING)) FROM VALUES ('a'),('b') t(c)")
      .collect()(0).getString(0).split(", ").toSet === Set("a", "b"))
  }

  test("session introspection: effective_user/pid/user/version resolve") {
    assert(sql1("effective_user()") === sql1("user()"))
    assert(sql1("pid()").asInstanceOf[Int] > 0)
    assert(sql1("version()").toString.nonEmpty)
  }

  test("madlib vector aliases map onto ArrayType ops") {
    assert(sql1("madlib_vector_get(1, madlib_vector(1.5, 2.5, 3.5))") === 2.5)
    assert(sql1("madlib_encode_vector(madlib_vector(1.5, 2.5))") === "1.5,2.5")
    assert(sql1("madlib_vector_get(0, madlib_decode_vector('9.5,8.5'))") === 9.5)
    assert(sql1("madlib_print_vector(madlib_vector(1.0, 2.0))") === "1.0,2.0")
  }

  test("Impala bracket plan-hints rewrite to Spark hints and take effect") {
    import spark.implicits._
    (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").createOrReplaceTempView("bh_big")
    (1 to 5).map(i => (i, s"d$i")).toDF("k", "d").createOrReplaceTempView("bh_small")
    val rewritten = graft.Dialect.rewriteImpalaHints(
      "SELECT * FROM bh_big JOIN [broadcast] bh_small ON bh_big.k = bh_small.k")
    assert(rewritten.contains("/*+ BROADCAST(bh_small) */"))
    assert(!rewritten.contains("["))
    val plan = graft.EngineSession.sql(spark,
      "SELECT * FROM bh_big JOIN [broadcast] bh_small ON bh_big.k = bh_small.k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val plan2 = graft.EngineSession.sql(spark,
      "SELECT * FROM bh_big JOIN [shuffle] bh_small ON bh_big.k = bh_small.k")
      .queryExecution.executedPlan.toString
    assert(plan2.contains("ShuffledHashJoin"), plan2)
    // hint-free SQL passes through byte-identical
    assert(graft.Dialect.rewriteImpalaHints("SELECT 1") === "SELECT 1")
  }

  test("bracket hints anchor to the owning query block, skip string literals") {
    // hint inside a CTE must land on the CTE's SELECT, not the outer one
    val cte = graft.Dialect.rewriteImpalaHints(
      "WITH c AS (SELECT * FROM bh_big JOIN [broadcast] bh_small ON bh_big.k = bh_small.k) SELECT * FROM c")
    assert(cte.startsWith("WITH c AS (SELECT /*+ BROADCAST(bh_small) */"), cte)
    assert(!cte.contains("["), cte)
    // two hints in the same block combine into one comment
    val two = graft.Dialect.rewriteImpalaHints(
      "SELECT * FROM a JOIN [broadcast] b ON a.k = b.k JOIN [shuffle] c ON a.k = c.k")
    assert(two.contains("/*+ BROADCAST(b), SHUFFLE_HASH(c) */"), two)
    // bracket text inside a string literal is data, not a hint
    val lit = "SELECT 'JOIN [broadcast] x' AS s FROM t"
    assert(graft.Dialect.rewriteImpalaHints(lit) === lit)
    // subquery-then-join: the join's hint anchors to the OUTER select
    val sub = graft.Dialect.rewriteImpalaHints(
      "SELECT * FROM (SELECT k FROM inner_t) s JOIN [broadcast] d ON s.k = d.k")
    assert(sub.startsWith("SELECT /*+ BROADCAST(d) */ * FROM (SELECT k"), sub)
  }

  test("broadcast hint surface maps to a broadcast join plan") {
    import spark.implicits._
    (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").createOrReplaceTempView("hint_big")
    (1 to 5).map(i => (i, s"d$i")).toDF("k", "d").createOrReplaceTempView("hint_small")
    val plan = spark.sql(
      "SELECT /*+ BROADCAST(hint_small) */ * FROM hint_big JOIN hint_small USING (k)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // and SHUFFLE_HASH forces the shuffle variant (reference [shuffle] hint)
    val plan2 = spark.sql(
      "SELECT /*+ SHUFFLE_HASH(hint_small) */ * FROM hint_big JOIN hint_small USING (k)")
      .queryExecution.executedPlan.toString
    assert(plan2.contains("ShuffledHashJoin"), plan2)
  }

  test("every reference builtin name resolves in the engine session") {
    // The complete name surface from the reference's function registry
    // (common/function-registry/impala_functions.py) plus its aggregate/
    // analytic catalog (fe/.../catalog/BuiltinsDb.java) — each must
    // resolve here, either as a Spark builtin of the same name or via
    // ImpalaFunctions' dialect builders.
    val referenceBuiltins = Seq(
      "abs", "acos", "appx_median", "ascii", "asin", "atan", "avg", "bin",
      "ceil", "char_length", "character_length", "coalesce", "concat",
      "concat_ws", "conv", "cos", "count", "current_database", "date_part",
      "datediff", "day", "dayname", "dayofweek", "dayofyear", "days_add",
      "days_sub", "degrees", "dense_rank", "distinctpc", "distinctpcsa", "e",
      "exp", "extract", "find_in_set", "first_value", "first_value_rewrite",
      "floor", "fmod", "fnv_hash", "from_unixtime", "from_utc_timestamp",
      "greatest", "group_concat", "hex", "histogram", "hour", "hours_add",
      "hours_sub", "if", "initcap", "instr", "is_inf", "is_nan", "isfalse",
      "isnotfalse", "isnottrue", "isnull", "istrue", "lag", "last_value",
      "lead", "least", "length", "ln", "locate", "log", "log10", "log2",
      "lower", "lpad", "ltrim", "madlib_decode_vector",
      "madlib_encode_vector", "madlib_print_vector", "madlib_vector",
      "madlib_vector_get", "max", "max_bigint", "max_int", "max_smallint",
      "max_tinyint", "microseconds_add", "microseconds_sub",
      "milliseconds_add", "milliseconds_sub", "min", "min_bigint", "min_int",
      "min_smallint", "min_tinyint", "minute", "minutes_add", "minutes_sub",
      "mod", "month", "months_add", "months_sub", "nanoseconds_add",
      "nanoseconds_sub", "ndv", "ndv_no_finalize", "negative",
      "nonnullvalue", "now", "nullif", "nullifzero", "nullvalue",
      "parse_url", "pi", "pid", "pmod", "positive", "pow", "precision",
      "quotient", "radians", "rand", "rank", "regexp_extract",
      "regexp_replace", "repeat", "reverse", "round", "row_number", "rpad",
      "rtrim", "sample", "scale", "second", "seconds_add", "seconds_sub",
      "sign", "sin", "sleep", "space", "sqrt", "stddev", "stddev_pop",
      "stddev_samp", "strleft", "strright", "substr", "sum", "tan",
      "to_date", "to_utc_timestamp", "translate", "trim", "trunc",
      "truncate", "udf_abs", "udf_lower", "udf_pi", "unhex",
      "unix_timestamp", "upper", "user", "var_pop", "var_samp", "variance",
      "variance_pop", "variance_samp", "version", "weekofyear", "weeks_add",
      "weeks_sub", "year", "years_add", "years_sub", "zeroifnull")
    // Internal-only registry rows, not user-callable in the reference:
    // generator sample UDFs and aggregate rewrite helpers.
    val internalOnly = Set("udf_abs", "udf_lower", "udf_pi",
      "ndv_no_finalize", "first_value_rewrite")
    val missing = referenceBuiltins.filterNot(internalOnly)
      .filterNot(n => spark.catalog.functionExists(n))
    assert(missing.isEmpty, s"unresolved reference builtins: $missing")
  }

  test("type-limit constants and decimal precision/scale introspection") {
    assert(sql1("max_tinyint()") === Byte.MaxValue)
    assert(sql1("min_smallint()") === Short.MinValue)
    assert(sql1("max_int()") === Int.MaxValue)
    assert(sql1("min_bigint()") === Long.MinValue)
    assert(sql1("precision(CAST(1.25 AS DECIMAL(12,3)))") === 12)
    assert(sql1("scale(CAST(1.25 AS DECIMAL(12,3)))") === 3)
    // type introspection, not value introspection: NULL still has a type
    assert(sql1("precision(CAST(NULL AS DECIMAL(9,4)))") === 9)
    // codegen path over a column
    val n = spark.sql(
      "SELECT scale(CAST(x AS DECIMAL(18,2))) AS s FROM VALUES (1.5), (2.5) AS t(x)")
    assert(n.collect().forall(_.getInt(0) == 2))
  }

  test("builtin distributed stddev/variance agree with single-node formula") {
    import spark.implicits._
    val xs = (1 to 10000).map(_.toDouble)
    val df = xs.toDF("x").repartition(8)
    val Array(sd, v) = df.selectExpr("stddev_samp(x)", "var_samp(x)")
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val n = xs.size
    val mean = xs.sum / n
    val exact = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    assert(math.abs(v - exact) / exact < 1e-9)
    assert(math.abs(sd - math.sqrt(exact)) / math.sqrt(exact) < 1e-9)
  }

  test("KNOWN DELTA pin: grand-total grouping over empty input emits no row") {
    // The SQL standard (and DuckDB, and Postgres) emit ONE grand-total
    // row for ROLLUP/CUBE/GROUPING SETS-with-() over an EMPTY input —
    // the () set is a global aggregate. Spark's Expand-based grouping
    // treats every set as a grouped aggregate (the internal grouping-id
    // column is always a key), so it emits NONE. Found by the seed-44
    // differential-fuzz run at sf0.01 (a selective predicate emptied a
    // join feeding GROUPING SETS); the fuzzer now only emits grand-total
    // forms over generation-time-verified non-empty input. This pin
    // documents the delta executably: if a Spark upgrade ever fixes it,
    // this test fails and the fuzzer's non-empty guard can be dropped.
    val df = spark.sql(
      "SELECT x, COUNT(*) AS n FROM VALUES (1), (2) AS t(x) " +
        "WHERE x > 99 GROUP BY GROUPING SETS ((x), ())")
    assert(df.count() === 0L) // standard semantics would be 1 row
    // ...and over non-empty input the grand-total row IS present (the
    // hash-green q_grouping_sets entry covers the full oracled shape).
    val nonEmpty = spark.sql(
      "SELECT x, COUNT(*) AS n FROM VALUES (1), (2) AS t(x) " +
        "GROUP BY GROUPING SETS ((x), ())")
    assert(nonEmpty.count() === 3L)
  }

  test("KNOWN DELTA pin: ASC sort places NULLs FIRST (reference/DuckDB default LAST)") {
    // Impala (since 1.2.1) and DuckDB/Postgres place NULLs LAST in ASC
    // order by default; Spark places them FIRST. For a window with a
    // ROWS frame over a nullable sort key the default therefore changes
    // FRAME CONTENTS, not just display order — found by the seed-47
    // analytic-dialect fuzz run (f47_0396: nullifzero prefix key under
    // ROWS BETWEEN 4 PRECEDING AND CURRENT ROW). The engine keeps
    // Spark's default (rewriting every sort is not a dialect-layer
    // rewrite); portable SQL spells NULLS FIRST/LAST explicitly — the
    // same envelope rule the fuzzer applies to top-level ORDER BY, now
    // applied to window ORDER BY too. If a Spark upgrade flips the
    // default, this pin fails and the envelope can be revisited.
    val rows = spark.sql(
      "SELECT x, SUM(y) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND " +
        "CURRENT ROW) AS s FROM VALUES (1, 10), (NULL, 100), (2, 1) " +
        "AS t(x, y) ORDER BY s").collect()
    // NULLS FIRST default: frame order is (NULL,100),(1,10),(2,1) →
    // running pair-sums 100, 110, 11. NULLS LAST would give 10, 11, 101.
    assert(rows.map(_.getLong(1)).toSeq === Seq(11L, 100L, 110L))
    // explicit placement is honored (the portable spelling)
    val last = spark.sql(
      "SELECT SUM(y) OVER (ORDER BY x NULLS LAST ROWS BETWEEN 1 " +
        "PRECEDING AND CURRENT ROW) AS s FROM VALUES (1, 10), " +
        "(NULL, 100), (2, 1) AS t(x, y) ORDER BY s").collect()
    assert(last.map(_.getLong(0)).toSeq === Seq(10L, 11L, 101L))
  }
}
