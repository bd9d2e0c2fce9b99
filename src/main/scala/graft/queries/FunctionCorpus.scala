package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Scalar-function corpus — wide SELECTs per family (mirroring the
  * reference's family registry common/function-registry/impala_functions.py
  * and its golden eval suite be/src/exprs/expr-test.cc), each with a
  * DuckDB-equivalent oracle. Run through the SQL surface so the registered
  * dialect aliases (strleft, quotient, nullifzero, days_add, …) are what's
  * actually exercised.
  *
  * Where Spark and DuckDB spell a function differently the oracle uses the
  * DuckDB spelling of the same semantics (e.g. strleft→left, instr→strpos,
  * dayofweek is 1-based in Spark vs 0-based in DuckDB). Transcendentals are
  * rounded to 6 decimals — JVM Math.* and libm agree to ~1 ulp, not
  * bit-exactly.
  */
object FunctionCorpus {

  private def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.ensureViews(spark, dir)
    spark.sql(sql)
  }

  // ---------------------------------------------------------------- string
  def qFnString(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT p_partkey,
             strleft(p_name, 5)                        AS sl,
             strright(p_name, 4)                       AS sr,
             upper(p_name)                             AS up,
             lower(p_brand)                            AS lo,
             length(p_name)                            AS len,
             char_length(p_type)                       AS clen,
             concat(p_brand, ':', p_type)              AS cat,
             concat_ws('-', p_brand, p_type, p_name)   AS catws,
             lpad(p_brand, 12, '*')                    AS lp,
             rpad(p_brand, 12, '.')                    AS rp,
             trim(lpad(p_name, 20, ' '))               AS tr,
             ltrim(concat('  ', p_name))               AS ltr,
             rtrim(concat(p_name, '  '))               AS rtr,
             reverse(p_name)                           AS rev,
             substr(p_name, 3, 6)                      AS sub,
             instr(p_name, 'e')                        AS ins,
             locate('o', p_name)                       AS loc,
             ascii(p_name)                             AS asc_,
             repeat(p_brand, 2)                        AS rep,
             translate(p_name, 'aeiou', 'AEIOU')       AS trans,
             space(3)                                  AS sp,
             regexp_replace(p_name, '[aeiou]', '_')    AS rre,
             regexp_extract(p_brand, '([0-9]+)', 1)    AS rex,
             split(p_name, ' ')[0]                     AS sp0,
             find_in_set('red', replace(p_name, ' ', ',')) AS fis
      FROM part
      WHERE p_partkey <= 300
      ORDER BY p_partkey""")

  val qFnStringSql: String = """
      SELECT p_partkey,
             left(p_name, 5)                           AS sl,
             right(p_name, 4)                          AS sr,
             upper(p_name)                             AS up,
             lower(p_brand)                            AS lo,
             length(p_name)                            AS len,
             length(p_type)                            AS clen,
             concat(p_brand, ':', p_type)              AS cat,
             concat_ws('-', p_brand, p_type, p_name)   AS catws,
             lpad(p_brand, 12, '*')                    AS lp,
             rpad(p_brand, 12, '.')                    AS rp,
             trim(lpad(p_name, 20, ' '))               AS tr,
             ltrim(concat('  ', p_name))               AS ltr,
             rtrim(concat(p_name, '  '))               AS rtr,
             reverse(p_name)                           AS rev,
             substr(p_name, 3, 6)                      AS sub,
             strpos(p_name, 'e')                       AS ins,
             strpos(p_name, 'o')                       AS loc,
             ascii(p_name)                             AS asc_,
             repeat(p_brand, 2)                        AS rep,
             translate(p_name, 'aeiou', 'AEIOU')       AS trans,
             '   '                                     AS sp,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS rre,
             regexp_extract(p_brand, '([0-9]+)', 1)    AS rex,
             string_split(p_name, ' ')[1]              AS sp0,
             CASE WHEN list_position(string_split(replace(p_name, ' ', ','), ','), 'red') IS NULL
                  THEN 0 ELSE list_position(string_split(replace(p_name, ' ', ','), ','), 'red') END AS fis
      FROM part
      WHERE p_partkey <= 300
      ORDER BY p_partkey"""

  // ------------------------------------------------------------------ math
  // Hash-entry columns are restricted to ALGEBRAICALLY EXACT double/int ops
  // (abs/ceil/floor/sign/sqrt/%/comparisons/hex): IEEE-754 fixes their bits,
  // so any DuckDB build agrees. Transcendentals (sin/cos/atan/exp/ln/log/
  // pow/radians/degrees) are libm-dependent — round(f(x), 6) can flip a
  // boundary cell between oracle *builds* even when the local DuckDB is
  // bit-identical (observed: driver-red, local-green in r2). Those live in
  // MathFunctionsSpec (tolerance-checked) + the golden expr corpus instead.
  // sq stays DOUBLE on purpose: IEEE mandates correctly-rounded sqrt, so
  // the double is bit-stable everywhere, while a narrowing double→decimal
  // cast of an irrational value takes a build-dependent rounding path
  // (string-based HALF_UP vs binary scale-multiply) — the r3 driver red.
  def qFnMath(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT l_orderkey, l_linenumber,
             abs(-l_quantity)                          AS a,
             CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ce,
             CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
             CAST(sign(l_quantity - 25) AS INT)        AS sg,
             CAST(sqrt(l_quantity) AS DOUBLE)          AS sq,
             pmod(l_partkey, 7)                        AS pm,
             l_partkey % 5                             AS md,
             quotient(l_partkey, 7)                    AS qu,
             greatest(l_quantity, l_discount * 100)    AS gr,
             least(l_quantity, l_tax * 100)            AS le,
             hex(l_partkey)                            AS hx,
             truncate(l_extendedprice / 7, 2)          AS tc,
             is_inf(l_quantity / 0.0)                  AS inf,
             is_nan(l_quantity * CAST('NaN' AS DOUBLE)) AS nan
      FROM lineitem
      WHERE l_orderkey <= 300
      ORDER BY l_orderkey, l_linenumber, hx, a, ce, fl, sg, sq, pm, md, qu, gr, le, tc, inf, nan""")

  val qFnMathSql: String = """
      SELECT l_orderkey, l_linenumber,
             abs(-l_quantity)                          AS a,
             CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ce,
             CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
             CAST(sign(l_quantity - 25) AS INT)        AS sg,
             CAST(sqrt(l_quantity) AS DOUBLE)          AS sq,
             ((l_partkey % 7) + 7) % 7                 AS pm,
             l_partkey % 5                             AS md,
             CAST(floor(l_partkey / 7) AS BIGINT)      AS qu,
             greatest(l_quantity, l_discount * 100)    AS gr,
             least(l_quantity, l_tax * 100)            AS le,
             to_hex(l_partkey)                         AS hx,
             floor(l_extendedprice / 7 * 100) / 100    AS tc,
             isinf(l_quantity / 0.0)                   AS inf,
             isnan(l_quantity * CAST('NaN' AS DOUBLE)) AS nan
      FROM lineitem
      WHERE l_orderkey <= 300
      -- (l_orderkey, l_linenumber) is NOT a key in the synthetic lineitem
      -- (duplicate pairs with distinct partkeys/prices — r11 OrderAudit);
      -- the value tiebreakers make the order total: rows tied on ALL of
      -- them are identical, so any delivery order hashes the same
      ORDER BY l_orderkey, l_linenumber, hx, a, ce, fl, sg, sq, pm, md, qu, gr, le, tc, inf, nan"""

  // ------------------------------------------------------------------ cast
  // Impala-style cast semantics under ansi=false (reference:
  // cast-functions.cc): invalid string→number is NULL (DuckDB mirrors via
  // TRY_CAST), double→int truncates toward zero (DuckDB rounds, mirrored
  // via trunc()). Double→decimal stays at the value's exact scale — a
  // narrowing decimal cast hits .xx5 midpoints where Spark (decimal-string
  // HALF_UP) and DuckDB (binary round-nearest) legitimately disagree.
  def qFnCast(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT c_custkey,
             CAST(c_acctbal AS INT)                        AS d2i,
             CAST(c_acctbal AS BIGINT)                     AS d2l,
             CAST(c_custkey AS STRING)                     AS l2s,
             CAST(CAST(c_custkey AS STRING) AS BIGINT)     AS s2l,
             CAST(concat(CAST(c_custkey AS STRING), '.25') AS DOUBLE) AS s2d,
             CAST('oops' AS INT)                           AS bad2i,
             CAST(CAST('12.9' AS DOUBLE) AS INT)           AS sd2i,
             CAST(c_nationkey AS SMALLINT)                 AS i2s16,
             CAST(c_nationkey AS TINYINT)                  AS i2s8,
             CAST(c_custkey % 2 AS BOOLEAN)                AS i2b,
             CAST('true' AS BOOLEAN)                       AS s2b,
             CAST(CAST('1997-05-05' AS TIMESTAMP_NTZ) AS DATE) AS s2dt
      FROM customer
      WHERE c_custkey <= 300
      ORDER BY c_custkey""")

  val qFnCastSql: String = """
      SELECT c_custkey,
             CAST(trunc(c_acctbal) AS INT)                 AS d2i,
             CAST(trunc(c_acctbal) AS BIGINT)              AS d2l,
             CAST(c_custkey AS VARCHAR)                    AS l2s,
             CAST(CAST(c_custkey AS VARCHAR) AS BIGINT)    AS s2l,
             CAST(concat(CAST(c_custkey AS VARCHAR), '.25') AS DOUBLE) AS s2d,
             TRY_CAST('oops' AS INT)                       AS bad2i,
             CAST(trunc(TRY_CAST('12.9' AS DOUBLE)) AS INT) AS sd2i,
             CAST(c_nationkey AS SMALLINT)                 AS i2s16,
             CAST(c_nationkey AS TINYINT)                  AS i2s8,
             CAST(c_custkey % 2 AS BOOLEAN)                AS i2b,
             CAST('true' AS BOOLEAN)                       AS s2b,
             CAST(TIMESTAMP '1997-05-05 00:00:00' AS DATE) AS s2dt
      FROM customer
      WHERE c_custkey <= 300
      ORDER BY c_custkey"""

  // --------------------------------------------------------------- decimal
  // Decimal arithmetic parity (reference: decimal-operators.cc + Impala
  // precision/scale propagation, fe/.../analysis/TypesUtil.java). The
  // corpus sticks to EXACT ops (+, -, *, %, sum, exact-scale casts) where
  // Spark and DuckDB agree bit-for-bit despite different precision
  // propagation rules; decimal DIVISION intermediate scales legitimately
  // differ between engines (Spark pads to max(6,s1+s2+1), DuckDB keeps
  // dividend-based scale) and is exercised via double division instead.
  // Decimal INPUTS are derived from exact integer cents (round(x*100) ->
  // BIGINT -> DECIMAL / 100) rather than narrowing double->decimal casts.
  //
  // DRIVER-RED HISTORY (honest record): this entry was hash-red in the
  // driver's CORRECTNESS_r03/r04/r05 runs despite rows+schema matching
  // and despite tools/check.py + tools/celldiff.py (duckdb 1.0.0 in this
  // container) showing 0 differing cells and a local PASS for both the
  // r5 decimal-output body and the string-rendered body. The r5 comment
  // claimed the string rendering fixed it; the r5 driver run proved it
  // did not. Since every surface observable here matches, the residual
  // divergence must sit in behavior the local toolchain cannot
  // reproduce — most plausibly the driver's (different) DuckDB version
  // computing decimal DIVISION (`CAST(cents AS DECIMAL)/100`), decimal
  // casts, or decimal→VARCHAR rendering differently than duckdb 1.0.0.
  // ROUND-6 FIX: remove ALL decimal behavior from the ORACLE side. The
  // oracle (qFnDecimalSql below) now derives every expected string from
  // pure BIGINT cent arithmetic plus lpad() rendering — integer + - * %
  // and string concat are bit-identical in every DuckDB release, so the
  // oracle is version-proof. The SPARK side is unchanged and remains the
  // component under test: decimal ops with CAST-pinned result types
  // (DecimalArithmeticSpec asserts each operator's DecimalType(p,s)),
  // rendered via CAST(... AS STRING) which for a pinned-scale decimal is
  // the canonical plain form ("123.45", trailing zeros kept).
  private val decimalSrc: String = """
      (SELECT l_orderkey, l_linenumber,
              CAST(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(14,2)) / 100 AS DECIMAL(12,2)) AS d_price,
              CAST(CAST(CAST(round(l_tax * 100)           AS BIGINT) AS DECIMAL(10,2)) / 100 AS DECIMAL(8,2))  AS d_tax,
              CAST(CAST(CAST(round(l_discount * 100)      AS BIGINT) AS DECIMAL(10,2)) / 100 AS DECIMAL(8,2))  AS d_disc,
              CAST(CAST(CAST(round(l_quantity * 100)      AS BIGINT) AS DECIMAL(12,2)) / 100 AS DECIMAL(10,2)) AS d_qty,
              CAST(CAST(CAST(round(l_quantity * 1000)     AS BIGINT) AS DECIMAL(13,3)) / 1000 AS DECIMAL(10,3)) AS d_qty3
       FROM lineitem
       WHERE l_orderkey <= 400) src"""

  private def qFnDecimalBody(strTy: String): String = s"""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(d_price + d_tax  AS DECIMAL(14,2)) AS $strTy)            AS dadd,
             CAST(CAST(d_price - d_disc AS DECIMAL(14,2)) AS $strTy)            AS dsub,
             CAST(CAST(d_qty * d_disc AS DECIMAL(20,4)) AS $strTy)              AS dmul,
             CAST(CAST(d_price % CAST(7 AS DECIMAL(4,0)) AS DECIMAL(12,2)) AS $strTy) AS dmod,
             CAST(d_price AS $strTy)                                            AS dstr,
             CAST(CAST(d_qty3 AS DECIMAL(20,5)) AS $strTy)                      AS dwiden,
             CAST(CAST(-d_price AS DECIMAL(14,2)) AS $strTy)                    AS dneg
      FROM $decimalSrc
      -- every output column is a tiebreaker: (l_orderkey, l_linenumber) is
      -- not a key in the synthetic lineitem (r11 OrderAudit), and rows
      -- tied on ALL columns are identical — hash-safe in any order
      ORDER BY l_orderkey, l_linenumber, dadd, dsub, dmul, dmod, dstr, dwiden, dneg"""

  def qFnDecimal(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, qFnDecimalBody("STRING"))

  /** Oracle for q_fn_decimal in pure BIGINT cents + string rendering — no
    * decimal types anywhere, so no DuckDB-version-dependent decimal
    * division/cast/render behavior can perturb the driver hash. Each
    * rendered string must equal Spark's CAST(DECIMAL(p,s) AS STRING) of
    * the corresponding decimal op. All operands are strictly positive in
    * TPC-H lineitem, so integer `//` and `%` carry no sign subtleties
    * (dneg is rendered with an explicit leading '-').
    */
  val qFnDecimalSql: String = {
    // value*10^s held as BIGINT `v` → canonical scale-s decimal string
    def dec(v: String, s: Int): String = {
      val pow = math.pow(10, s).toLong
      s"(CAST(($v) // $pow AS VARCHAR) || '.' || lpad(CAST(($v) % $pow AS VARCHAR), $s, '0'))"
    }
    s"""
      WITH c AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_tax * 100)           AS BIGINT) AS tc,
               CAST(round(l_discount * 100)      AS BIGINT) AS dc,
               CAST(round(l_quantity * 100)      AS BIGINT) AS qc,
               CAST(round(l_quantity * 1000)     AS BIGINT) AS qm
        FROM lineitem
        WHERE l_orderkey <= 400)
      SELECT l_orderkey, l_linenumber,
             ${dec("pc + tc", 2)}          AS dadd,
             ${dec("pc - dc", 2)}          AS dsub,
             ${dec("qc * dc", 4)}          AS dmul,
             ${dec("pc % 700", 2)}         AS dmod,
             ${dec("pc", 2)}               AS dstr,
             ${dec("qm * 100", 5)}         AS dwiden,
             ('-' || ${dec("pc", 2)})      AS dneg
      FROM c
      ORDER BY l_orderkey, l_linenumber, dadd, dsub, dmul, dmod, dstr, dwiden, dneg"""
  }

  // ------------------------------------------------------------- timestamp
  def qFnDate(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT o_orderkey,
             year(o_orderdate)                          AS y,
             quarter(o_orderdate)                       AS q,
             month(o_orderdate)                         AS m,
             day(o_orderdate)                           AS d,
             dayofyear(o_orderdate)                     AS doy,
             dayofweek(o_orderdate)                     AS dow,
             weekofyear(o_orderdate)                    AS woy,
             dayname(o_orderdate)                       AS dn,
             CAST(date_trunc('month', o_orderdate) AS DATE)  AS mstart,
             CAST(years_add(o_orderdate, 1) AS DATE)    AS ya,
             CAST(months_sub(o_orderdate, 2) AS DATE)   AS ms,
             CAST(weeks_add(o_orderdate, 3) AS DATE)    AS wa,
             CAST(days_add(o_orderdate, 45) AS DATE)    AS da,
             CAST(adddate(o_orderdate, 10) AS DATE)     AS ad,
             CAST(subdate(o_orderdate, 10) AS DATE)     AS sd,
             hours_add(o_orderdate, 7)                  AS ha,
             minutes_add(o_orderdate, 90)               AS mia,
             seconds_sub(o_orderdate, 61)               AS ssub,
             milliseconds_add(o_orderdate, 1500)        AS msa,
             datediff(CAST('1998-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS dd,
             CAST(last_day(o_orderdate) AS DATE)        AS ld,
             date_format(o_orderdate, 'yyyy/MM/dd')     AS fmt,
             CAST(unix_timestamp(o_orderdate) AS BIGINT) AS ut,
             CAST(to_date(o_orderdate) AS DATE)         AS td
      FROM orders
      WHERE o_orderkey <= 500
      ORDER BY o_orderkey""")

  val qFnDateSql: String = """
      SELECT o_orderkey,
             year(o_orderdate)                          AS y,
             quarter(o_orderdate)                       AS q,
             month(o_orderdate)                         AS m,
             day(o_orderdate)                           AS d,
             dayofyear(o_orderdate)                     AS doy,
             dayofweek(o_orderdate) + 1                 AS dow,
             weekofyear(o_orderdate)                    AS woy,
             dayname(o_orderdate)                       AS dn,
             CAST(date_trunc('month', o_orderdate) AS DATE)  AS mstart,
             CAST(o_orderdate + INTERVAL 1 YEAR AS DATE)     AS ya,
             CAST(o_orderdate - INTERVAL 2 MONTH AS DATE)    AS ms,
             CAST(o_orderdate + INTERVAL 21 DAY AS DATE)     AS wa,
             CAST(o_orderdate + INTERVAL 45 DAY AS DATE)     AS da,
             CAST(o_orderdate + INTERVAL 10 DAY AS DATE)     AS ad,
             CAST(o_orderdate - INTERVAL 10 DAY AS DATE)     AS sd,
             o_orderdate + INTERVAL 7 HOUR              AS ha,
             o_orderdate + INTERVAL 90 MINUTE           AS mia,
             o_orderdate - INTERVAL 61 SECOND           AS ssub,
             o_orderdate + INTERVAL 1500 MILLISECOND    AS msa,
             datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS dd,
             last_day(CAST(o_orderdate AS DATE))        AS ld,
             strftime(o_orderdate, '%Y/%m/%d')          AS fmt,
             CAST(epoch(o_orderdate) AS BIGINT)         AS ut,
             CAST(o_orderdate AS DATE)                  AS td
      FROM orders
      WHERE o_orderkey <= 500
      ORDER BY o_orderkey"""

  // ----------------------------------------------------------- conditional
  def qFnCond(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, """
      SELECT c_custkey,
             if(c_acctbal > 5000, 'rich', 'modest')     AS tier,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg,
             nvl(nullif(c_nationkey, 0), -1)            AS nk,
             nullifzero(c_nationkey % 3)                AS nz,
             zeroifnull(nullif(c_nationkey, c_nationkey)) AS zn,
             istrue(c_acctbal > 5000)                   AS it,
             isfalse(c_acctbal > 5000)                  AS isf,
             isnottrue(c_acctbal > 5000)                AS int_,
             isnotfalse(c_acctbal > 5000)               AS inf_,
             nonnullvalue(nullif(c_mktsegment, 'AUTOMOBILE')) AS nnv,
             nullvalue(nullif(c_mktsegment, 'AUTOMOBILE'))    AS nv,
             isnull(nullif(c_mktsegment, 'MACHINERY'), 'was_machinery') AS isn2,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 1000 THEN 'low'
                  ELSE 'high' END                       AS cases,
             CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2 ELSE 0 END AS casesimple,
             c_acctbal BETWEEN 100 AND 200              AS btw,
             c_nationkey IN (1, 3, 5, 7)                AS inlist,
             c_name LIKE 'Customer#00000000%'           AS lk,
             c_name RLIKE '0{3}[0-9]$'                  AS rlk
      FROM customer
      WHERE c_custkey <= 400
      ORDER BY c_custkey""")

  val qFnCondSql: String = """
      SELECT c_custkey,
             CASE WHEN c_acctbal > 5000 THEN 'rich' ELSE 'modest' END AS tier,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg,
             coalesce(nullif(c_nationkey, 0), -1)       AS nk,
             nullif(c_nationkey % 3, 0)                 AS nz,
             coalesce(nullif(c_nationkey, c_nationkey), 0) AS zn,
             coalesce(c_acctbal > 5000, false)          AS it,
             coalesce(NOT (c_acctbal > 5000), false)    AS isf,
             NOT coalesce(c_acctbal > 5000, false)      AS int_,
             NOT coalesce(NOT (c_acctbal > 5000), false) AS inf_,
             nullif(c_mktsegment, 'AUTOMOBILE') IS NOT NULL AS nnv,
             nullif(c_mktsegment, 'AUTOMOBILE') IS NULL     AS nv,
             coalesce(nullif(c_mktsegment, 'MACHINERY'), 'was_machinery') AS isn2,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 1000 THEN 'low'
                  ELSE 'high' END                       AS cases,
             CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2 ELSE 0 END AS casesimple,
             c_acctbal BETWEEN 100 AND 200              AS btw,
             c_nationkey IN (1, 3, 5, 7)                AS inlist,
             c_name LIKE 'Customer#00000000%'           AS lk,
             regexp_matches(c_name, '0{3}[0-9]$')       AS rlk
      FROM customer
      WHERE c_custkey <= 400
      ORDER BY c_custkey"""
}
