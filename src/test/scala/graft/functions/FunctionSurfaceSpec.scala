package graft.functions

import graft.SparkSpec

/** Executable parity for the reference's SCALAR function registry
  * (reference: common/function-registry/impala_functions.py — the
  * complete list of non-generated builtins, including every SQL alias).
  * Aggregates live in the FE catalog and are covered by the aggregate
  * corpus entries (q_agg_*); this spec pins that every scalar NAME a
  * reference user can call resolves in the engine session too — via a
  * Spark builtin or a dialect registration — so a registration
  * regression (or a Spark upgrade dropping an alias) fails here.
  *
  * Excluded, with reasons:
  *  - udf_abs / udf_lower / udf_pi: the reference's own UDF-harness test
  *    functions (impala_functions.py labels them "Test UDFs"), not user
  *    surface; the UDF protocol itself is spec'd in UdfCachingSpec. */
class FunctionSurfaceSpec extends SparkSpec {

  private val referenceRegistry: Seq[String] = Seq(
    "abs", "acos", "add_months", "adddate", "ascii", "asin", "atan", "bin",
    "ceil", "ceiling", "char_length", "character_length", "coalesce",
    "concat", "concat_ws", "conv", "cos", "current_database",
    "current_timestamp", "date_add", "date_part", "date_sub", "datediff",
    "day", "dayname", "dayofmonth", "dayofweek", "dayofyear", "days_add",
    "days_sub", "degrees", "e", "exp", "extract", "find_in_set", "floor",
    "fmod", "fnv_hash", "from_unixtime", "from_utc_timestamp", "greatest",
    "hex", "hour", "hours_add", "hours_sub", "if", "ifnull", "initcap",
    "instr", "is_inf", "is_nan", "isfalse", "isnotfalse", "isnottrue",
    "isnull", "istrue", "lcase", "least", "length", "ln", "locate", "log",
    "log10", "log2", "lower", "lpad", "ltrim", "madlib_decode_vector",
    "madlib_encode_vector", "madlib_print_vector", "madlib_vector",
    "madlib_vector_get", "max_bigint", "max_int", "max_smallint",
    "max_tinyint", "microseconds_add", "microseconds_sub",
    "milliseconds_add", "milliseconds_sub", "min_bigint", "min_int",
    "min_smallint", "min_tinyint", "minute", "minutes_add", "minutes_sub",
    "mod", "month", "months_add", "months_sub", "nanoseconds_add",
    "nanoseconds_sub", "negative", "nonnullvalue", "now", "nullif",
    "nullifzero", "nullvalue", "nvl", "parse_url", "pi", "pid", "pmod",
    "positive", "pow", "power", "precision", "quotient", "radians", "rand",
    "regexp_extract", "regexp_replace", "repeat", "reverse", "round",
    "rpad", "rtrim", "scale", "second", "seconds_add", "seconds_sub",
    "sign", "sin", "sleep", "space", "sqrt", "strleft", "strright",
    "subdate", "substr", "substring", "tan", "to_date", "to_utc_timestamp",
    "translate", "trim", "trunc", "truncate", "typeof", "ucase", "unhex",
    "unix_timestamp", "upper", "user", "version", "weekofyear",
    "weeks_add", "weeks_sub", "year", "years_add", "years_sub",
    "zeroifnull")

  test("every reference-registry scalar function name resolves") {
    val missing = referenceRegistry.filterNot { name =>
      spark.catalog.functionExists(name)
    }
    assert(missing.isEmpty,
      s"reference functions with no engine resolution: ${missing.mkString(", ")}")
  }

  /** Extension-surface kernels (beyond the reference registry): the
    * similarity-search hot path depends on these registrations, and a
    * dropped registration would only surface as an analysis error deep
    * inside an operator — pin the names here like the reference ones. */
  private val extensionRegistry: Seq[String] =
    Seq("dot_product", "cosine_similarity", "dot_product_q8", "quantize_q8")

  test("every extension vector kernel resolves") {
    val missing = extensionRegistry.filterNot(spark.catalog.functionExists)
    assert(missing.isEmpty,
      s"extension kernels with no engine resolution: ${missing.mkString(", ")}")
  }
}
