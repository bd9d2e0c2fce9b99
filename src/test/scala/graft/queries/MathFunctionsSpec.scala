package graft.queries

import graft.SparkSpec

/** Tolerance coverage for the math-family columns deliberately EXCLUDED
  * from the q_fn_math bit-hash CORRECTNESS entry (transcendentals are
  * libm-dependent: a different oracle build can flip a round(f(x), 6)
  * boundary cell even when values match the local DuckDB bit-for-bit).
  * Reference surface: be/src/exprs/math-functions.cc.
  */
class MathFunctionsSpec extends SparkSpec {

  private val eps = 1e-9

  private def d(expr: String): Double =
    sql1(expr).asInstanceOf[Number].doubleValue()

  test("transcendental family matches java.lang.Math within 1e-9") {
    val xs = Seq(0.0, 0.04, 0.5, 1.0, 2.5, 9.75, 49.0)
    for (x <- xs) {
      assert(math.abs(d(s"exp($x)") - math.exp(x)) <= eps * math.exp(x).max(1.0))
      assert(math.abs(d(s"ln($x + 1)") - math.log(x + 1)) <= eps)
      assert(math.abs(d(s"sin($x)") - math.sin(x)) <= eps)
      assert(math.abs(d(s"cos($x)") - math.cos(x)) <= eps)
      assert(math.abs(d(s"atan($x)") - math.atan(x)) <= eps)
      assert(math.abs(d(s"radians($x)") - math.toRadians(x)) <= eps)
      assert(math.abs(d(s"degrees($x)") - math.toDegrees(x)) <= eps)
      assert(math.abs(d(s"pow($x, 2)") - x * x) <= eps * (x * x).max(1.0))
      if (x > 0) {
        assert(math.abs(d(s"log10($x)") - math.log10(x)) <= eps)
        assert(math.abs(d(s"log2($x)") - math.log(x) / math.log(2.0)) <= eps)
      }
    }
  }

  test("exp/ln/log round-trips and identities") {
    assert(math.abs(d("ln(exp(3.7))") - 3.7) <= eps)
    assert(math.abs(d("pow(10, log10(123.456))") - 123.456) <= 1e-6)
    assert(math.abs(d("sin(0.3)") * d("sin(0.3)") + d("cos(0.3)") * d("cos(0.3)") - 1.0) <= eps)
    assert(d("sin(pi())") === math.sin(math.Pi))
  }

  // Cast columns removed from the q_fn_cast hash entry for the same
  // cross-build reason (double→decimal rounding, double→string formatting
  // drift across DuckDB releases). Semantics pinned here instead
  // (reference: be/src/exprs/cast-functions.cc, ANSI-off Impala rules).
  test("double to decimal cast rounds HALF_UP at target scale") {
    // 1234.565 as a double prints "1234.565" (shortest round-trip); Spark
    // rounds that decimal form HALF_UP → .57 (not the binary-expansion
    // nearest, which DuckDB's round-half-even would give).
    assert(sql1("CAST(CAST(1234.565 AS DOUBLE) AS DECIMAL(28,2))").toString === "1234.57")
    assert(sql1("CAST(CAST(1234.555 AS DOUBLE) AS DECIMAL(28,2))").toString === "1234.56")
    assert(sql1("CAST(CAST(-7.125 AS DOUBLE) AS DECIMAL(28,2))").toString === "-7.13")
    assert(sql1("CAST(CAST(0.0 AS DOUBLE) AS DECIMAL(28,2))").toString === "0.00")
  }

  test("double to string cast uses shortest round-trip form") {
    assert(sql1("CAST(CAST(1234.56 AS DOUBLE) AS STRING)") === "1234.56")
    assert(sql1("CAST(CAST(0.1 AS DOUBLE) AS STRING)") === "0.1")
    // the parser folds the unary minus before the cast, so -0.0 surfaces as 0.0
    assert(sql1("CAST(CAST(-0.0 AS DOUBLE) AS STRING)") === "0.0")
    assert(sql1("CAST(CAST(1e300 AS DOUBLE) AS STRING)") === "1.0E300")
  }
}
