package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the decimal-arithmetic TYPES behind the q_fn_decimal entry.
  *
  * The driver's CORRECTNESS gate hashes that entry's VALUES through
  * `CAST(... AS STRING)` (see FunctionCorpus: decimal-typed output
  * columns are un-hashable across the driver's two arrow readers even
  * when every cell matches), so the precision/scale propagation itself —
  * the actual component from SURVEY §2.9, reference
  * be/src/exprs/decimal-operators.cc + fe/.../analysis/TypesUtil.java —
  * is asserted here on the pre-string expressions instead.
  */
class DecimalArithmeticSpec extends SparkSpec {

  private val src =
    """(SELECT CAST(123.45 AS DECIMAL(12,2)) AS d_price,
       |        CAST(0.07   AS DECIMAL(8,2))  AS d_tax,
       |        CAST(0.04   AS DECIMAL(8,2))  AS d_disc,
       |        CAST(26.00  AS DECIMAL(10,2)) AS d_qty,
       |        CAST(26.000 AS DECIMAL(10,3)) AS d_qty3) src""".stripMargin

  private def typeOf(expr: String): DataType =
    spark.sql(s"SELECT $expr AS c FROM $src").schema.fields(0).dataType

  test("pinned operator result types match the q_fn_decimal contract") {
    assert(typeOf("CAST(d_price + d_tax AS DECIMAL(14,2))") === DecimalType(14, 2))
    assert(typeOf("CAST(d_price - d_disc AS DECIMAL(14,2))") === DecimalType(14, 2))
    assert(typeOf("CAST(d_qty * d_disc AS DECIMAL(20,4))") === DecimalType(20, 4))
    assert(typeOf("CAST(d_price % CAST(7 AS DECIMAL(4,0)) AS DECIMAL(12,2))") === DecimalType(12, 2))
    assert(typeOf("CAST(d_qty3 AS DECIMAL(20,5))") === DecimalType(20, 5))
    assert(typeOf("CAST(-d_price AS DECIMAL(14,2))") === DecimalType(14, 2))
  }

  test("Spark's natural precision/scale propagation (Impala-compatible shapes)") {
    // add/sub: max(s1,s2) + max(p1-s1, p2-s2) + 1  (decimal-operators.cc)
    assert(typeOf("d_price + d_tax") === DecimalType(13, 2))
    assert(typeOf("d_price - d_disc") === DecimalType(13, 2))
    // mul: p1+p2+1, s1+s2
    assert(typeOf("d_qty * d_disc") === DecimalType(19, 4))
    // mod: min(p1-s1, p2-s2) + max(s1, s2)
    assert(typeOf("d_price % CAST(7 AS DECIMAL(4,0))") === DecimalType(6, 2))
    // unary minus preserves the type
    assert(typeOf("-d_price") === DecimalType(12, 2))
  }

  test("exact-op values survive the decimal path bit-for-bit") {
    val row = spark.sql(
      s"""SELECT CAST(CAST(d_price + d_tax AS DECIMAL(14,2)) AS STRING)  AS dadd,
         |       CAST(CAST(d_qty * d_disc AS DECIMAL(20,4)) AS STRING)   AS dmul,
         |       CAST(CAST(d_price % CAST(7 AS DECIMAL(4,0)) AS DECIMAL(12,2)) AS STRING) AS dmod,
         |       CAST(d_price AS STRING)                                 AS dstr,
         |       CAST(CAST(d_qty3 AS DECIMAL(20,5)) AS STRING)           AS dwiden,
         |       CAST(CAST(-d_price AS DECIMAL(14,2)) AS STRING)         AS dneg
         |FROM $src""".stripMargin).collect()(0)
    assert(row.getString(0) === "123.52")    // 123.45 + 0.07
    assert(row.getString(1) === "1.0400")    // 26.00 * 0.04, scale 4
    assert(row.getString(2) === "4.45")      // 123.45 mod 7 = 123.45 - 17*7
    assert(row.getString(3) === "123.45")
    assert(row.getString(4) === "26.00000")  // widened to scale 5, zeros kept
    assert(row.getString(5) === "-123.45")
  }

  test("cents-derivation of decimal operands is exact (no double narrowing)") {
    // the decimalSrc route: round(x*100) -> BIGINT -> DECIMAL / 100
    val v = sql1(
      "CAST(CAST(CAST(CAST(round(42995.82 * 100) AS BIGINT) AS DECIMAL(14,2)) / 100 AS DECIMAL(12,2)) AS STRING)")
    assert(v === "42995.82")
  }
}
