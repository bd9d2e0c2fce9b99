package graft.functions

import graft.SparkSpec

/** Golden tests for the fnv_hash Catalyst expression.
  *
  * String vectors are the published FNV-1a 64-bit test vectors (public
  * algorithm; same recurrence as reference be/src/util/hash-util.h:112-119).
  * Fixed-width vectors are derived non-circularly: expected values come from
  * hashing explicit little-endian byte arrays with hashBytes, and the SQL
  * function must agree when hashing the typed value.
  */
class FnvHashSpec extends SparkSpec {

  test("fnv-1a 64 public string vectors") {
    assert(sql1("fnv_hash('')") === 0xcbf29ce484222325L)
    assert(sql1("fnv_hash('a')") === 0xaf63dc4c8601ec8cL)
    assert(sql1("fnv_hash('foobar')") === 0x85944171f73967e8L)
  }

  test("fixed-width numerics hash their little-endian bytes") {
    // int 1 → bytes 01 00 00 00
    assert(sql1("fnv_hash(1)") === FnvHash64.hashBytes(Array[Byte](1, 0, 0, 0), 4))
    // bigint 1 → 8 LE bytes
    assert(sql1("fnv_hash(CAST(1 AS BIGINT))") ===
      FnvHash64.hashBytes(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), 8))
    // smallint -2 → fe ff
    assert(sql1("fnv_hash(CAST(-2 AS SMALLINT))") ===
      FnvHash64.hashBytes(Array[Byte](-2, -1), 2))
    // tinyint hashes one byte; differs from the 4-byte int hash of same value
    assert(sql1("fnv_hash(CAST(7 AS TINYINT))") === FnvHash64.hashBytes(Array[Byte](7), 1))
    assert(sql1("fnv_hash(CAST(7 AS TINYINT))") !== sql1("fnv_hash(7)"))
  }

  test("double hashes IEEE bits; boolean hashes one byte") {
    val bits = java.lang.Double.doubleToLongBits(2.5)
    val le = (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
    assert(sql1("fnv_hash(CAST(2.5 AS DOUBLE))") === FnvHash64.hashBytes(le, 8))
    assert(sql1("fnv_hash(true)") === FnvHash64.hashBytes(Array[Byte](1), 1))
    assert(sql1("fnv_hash(false)") === FnvHash64.hashBytes(Array[Byte](0), 1))
  }

  test("null in, null out; works under codegen over a column") {
    assert(sql1("fnv_hash(CAST(NULL AS STRING))") === null)
    import spark.implicits._
    val hashed = Seq("x", "y", "x").toDF("s")
      .selectExpr("fnv_hash(s) AS h").collect().map(_.getLong(0))
    assert(hashed(0) === hashed(2))
    assert(hashed(0) !== hashed(1))
  }
}
