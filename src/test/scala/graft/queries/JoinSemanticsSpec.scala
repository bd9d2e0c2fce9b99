package graft.queries

import graft.SparkSpec

/** Join-type semantics on literal relations — the NULL edge cases the
  * reference's planner tests pin down (joins.test / subquery-rewrite.test
  * shapes): NOT IN vs NOT EXISTS divergence when the subquery produces
  * NULLs, and outer-join null-extension. */
class JoinSemanticsSpec extends SparkSpec {

  private def setup(): Unit = {
    spark.sql("SELECT * FROM VALUES (1), (2), (3), (NULL) AS l(a)").createOrReplaceTempView("l")
    spark.sql("SELECT * FROM VALUES (2), (NULL) AS r(b)").createOrReplaceTempView("r")
    spark.sql("SELECT * FROM VALUES (2), (4) AS r2(b)").createOrReplaceTempView("r2")
  }

  test("NOT IN with NULL in subquery result is empty (null-aware anti)") {
    setup()
    assert(spark.sql("SELECT a FROM l WHERE a NOT IN (SELECT b FROM r)").count() === 0)
  }

  test("NOT IN without NULLs keeps non-matching non-null rows") {
    setup()
    val rows = spark.sql("SELECT a FROM l WHERE a NOT IN (SELECT b FROM r2) ORDER BY a")
      .collect().map(_.get(0))
    assert(rows.toSeq === Seq(1, 3)) // NULL row filtered: NULL NOT IN (...) is unknown
  }

  test("NOT EXISTS keeps the NULL row (plain anti join)") {
    setup()
    val rows = spark.sql(
      "SELECT a FROM l WHERE NOT EXISTS (SELECT 1 FROM r2 WHERE r2.b = l.a) ORDER BY a")
      .collect().map(_.get(0))
    assert(rows.toSeq === Seq(null, 1, 3))
  }

  test("full outer extends both sides with NULLs") {
    setup()
    val n = spark.sql(
      """SELECT count(*) FROM l FULL OUTER JOIN r2 ON l.a = r2.b""").collect()(0).getLong(0)
    // matched: (2,2); left-only: 1,3,NULL; right-only: 4 → 5 rows
    assert(n === 5)
  }

  test("semi join emits each left row at most once") {
    spark.sql("SELECT * FROM VALUES (1), (1), (2) AS s(k)").createOrReplaceTempView("s_dup")
    spark.sql("SELECT * FROM VALUES (1), (1) AS t(k)").createOrReplaceTempView("t_dup")
    val rows = spark.sql(
      "SELECT k FROM s_dup WHERE EXISTS (SELECT 1 FROM t_dup WHERE t_dup.k = s_dup.k)")
      .collect().map(_.getInt(0)).toSeq
    assert(rows.sorted === Seq(1, 1)) // both left dup rows kept, no multiplication
  }
}
