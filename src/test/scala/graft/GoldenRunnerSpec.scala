package graft

/** E2E golden runner — executes a `.test`-style corpus (the reference's
  * QueryTest format: ---- QUERY / ---- RESULTS / ---- TYPES sections,
  * testdata/workloads/functional-query/queries/QueryTest) against the
  * sf0.001 tables through the engine's SQL surface. */
class GoldenRunnerSpec extends SparkSpec {

  case class Case(sql: String, rows: Seq[String], types: Seq[String])

  private def parse(text: String): Seq[Case] =
    text.split("====").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { block =>
      val lines = block.linesIterator.filterNot(_.startsWith("#")).toSeq
      def section(name: String): Seq[String] = {
        val start = lines.indexWhere(_.trim == s"---- $name")
        if (start < 0) Seq.empty
        else lines.drop(start + 1).takeWhile(l => !l.trim.startsWith("---- "))
      }
      val sql = section("QUERY").mkString("\n").trim
      if (sql.isEmpty) None
      else Some(Case(sql, section("RESULTS").map(_.trim).filter(_.nonEmpty),
        // split on commas at nesting depth 0 only, so decimal(p,s) and
        // generic types like map<string,int> each stay one type token
        splitTypes(section("TYPES").mkString(","))))
    }

  private def splitTypes(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '<') => depth += 1; cur += c
      case c @ (')' | '>') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case x => x.toString
  }

  private def runCorpus(resource: String): Unit = {
    Tables.ensureViews(spark, "/root/testdata/sf0.001")
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    val cases = parse(src)
    assert(cases.nonEmpty)
    cases.foreach { c =>
      val df = EngineSession.sql(spark, c.sql)
      val gotTypes = df.schema.fields.map(_.dataType.catalogString).toSeq
      assert(gotTypes === c.types, s"types for: ${c.sql}")
      val gotRows = df.collect().map(_.toSeq.map(render).mkString(",")).toSeq
      assert(gotRows === c.rows, s"rows for: ${c.sql}")
    }
  }

  test("TYPES splitter keeps generic and parameterized types whole") {
    // regression (r6 ADVICE): a naive comma split would shred
    // map<string,int> and decimal(10,2) into broken tokens
    assert(splitTypes("bigint, map<string,int>, decimal(10,2)") ===
      Seq("bigint", "map<string,int>", "decimal(10,2)"))
    assert(splitTypes("array<struct<a:int,b:string>>, string") ===
      Seq("array<struct<a:int,b:string>>", "string"))
    assert(splitTypes("") === Seq.empty)
  }

  test("golden corpus matches expected rows and types") {
    runCorpus("/golden/basic.test")
  }

  test("expr golden corpus (reference expr-test.cc shapes) matches") {
    runCorpus("/golden/expr.test")
  }

  test("subquery golden corpus (reference subquery.test shapes) matches") {
    runCorpus("/golden/subquery.test")
  }

  test("inline-view LIMIT corpus (reference inline-view-limit.test shapes) matches") {
    runCorpus("/golden/inline_view_limit.test")
  }

  test("analytic-functions corpus (reference analytic-fns.test shapes) matches") {
    runCorpus("/golden/analytic.test")
  }

  test("decimal arithmetic corpus (reference decimal.test shapes) matches") {
    runCorpus("/golden/decimal.test")
  }

  test("aggregation corpus (reference aggregation/distinct.test shapes) matches") {
    runCorpus("/golden/aggregation.test")
  }

  test("join-semantics corpus (reference joins/outer-joins.test shapes) matches") {
    runCorpus("/golden/joins.test")
  }

  test("ordering/set-ops corpus (reference sort/top-n/union/values.test shapes) matches") {
    runCorpus("/golden/sort_setops.test")
  }

  test("timestamp/interval corpus (reference timestamp shapes) matches") {
    runCorpus("/golden/timestamp.test")
  }

  test("overflow/limits corpus (reference overflow.test shapes) matches") {
    runCorpus("/golden/overflow.test")
  }

  test("WITH-clause corpus (reference with-clause.test shapes) matches") {
    runCorpus("/golden/with_clause.test")
  }
}
