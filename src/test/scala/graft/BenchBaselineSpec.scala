package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Bench's committed-baseline parsing, including the r12 sf tag: a
  * baseline recorded at one scale must not flag "regressions" against a
  * sweep at another (the r11 soak flagged the entire catalog and forced
  * a full isolation pass by comparing a 10d-corpus sweep to the sf0.1
  * baseline). */
class BenchBaselineSpec extends AnyFunSuite {

  private def write(s: String): String = {
    val p = Files.createTempFile("bench_baseline", ".json")
    Files.writeString(p, s)
    p.toString
  }

  test("parses queries map and a bare-number sf tag") {
    val (qs, sf) = Bench.loadBaseline(write(
      """{"metric":"total","value":9.1,"queries":{"q1":1.5,"q2":0.25},"sf":0.1}"""))
    assert(qs === Map("q1" -> 1.5, "q2" -> 0.25))
    assert(sf === Some("0.1"))
  }

  test("parses a quoted non-numeric sf tag (soak corpora)") {
    val (_, sf) = Bench.loadBaseline(write(
      """{"queries":{"q1":2.0},"sf":"10d"}"""))
    assert(sf === Some("10d"))
  }

  test("missing file yields an empty baseline") {
    val (qs, sf) = Bench.loadBaseline("/nonexistent/bench.json")
    assert(qs.isEmpty && sf.isEmpty)
  }

  test("legacy baseline without an sf field still parses its queries") {
    val (qs, sf) = Bench.loadBaseline(write("""{"queries":{"q1":1.0}}"""))
    assert(qs === Map("q1" -> 1.0))
    assert(sf.isEmpty)
  }

  test("the committed repo baseline carries a parseable sf tag") {
    val (qs, sf) = Bench.loadBaseline("bench_committed.json")
    assert(qs.nonEmpty)
    assert(sf === Some("0.1"))
  }
}
