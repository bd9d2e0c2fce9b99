package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.plans.PlanFingerprint

/** Catalog-WIDE physical-plan goldens — one pinned fingerprint per
  * `SparkEntry.queries` entry (the reference pins full distributed plan
  * text for every workload query: PlannerTest.java over
  * functional-planner/queries/PlannerTest/tpch-all.test, tpcds-all.test).
  *
  * GoldenExplainSpec/PlannerFamilySpec pin ~20 hand-chosen shapes in
  * depth; this suite closes the gap for the other ~100 entries with the
  * compact PlanFingerprint signature, so a silently-degraded strategy
  * (broadcast flipping to sort-merge after a stats change, a lost
  * partial-agg phase, a widened scan) fails HERE instead of staying
  * hash-green and surfacing as a bench ghost at scale.
  *
  * Regenerate after an INTENTIONAL plan change with:
  *   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * then review the golden diff like source — every changed line is a
  * changed distributed-plan decision and must be explainable.
  */
class PlanFingerprintSpec extends SparkSpec {

  private val goldenPath = Paths.get("src/test/resources/golden/plan_fingerprints.golden")
  private val regen = sys.env.contains("GRAFT_REGEN_PLANS")
  private val sfDir = "/root/testdata/sf0.001"

  /** All fingerprints, computed once in sorted entry order. The order and
    * the leading clearCache make within-sweep cache state (entries that
    * persist intermediate tables) deterministic regardless of which other
    * suites ran before in this JVM. */
  private lazy val actual: Map[String, String] = {
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> PlanFingerprint.of(fn(spark, sfDir))
    }.toMap
  }

  private def loadGolden(): Map[String, String] = {
    assert(Files.exists(goldenPath),
      s"$goldenPath missing — regenerate with GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanFingerprintSpec'")
    Files.readAllLines(goldenPath, StandardCharsets.UTF_8).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(name, fp) = l.split("\t", 2)
        name -> fp
      }.toMap
  }

  if (regen) {
    test("regenerate plan fingerprint goldens") {
      val header = Seq(
        "# Physical-plan fingerprints per SparkEntry.queries entry at sf0.001",
        "# (PlanFingerprint signature; local[4] test session). Regenerate with:",
        "#   GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanFingerprintSpec'")
      val lines = actual.toSeq.sortBy(_._1).map { case (n, f) => s"$n\t$f" }
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, (header ++ lines).asJava, StandardCharsets.UTF_8)
      info(s"wrote ${lines.size} fingerprints to $goldenPath")
    }
  } else {
    test("golden file covers exactly the current catalog") {
      val golden = loadGolden()
      val missing = SparkEntry.queries.keySet -- golden.keySet
      val stale = golden.keySet -- SparkEntry.queries.keySet
      assert(missing.isEmpty && stale.isEmpty,
        s"catalog/golden drift — missing=${missing.toSeq.sorted} stale=${stale.toSeq.sorted}; " +
          "regenerate with GRAFT_REGEN_PLANS=1")
    }

    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      test(s"plan fingerprint: $name") {
        val golden = loadGolden()
        assume(golden.contains(name)) // coverage test above reports the drift
        assert(actual(name) === golden(name),
          s"physical plan drifted for $name — if intentional, regenerate goldens and review the diff")
      }
    }
  }
}
