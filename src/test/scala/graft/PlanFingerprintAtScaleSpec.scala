package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.plans.PlanFingerprint

/** AT-SCALE physical-plan goldens — the heavy-entry catalog pinned at
  * sf0.1 with both the INITIAL and the AQE-FINAL plan (VERDICT_r09
  * "What's missing" #3: the sf0.001 goldens cannot see the decisions
  * that only trip behind size gates — the `Tables.parallelized`
  * exchange, broadcast-vs-SMJ flips, AQE's runtime join demotions and
  * skew splits; the reference pins its plans WITH table stats for the
  * same reason, PlannerTest runs ANALYZE'd fixtures).
  *
  * Stats parity note: every entry reads path-based parquet, where Spark
  * takes `sizeInBytes` directly from the FileIndex — real on-disk
  * numbers, the exact signal `ANALYZE TABLE ... COMPUTE STATISTICS`
  * would persist for a catalog table. So these goldens ARE stats-backed
  * plans; there is no un-ANALYZE'd gap to close for this catalog.
  *
  * Each golden line pins `name<TAB>initial<TAB>final`:
  *   initial — the pre-execution adaptive plan (what the static planner
  *     chose given sf0.1 stats);
  *   final   — the re-planned tree after the entry EXECUTES at sf0.1
  *     (what AQE actually ran: runtime broadcast promotions, coalesced
  *     stages, skew-join splits). A diff in either column is a changed
  *     at-scale distributed-plan decision and must be explainable.
  *
  * Regenerate after an INTENTIONAL plan change with:
  *   GRAFT_REGEN_PLANS_SF01=1 sbt "testOnly graft.PlanFingerprintAtScaleSpec"
  */
class PlanFingerprintAtScaleSpec extends SparkSpec {

  private val goldenPath = Paths.get("src/test/resources/golden/plan_fingerprints_sf01.golden")
  private val regen = sys.env.contains("GRAFT_REGEN_PLANS_SF01")
  private val sfDir = "/root/testdata/sf0.1"

  /** The entries whose cost is data-dependent enough for at-scale plans
    * to mean something — the soak tool's heavy list (dedup + similarity
    * + text/pipeline families, plus the shuffle-heaviest relational
    * shapes as a control group), kept in sync with tools/soak.py. */
  private val heavy = Seq(
    "q_dedup_exact", "q_dedup_lines", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_components", "q_dedup_cosine",
    "q_dedup_cosine_ivf", "q_contamination", "q_dedup_substring",
    "q_sim_search", "q_sim_search_lsh", "q_sim_search_ivf",
    "q_sim_search_q8", "q_sim_search_q8_raw",
    "q_pipeline_e2e", "q_split_leakage_safe", "q_text_stats",
    "q_rep_filters", "q_quality_filter", "q_mix_weighted", "q_vocab_topk",
    "q_vocab_topk_approx", "q_bm25_topk",
    "q_pack", "q_chunk", "q_text_scrub", "q_text_fingerprints",
    "q_sessionize",
    "q1_agg", "q3_join", "q9_profit", "q18_large_orders",
    "q21_waiting_supplier", "q_stress_selfjoin", "q_window_frames",
    "q_agg_approx", "q_perf_agg_highcard", "q_perf_string_grep")

  /** Entries whose AQE-FINAL plan is nondeterministic BY CONSTRUCTION and
    * is therefore pinned as UNSTABLE (initial plan still pinned): the
    * pipeline persists its survivor boundary and feeds it to several
    * downstream branches; each branch's query stages re-plan against the
    * cached relation's stats, which flip from estimated to accurate the
    * moment the first consumer materializes the cache — so runtime
    * broadcast promotions on the OTHER branches depend on stage
    * scheduling order (measured: two same-config fresh-JVM runs produced
    * SMJ:LeftOuter vs BHJ:LeftOuter on the boundary join; both valid,
    * both hash-green). q_dedup_cosine_ivf is the same class: its IVF
    * index (trained centroids) is a persisted multi-consumer boundary,
    * and AQE flips the BUILD SIDE of the 1-row-broadcast stats cross
    * join (BNLJ BuildLeft vs BuildRight — same join, same data) between
    * fresh JVMs depending on which consumer materializes the cache
    * first. */
  private val aqeFinalUnstable = Set("q_pipeline_e2e", "q_dedup_cosine_ivf")
  private val UNSTABLE = "UNSTABLE"

  /** (initial, final) fingerprints: the final one requires executing the
    * entry — collect() drives the SAME AdaptiveSparkPlanExec instance
    * the fingerprint walks (a different action shape would execute a
    * different QueryExecution and leave this one un-finalized). */
  private def fingerprints(name: String): (String, String) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val initial = PlanFingerprint.of(df)
    df.collect()
    val fin = if (aqeFinalUnstable(name)) UNSTABLE else PlanFingerprint.of(df)
    (initial, fin)
  }

  private lazy val actual: Map[String, (String, String)] = {
    spark.catalog.clearCache()
    heavy.map(n => n -> fingerprints(n)).toMap
  }

  if (regen) {
    test("regenerate at-scale plan fingerprint goldens") {
      val header = Seq(
        "# At-scale physical-plan fingerprints (sf0.1, local[4] test session):",
        "# name<TAB>initial-plan<TAB>AQE-final-plan for the heavy-entry list.",
        "# Regenerate with:",
        "#   GRAFT_REGEN_PLANS_SF01=1 sbt 'testOnly graft.PlanFingerprintAtScaleSpec'")
      val lines = actual.toSeq.sortBy(_._1).map { case (n, (i, f)) => s"$n\t$i\t$f" }
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, (header ++ lines).asJava, StandardCharsets.UTF_8)
      info(s"wrote ${lines.size} at-scale pins to $goldenPath")
    }
  } else {
    lazy val golden: Map[String, (String, String)] = {
      assert(Files.exists(goldenPath), s"$goldenPath missing — regenerate " +
        "with GRAFT_REGEN_PLANS_SF01=1 sbt 'testOnly graft.PlanFingerprintAtScaleSpec'")
      Files.readAllLines(goldenPath, StandardCharsets.UTF_8).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val Array(name, i, f) = l.split("\t", 3)
          name -> (i, f)
        }.toMap
    }

    test("golden file covers exactly the heavy-entry list") {
      assert(golden.keySet === heavy.toSet,
        s"missing=${heavy.toSet -- golden.keySet} stale=${golden.keySet -- heavy.toSet}")
    }

    heavy.foreach { name =>
      test(s"at-scale plan fingerprint: $name") {
        val (gi, gf) = golden(name)
        val (ai, af) = actual(name)
        assert(ai === gi, s"INITIAL sf0.1 plan drifted for $name")
        assert(af === gf, s"AQE-FINAL sf0.1 plan drifted for $name")
      }
    }
  }
}
