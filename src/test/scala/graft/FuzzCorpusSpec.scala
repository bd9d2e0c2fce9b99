package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

/** Replays every committed differential-fuzz corpus through the engine
  * and pins each query's (row count, canonical result hash).
  *
  * Corpora are generated seed-pinned by tools/fuzz.py (the Spark-era
  * analogue of the reference's random query generator,
  * tests/comparison/discrepancy_searcher.py + query_generator.py, which
  * cross-checked random SELECTs against Postgres) and every query was
  * hash-verified against DuckDB with the driver-calibrated comparator at
  * generation time: seed 42 is the v1 grammar (joins x aggs x windows x
  * set-ops x subqueries), seed 43 the v2 grammar (ROLLUP/CUBE/GROUPING
  * SETS, agg FILTER, CTE pipelines, scalar subqueries in projections,
  * NTILE/FIRST_VALUE/LAST_VALUE, INTERSECT/EXCEPT ALL, EXTRACT). Each
  * corpus JSONL is self-contained — replay never re-runs the generator,
  * so grammar growth cannot drift an already-committed corpus.
  *
  * This spec makes the DuckDB agreement durable OFFLINE: any engine
  * change that alters any pinned result fails here by corpus+name
  * without needing DuckDB in the loop. Re-establish cross-engine
  * agreement (and regenerate pins) with:
  *   python3 tools/fuzz.py --seed NN --n 1000   # must exit 0
  *   GRAFT_REGEN_FUZZ=1 sbt "testOnly graft.FuzzCorpusSpec"
  *
  * The hash is engine-side only (column-name-sorted, row-sorted, cell
  * toString) — it need not match check.py's Python hash; cross-engine
  * truth is fuzz.py's job, cross-run stability is this spec's.
  */
class FuzzCorpusSpec extends SparkSpec {

  private val fuzzDir = Paths.get("src/test/resources/fuzz")
  private val goldenDir = Paths.get("src/test/resources/golden")
  private val regen = sys.env.contains("GRAFT_REGEN_FUZZ")
  // Corpora generated before the sf field existed (seeds 42/43) ran at
  // the smallest driver SF; newer corpora carry their SF per record so
  // the replay uses the data the DuckDB agreement was established on.
  private val defaultSf = "sf0.001"

  private def corpora: Seq[(String, Path)] =
    Files.list(fuzzDir).iterator().asScala
      .filter(_.getFileName.toString.matches("corpus_seed\\d+\\.jsonl"))
      .map(p => (p.getFileName.toString
        .stripPrefix("corpus_").stripSuffix(".jsonl"), p))
      .toSeq.sortBy(_._1)

  /** One replayable record: write-path corpora (fuzz.py --write) carry a
    * DML script around the probe; SELECT corpora have empty script lists. */
  private case class Rec(name: String, sql: String,
                         setup: Seq[String], teardown: Seq[String])

  /** Returns (sfDir, records). A corpus is generated against ONE SF; a
    * mixed-sf corpus is a generation bug and fails loudly here. */
  private def loadCorpus(p: Path): (String, Seq[Rec]) = {
    import spark.implicits._
    val raw = spark.read.json(p.toString)
    val sf =
      if (raw.columns.contains("sf")) {
        val sfs = raw.select("sf").distinct().as[String].collect().toSeq
        assert(sfs.size == 1, s"$p mixes scale factors: $sfs")
        sfs.head
      } else defaultSf
    def optList(r: org.apache.spark.sql.Row, col: String): Seq[String] =
      if (!raw.columns.contains(col) || r.isNullAt(r.fieldIndex(col))) Nil
      else r.getSeq[String](r.fieldIndex(col))
    val qs = raw.collect().toSeq.map { r =>
      Rec(r.getString(r.fieldIndex("name")), r.getString(r.fieldIndex("sql")),
        optList(r, "setup"), optList(r, "teardown"))
    }.sortBy(_.name)
    (s"/root/testdata/$sf", qs)
  }

  /** Deterministic engine-side signature: columns sorted by name, cells
    * rendered with type-stable text, rows sorted, sha256. */
  private def signature(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val names = df.columns.sorted
    val ordered = df.select(names.map(org.apache.spark.sql.functions.col): _*)
    val rows = ordered.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null => "NULL"
          case d: Double => if (d.isNaN) "NaN" else d.toString
          case f: Float => if (f.isNaN) "NaN" else f.toString
          case other => other.toString
        }
      }.mkString("")
    }.sorted
    val md = MessageDigest.getInstance("SHA-256")
    rows.foreach { r => md.update(r.getBytes(StandardCharsets.UTF_8)); md.update('\n'.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def run(sfDir: String, corpus: Seq[Rec]): Map[String, (Long, String)] = {
    // registerAll, not ensureViews: the shared test session may have had a
    // fixture view overwritten by another suite without the memo knowing.
    Tables.registerAll(spark, sfDir)
    corpus.map { rec =>
      try {
        rec.setup.foreach(EngineSession.sql(spark, _).collect())
        rec.name -> signature(EngineSession.sql(spark, rec.sql))
      } finally rec.teardown.foreach { s =>
        try EngineSession.sql(spark, s).collect()
        catch { case _: Throwable => () }
      }
    }.toMap
  }

  private def loadGolden(p: Path): Map[String, (Long, String)] = {
    assert(Files.exists(p), s"$p missing — regenerate with GRAFT_REGEN_FUZZ=1")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(name, n, h) = l.split("\t", 3)
        name -> (n.toLong, h)
      }.toMap
  }

  corpora.foreach { case (tag, corpusPath) =>
    val goldenPath = goldenDir.resolve(s"fuzz_$tag.golden")
    val seed = tag.stripPrefix("seed")
    // GRAFT_REGEN_FUZZ=1 regenerates every corpus' pins;
    // GRAFT_REGEN_FUZZ=seed52,seed53 only the named ones (the others
    // replay-verify as usual — a new corpus shouldn't force re-running
    // 7000 pinned queries).
    val regenThis = regen && {
      val v = sys.env("GRAFT_REGEN_FUZZ")
      v == "1" || v.split(',').contains(tag)
    }
    if (regenThis) {
      test(s"regenerate fuzz corpus goldens [$tag]") {
        val (sfDir, corpus) = loadCorpus(corpusPath)
        // keep an existing golden's header verbatim: headers carry
        // hand-written grammar-rev provenance (which seeds can still be
        // regenerated by the CURRENT grammar vs. replay-only frozen
        // streams) that a regen must not clobber
        val header: Seq[String] =
          if (Files.exists(goldenPath))
            Files.readAllLines(goldenPath, StandardCharsets.UTF_8).asScala
              .takeWhile(_.startsWith("#")).toSeq
          else Seq(
            s"# Engine result pins for the $tag differential-fuzz corpus " +
              s"at ${sfDir.split('/').last}.",
            "# Columns: name<TAB>rowcount<TAB>sha256. Regenerate ONLY after",
            s"# `python3 tools/fuzz.py --seed $seed` exits 0 (DuckDB agreement):",
            s"#   GRAFT_REGEN_FUZZ=$tag sbt 'testOnly graft.FuzzCorpusSpec'")
        val lines = run(sfDir, corpus).toSeq.sortBy(_._1)
          .map { case (n, (c, h)) => s"$n\t$c\t$h" }
        Files.createDirectories(goldenPath.getParent)
        Files.write(goldenPath, (header ++ lines).asJava, StandardCharsets.UTF_8)
        info(s"wrote ${lines.size} pins to $goldenPath")
      }
    } else if (regen) {
      // named-regen mode: unnamed corpora are skipped (their pins are
      // untouched; the ordinary replay run still guards them in CI)
      ignore(s"fuzz corpus replays with pinned results [$tag]") {}
    } else {
      test(s"fuzz corpus replays with pinned results [$tag]") {
        val (sfDir, corpus) = loadCorpus(corpusPath)
        val golden = loadGolden(goldenPath)
        assert(golden.size === corpus.size,
          s"corpus/golden drift: ${corpus.size} queries vs ${golden.size} pins")
        val actual = run(sfDir, corpus)
        val bad = actual.collect {
          case (name, got) if golden.get(name).exists(_ != got) =>
            s"$name: got rows=${got._1} hash=${got._2.take(12)}.. " +
              s"expected rows=${golden(name)._1} hash=${golden(name)._2.take(12)}.."
        }
        assert(bad.isEmpty,
          s"${bad.size} corpus queries drifted:\n  " + bad.take(10).mkString("\n  "))
      }
    }
  }
}
