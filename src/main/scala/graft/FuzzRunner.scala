package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Differential-fuzzing runner (the reference's random-query-generator
  * analogue: tests/comparison/discrepancy_searcher.py generates random
  * queries and cross-checks the engine against a reference database).
  *
  * Reads a JSON-lines file of {"name":..., "sql":...} (parsed with
  * Spark's own JSON source — no extra deps), executes each statement
  * through the engine's SQL surface against SPARK_GRAFT_SF_DIR, and
  * writes outDir/<name>.parquet per query plus outDir/errors.json for
  * statements the engine rejects. tools/fuzz.py generates the corpus,
  * runs the same SQL in DuckDB, and compares with the driver-calibrated
  * signature from tools/check.py.
  *
  * Usage: runMain graft.FuzzRunner <queries.jsonl> <outDir>
  */
object FuzzRunner {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FuzzRunner <queries.jsonl> <outDir>")
    val Array(queriesPath, outDir) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = EngineSession.build(master = s"local[$cpus]", appName = "graft-fuzz")

    // write-path corpora (fuzz.py --write) carry optional DML scripts:
    // `setup` statements run before the probe, `teardown` after (always,
    // so a failed record can't leak catalog tables into the next one)
    val raw = spark.read.json(queriesPath)
    def strList(r: org.apache.spark.sql.Row, col: String): Seq[String] =
      if (!raw.columns.contains(col) || r.isNullAt(r.fieldIndex(col))) Nil
      else r.getSeq[String](r.fieldIndex(col))
    val specs = raw.collect().map { r =>
      (r.getString(r.fieldIndex("name")), r.getString(r.fieldIndex("sql")),
        strList(r, "setup"), strList(r, "teardown"))
    }
    Tables.ensureViews(spark, sfDir)

    Files.createDirectories(Paths.get(outDir))
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    specs.foreach { case (name, sql, setup, teardown) =>
      try {
        setup.foreach(EngineSession.sql(spark, _).collect())
        EngineSession.sql(spark, sql)
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(300)
          errors += s"""{"name":"$name","error":"$msg"}"""
      } finally {
        teardown.foreach { s =>
          try EngineSession.sql(spark, s).collect()
          catch { case _: Throwable => () }
        }
      }
    }
    Files.write(Paths.get(s"$outDir/errors.json"),
      errors.asJava, StandardCharsets.UTF_8)
    println(s"FUZZ_DONE ran=${specs.length} errors=${errors.length}")
    spark.stop()
  }
}
