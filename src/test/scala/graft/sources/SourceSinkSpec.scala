package graft.sources

import graft.{Ddl, SparkSpec}
import graft.sinks.TableSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class SourceSinkSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("JSON permissive mode tolerates malformed records (reference abort_on_error=false)") {
    val dir = tmp("json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": {"k": 10}}
        |this is not json at all
        |{"id": 2, "v": {"k": 20}}
        |{"id": 3, "v": "wrong shape"}
        |""".stripMargin)
    val schema = StructType.fromDDL("id BIGINT, v STRUCT<k: INT>")
    val df = Formats.readJson(spark, dir, schema)
    val good = df.filter(col("v.k").isNotNull).collect()
    assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(df.count() === 4) // malformed rows surface as null rows, scan never fails
  }

  test("nested JSON roundtrip preserves struct values") {
    import spark.implicits._
    val dir = tmp("json_rt")
    val src = Seq((1L, ("a", 10)), (2L, ("b", 20))).toDF("id", "pair")
      .select(col("id"), struct(col("pair._1").as("s"), col("pair._2").as("n")).as("nested"))
    src.write.mode("overwrite").json(dir)
    val back = Formats.readJson(spark, dir, StructType.fromDDL("id BIGINT, nested STRUCT<s: STRING, n: INT>"))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getStruct(1).getString(0))).toSeq
      === Seq((1L, "a"), (2L, "b")))
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    import spark.implicits._
    val dir = tmp("sink")
    val base = Seq((1, "a"), (2, "a"), (3, "b"), (4, "c")).toDF("id", "p")
    TableSink.insertOverwrite(base, dir, Seq("p"))
    // dynamic overwrite touching only partition 'a'
    TableSink.insertOverwriteDynamic(Seq((9, "a")).toDF("id", "p"), dir, Seq("p"))
    val back = TableSink.read(spark, dir).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back === Set((9, "a"), (3, "b"), (4, "c"))) // b,c untouched; a replaced
    // append (INSERT INTO)
    TableSink.insertInto(Seq((7, "b")).toDF("id", "p"), dir, Seq("p"))
    assert(TableSink.read(spark, dir).count() === 4)
  }

  test("unquoted delimited text: ESCAPED BY and \\N NULL-string semantics") {
    val dir = tmp("delim_unquoted")
    // reference text-scanner semantics (LazySimpleSerDe, no quoting):
    // '|' fields, backslash escapes an embedded delimiter, bare \N is NULL
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.txt"),
      "1|plain|1.5\n" +
        "2|pipe\\|inside|2.5\n" +
        "3|\\N|3.5\n")
    val schema = StructType.fromDDL("id INT, name STRING, score DOUBLE")
    val rows = Formats.readDelimitedUnquoted(spark, dir, schema,
        delimiter = "|", escape = "\\")
      .orderBy("id").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1, Some("plain"), 1.5),
      (2, Some("pipe|inside"), 2.5),
      (3, None, 3.5)))
  }

  test("quoted delimited text honors escape-in-quotes, NULL-string, and header") {
    val dir = tmp("delim_opts")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id|name|score\n" +
        "1|plain|1.5\n" +
        "2|\"pipe|inside\"|2.5\n" +
        "3|\\N|3.5\n")
    val schema = StructType.fromDDL("id INT, name STRING, score DOUBLE")
    val rows = Formats.readDelimited(spark, dir, schema,
        delimiter = "|", escape = "\\", header = true)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1, Some("plain"), 1.5),
      (2, Some("pipe|inside"), 2.5),
      (3, None, 3.5)))
  }

  test("ragged text rows: missing trailing columns read NULL, extra columns drop") {
    // reference misc.test tblwithraggedcolumns: text rows shorter or wider
    // than the declared schema must scan, never fail
    val dir = tmp("ragged")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "a,1\n" +
        "NoTrailingColumn\n" +
        "extra,2,surplus,columns\n")
    val schema = StructType.fromDDL("s STRING, i INT")
    val rows = Formats.readDelimited(spark, dir, schema, delimiter = ",")
      .orderBy("s").collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(rows.toSeq === Seq(
      ("NoTrailingColumn", None), ("a", Some(1)), ("extra", Some(2))))
  }

  test("parquet schema evolution: files with added columns merge; old files read NULL") {
    import spark.implicits._
    val dir = tmp("evolve")
    Seq((1, "a")).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.get(2))))
    assert(rows.toSeq === Seq((1, "a", None), (2, "b", Some(9.5))))
  }

  test("NULL partition key lands in __HIVE_DEFAULT_PARTITION__ and reads back as NULL") {
    import spark.implicits._
    val dir = tmp("sink_null")
    val df = Seq((1, Some("x")), (2, None), (3, Some("y"))).toDF("id", "p")
    TableSink.insertOverwrite(df, dir, Seq("p"))
    // on-disk layout uses the Hive sentinel directory (insert_null.test)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("p=__HIVE_DEFAULT_PARTITION__"), s"dirs=$dirs")
    // and the scan resurfaces it as a NULL, not the sentinel string
    val back = TableSink.read(spark, dir).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(back === Set((1, Some("x")), (2, None), (3, Some("y"))))
  }

  test("mixed static+dynamic partition overwrite replaces only the static subtree") {
    import spark.implicits._
    val dir = tmp("sink_mixed")
    val base = Seq((1, "s1", "a"), (2, "s1", "b"), (3, "s2", "a")).toDF("id", "st", "dy")
    TableSink.insertOverwrite(base, dir, Seq("st", "dy"))
    // PARTITION (st='s1', dy): only (s1, a) is in the incoming data, so
    // (s1, b) and the whole s2 subtree survive
    TableSink.insertOverwriteStaticDynamic(
      Seq((9, "a")).toDF("id", "dy"), dir, Seq("st" -> "s1"), Seq("dy"))
    val back = TableSink.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(back === Set((9, "s1", "a"), (2, "s1", "b"), (3, "s2", "a")))
  }

  test("INSERT targets non-parquet formats: CSV and JSON write/read roundtrip") {
    import spark.implicits._
    val df = Seq((1, "a|x", 1.5), (2, "b", 2.5)).toDF("id", "name", "score")
    val csvDir = tmp("sink_csv")
    // '|' row format with quoting — the reference text-table sink surface
    TableSink.insertOverwrite(df, csvDir, format = "csv",
      options = Map("delimiter" -> "|", "header" -> "true", "quote" -> "\""))
    val csvBack = TableSink.read(spark, csvDir, "csv",
      Map("delimiter" -> "|", "header" -> "true", "inferSchema" -> "true"))
    assert(csvBack.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1, "a|x", 1.5), (2, "b", 2.5)))
    val jsonDir = tmp("sink_json")
    TableSink.insertInto(df, jsonDir, format = "json")
    val jsonBack = TableSink.read(spark, jsonDir, "json")
      .select("id", "name", "score")
    assert(jsonBack.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "a|x", 1.5), (2L, "b", 2.5)))
  }

  test("INSERT OVERWRITE from the same table stages then swaps (self-read overwrite)") {
    import spark.implicits._
    // the direct form is not merely rejected — Spark truncates the target
    // BEFORE the read fails, destroying the data (witnessed on a scratch
    // copy), which is exactly why the staged swap must exist
    val scratch = tmp("sink_self_direct") + "/t"
    Seq((9, 90)).toDF("id", "v").write.parquet(scratch)
    intercept[Exception] {
      TableSink.read(spark, scratch).withColumn("v", col("v") * 2)
        .write.mode("overwrite").parquet(scratch)
    }
    val dir = tmp("sink_self") + "/t"
    Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v").write.parquet(dir)
    val doubled = TableSink.read(spark, dir).withColumn("v", col("v") * 2)
    TableSink.insertOverwriteFromSelf(doubled, dir)
    val back = TableSink.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(back.toSeq === Seq((1, 20), (2, 40), (3, 60)))
    // no staging/old residue
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName).toSet
    assert(parent === Set("t"), s"staging dirs must be cleaned: $parent")
  }

  test("CREATE TABLE LIKE PARQUET lifts the footer schema; COMPUTE STATS runs") {
    import spark.implicits._
    val dir = tmp("like_parquet")
    Seq((1L, "x", 1.5)).toDF("id", "name", "score").write.mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS like_t")
    Ddl.createTableLikeParquet(spark, "like_t", dir)
    val schema = spark.table("like_t").schema
    assert(schema.fieldNames.toSeq === Seq("id", "name", "score"))
    Ddl.computeStats(spark, "like_t")
    assert(Ddl.describe(spark, "like_t").count() > 0)
    spark.sql("DROP TABLE like_t")
  }

  test("APPX_COUNT_DISTINCT rewrite swaps exact distinct for HLL++ when enabled") {
    import spark.implicits._
    val df = (1 to 5000).map(i => i % 1000).toDF("x")
    df.createOrReplaceTempView("acd_t")
    val exact = spark.sql("SELECT count(DISTINCT x) FROM acd_t").collect()(0).getLong(0)
    assert(exact === 1000)
    spark.conf.set(graft.plans.AppxCountDistinctRewrite.ConfKey, "true")
    try {
      val appx = spark.sql("SELECT count(DISTINCT x) FROM acd_t").collect()(0).getLong(0)
      assert(math.abs(appx - 1000) <= 50 && appx != 0, s"appx=$appx")
      // plan no longer contains an exact distinct expansion
      val plan = spark.sql("SELECT count(DISTINCT x) FROM acd_t").queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct") || !plan.contains("distinct"), plan)
    } finally spark.conf.set(graft.plans.AppxCountDistinctRewrite.ConfKey, "false")
  }

  test("hidden files (dot/underscore prefixed) are skipped by every scanner") {
    // reference hidden-files.test: files named .foo or _foo inside a table
    // dir are invisible to scans. At scale this is what makes in-flight
    // copies (_copying.tmp) and marker files (_SUCCESS) safe to colocate
    // with data.
    import spark.implicits._
    val dir = tmp("hidden")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"), "1\n2\n3\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/.hidden.csv"), "100\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_in_flight.csv"), "200\n")
    val schema = StructType.fromDDL("i INT")
    assert(Formats.readDelimited(spark, dir, schema).as[Int].collect().sorted.toSeq
      === Seq(1, 2, 3))
    // parquet: a dot-prefixed copy of a real data file must stay invisible
    val pdir = tmp("hidden_pq")
    Seq(1, 2, 3).toDF("i").coalesce(1).write.mode("overwrite").parquet(pdir)
    val part = new java.io.File(pdir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$pdir/.staging-${part.getName}"))
    assert(spark.read.parquet(pdir).count() === 3,
      "the dot-prefixed staging copy must not double the scan")
  }

  test("a 10MB single string value survives scan and projection (wide-row.test)") {
    // reference wide-row.test: string_col is 10MB; length() must see every
    // byte. Guards the row-size path (one value > default page sizes).
    import spark.implicits._
    val dir = tmp("wide_value")
    val big = "x" * (10 * 1024 * 1024)
    Seq((1, big)).toDF("id", "string_col").write.mode("overwrite").parquet(dir)
    val len = spark.read.parquet(dir).select(length(col("string_col"))).collect()(0).getInt(0)
    assert(len === 10 * 1024 * 1024)
  }
}
