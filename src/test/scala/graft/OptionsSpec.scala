package graft

import org.apache.spark.sql.functions._

class OptionsSpec extends SparkSpec {

  test("SET option mapping translates semantic options, records inert ones") {
    Options.set(spark, "DISABLE_CODEGEN", "true")
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === "false")
    Options.set(spark, "DISABLE_CODEGEN", "false")
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === "true")
    Options.set(spark, "APPX_COUNT_DISTINCT", "true")
    assert(spark.conf.get(plans.AppxCountDistinctRewrite.ConfKey) === "true")
    Options.set(spark, "APPX_COUNT_DISTINCT", "false")
    Options.set(spark, "COMPRESSION_CODEC", "SNAPPY")
    assert(spark.conf.get("spark.sql.parquet.compression.codec") === "snappy")
    // resource-only option is accepted but inert
    Options.set(spark, "MEM_LIMIT", "2g")
    assert(spark.conf.get("spark.graft.option.mem_limit") === "2g")
    // SET output is the option surface under Impala names, not the raw
    // conf namespace (and never the whole spark.sql.* universe)
    val shown = Options.show(spark)
    assert(shown.get("MEM_LIMIT").contains("2g"))
    assert(shown.contains("COMPRESSION_CODEC"))
    assert(!shown.keys.exists(_.startsWith("spark.sql.")))
  }

  test("SET output echoes option values in the Impala domain, not raw Spark confs") {
    Options.set(spark, "DISABLE_CODEGEN", "true")
    Options.set(spark, "ABORT_ON_ERROR", "true")
    Options.set(spark, "NUM_NODES", "4")
    try {
      val shown = Options.show(spark)
      // the codegen conf reads "false" but the option the user set is true
      assert(shown.get("DISABLE_CODEGEN").contains("true"))
      // reader mode FAILFAST surfaces as the boolean the user typed
      assert(shown.get("ABORT_ON_ERROR").contains("true"))
      assert(shown.get("NUM_NODES").contains("4"))
      Options.set(spark, "ABORT_ON_ERROR", "false")
      assert(Options.show(spark).get("ABORT_ON_ERROR").contains("false"))
      Options.set(spark, "NUM_NODES", "0")
      // restored to the session default = the reference's 0 ("all nodes")
      assert(Options.show(spark).get("NUM_NODES").contains("0"))
    } finally {
      Options.set(spark, "DISABLE_CODEGEN", "false")
      Options.set(spark, "ABORT_ON_ERROR", "false")
      Options.set(spark, "NUM_NODES", "0")
    }
  }

  test("NUM_NODES: 1 collapses shuffle parallelism, 0 restores the default") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    Options.set(spark, "NUM_NODES", "1")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "1")
    // 0 = "use all nodes" (the reference default): reset, not partitions=0
    Options.set(spark, "NUM_NODES", "0")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    // SET still works afterwards (regression: 0 used to throw in SQLConf)
    Options.set(spark, "NUM_NODES", "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")
    Options.set(spark, "NUM_NODES", "0")
  }

  test("EXPLAIN levels return increasingly detailed plans") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v").filter(col("k") > 0)
    val l0 = Options.explain(df, 0)
    val l1 = Options.explain(df, 1)
    val l3 = Options.explain(df, 3)
    assert(l0.contains("Physical Plan"))
    assert(l1.contains("Analyzed Logical Plan") && l1.contains("Optimized Logical Plan"))
    assert(l3.contains("LocalTableScan") || l3.contains("Scan"))
    assert(l1.length > l0.length)
    // SET EXPLAIN_LEVEL drives the session-default form
    Options.set(spark, "EXPLAIN_LEVEL", "1")
    assert(Options.explain(spark, df).contains("Analyzed Logical Plan"))
    Options.set(spark, "EXPLAIN_LEVEL", "0")
    assert(!Options.explain(spark, df).contains("Analyzed Logical Plan"))
  }

  test("UNSET returns options to their defaults (mapped, recorded, NUM_NODES)") {
    // impala_shell do_unset: each class of option must restore its
    // pre-SET state, not a hardcoded value.
    val codegenDefault = spark.conf.get("spark.sql.codegen.wholeStage")
    Options.set(spark, "DISABLE_CODEGEN", "true")
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === "false")
    Options.unset(spark, "DISABLE_CODEGEN")
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === codegenDefault)

    Options.set(spark, "DEBUG_ACTION", "x") // resource-only: recorded, inert
    assert(Options.show(spark).contains("DEBUG_ACTION"))
    Options.unset(spark, "DEBUG_ACTION")
    assert(!Options.show(spark).contains("DEBUG_ACTION"))

    val parallelism = spark.conf.get("spark.sql.shuffle.partitions")
    Options.set(spark, "NUM_NODES", "5")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "5")
    Options.unset(spark, "NUM_NODES")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === parallelism)
    assert(!Options.show(spark).contains("NUM_NODES"))
  }

  test("UNSET restores the SESSION's pre-SET value, not Spark's global default") {
    // ADVICE r8: with a deployment conf like
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.wholeStage=false", plain
    // conf.unset on UNSET DISABLE_CODEGEN would silently turn codegen back
    // ON. The stash must restore what the session actually had.
    val orig = spark.conf.get("spark.sql.codegen.wholeStage")
    // drop any stash a previous test's un-UNSET SET left behind
    spark.conf.unset("spark.graft.stash.spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false") // deployment posture
    try {
      Options.set(spark, "DISABLE_CODEGEN", "false") // per-query: codegen on
      assert(spark.conf.get("spark.sql.codegen.wholeStage") === "true")
      Options.unset(spark, "DISABLE_CODEGEN")
      assert(spark.conf.get("spark.sql.codegen.wholeStage") === "false",
        "UNSET must restore the session's pre-SET posture, not the global default")
      // second SET/UNSET cycle re-stashes from the restored value
      Options.set(spark, "DISABLE_CODEGEN", "false")
      Options.unset(spark, "DISABLE_CODEGEN")
      assert(spark.conf.get("spark.sql.codegen.wholeStage") === "false")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", orig)
  }

  test("summary: per-operator exec metrics off the final adaptive plan") {
    // impala_shell do_summary: after an action, every executed operator
    // reports with its row counts — through AQE's stage wrappers.
    val df = spark.range(1000).selectExpr("id % 7 AS k")
      .groupBy("k").count()
    df.collect()
    val s = Options.summary(df)
    assert(s.contains("HashAggregate"), s"summary missing operators:\n$s")
    assert(s.contains("#rows=7"), s"summary missing final row count:\n$s")
    assert(!s.contains("AdaptiveSparkPlan"),
      "AQE wrappers must be unwrapped to the operators that actually ran")
    // tree depth must be visible (child operators indent)
    assert(s.linesIterator.exists(_.startsWith("  ")), s"no indentation:\n$s")
  }

  test("version identifies the dialect over the loaded Spark runtime") {
    assert(Options.version(spark).matches("graft/\\S+ spark/4\\..+"))
  }

  test("profile: formatted plan plus exec metrics of an executed frame") {
    // impala_shell do_profile: plan shape AND runtime counters in one
    // report — the formatted section carries operator ids / codegen spans,
    // the summary section carries the populated metrics.
    val df = spark.range(500).selectExpr("id % 3 AS k").groupBy("k").count()
    df.collect()
    val p = Options.profile(df)
    assert(p.contains("HashAggregate"), s"profile missing plan operators:\n$p")
    assert(p.contains("Exec Summary:"), "profile missing the metrics section")
    assert(p.contains("#rows=3"), s"profile missing executed row counts:\n$p")
  }

  test("CHAR(n) semantics: table columns pad on read; expression cast does not (documented delta)") {
    // Reference CHAR is 'minimally supported' (types.h:44-47); Spark pads
    // CHAR table columns on read but treats expression-level CHAR casts as
    // plain string — the rpad shim gives Impala cast behavior when needed.
    assert(sql1("CAST('ab' AS CHAR(5))") === "ab") // expression cast: no pad
    assert(sql1("rpad(CAST('ab' AS STRING), 5, ' ')") === "ab   ")
    spark.sql("DROP TABLE IF EXISTS char_t")
    spark.sql("CREATE TABLE char_t (c CHAR(5)) USING parquet")
    spark.sql("INSERT INTO char_t VALUES ('ab')")
    assert(spark.table("char_t").collect()(0).getString(0) === "ab   ") // read-side pad
    assert(spark.sql("SELECT length(c) FROM char_t").collect()(0).getInt(0) === 5)
    spark.sql("DROP TABLE char_t")
    assert(sql1("length(CAST('ab' AS VARCHAR(5)))") === 2)
  }
}
