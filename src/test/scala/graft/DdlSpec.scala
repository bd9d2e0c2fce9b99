package graft

import org.apache.spark.sql.functions._

/** ALTER TABLE / SHOW / LOAD DATA shims (reference:
  * fe/.../analysis/AlterTable*.java, ShowStatsStmt.java, LoadDataStmt.java).
  */
class DdlSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("ALTER TABLE ADD COLUMNS: old files read NULL for the new column") {
    spark.sql("DROP TABLE IF EXISTS ddl_add_t")
    spark.sql("CREATE TABLE ddl_add_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_add_t VALUES (1, 'a')")
    Ddl.addColumns(spark, "ddl_add_t", "extra DOUBLE")
    val row = spark.table("ddl_add_t").select("k", "extra").collect()(0)
    assert(row.getInt(0) === 1 && row.isNullAt(1))
    spark.sql("INSERT INTO ddl_add_t VALUES (2, 'b', 2.5)")
    assert(spark.table("ddl_add_t").where("extra = 2.5").count() === 1)
    spark.sql("DROP TABLE ddl_add_t")
  }

  test("DROP COLUMN shim narrows an external table's schema in place") {
    val loc = tmpDir("ddl_drop")
    spark.sql("DROP TABLE IF EXISTS ddl_drop_t")
    spark.sql(s"CREATE TABLE ddl_drop_t (k INT, v STRING, dead INT) USING parquet LOCATION '$loc'")
    spark.sql("INSERT INTO ddl_drop_t VALUES (1, 'a', 99)")
    Ddl.dropColumn(spark, "ddl_drop_t", "dead")
    val schema = spark.table("ddl_drop_t").schema.fieldNames.toSeq
    assert(schema === Seq("k", "v"))
    // data written before the drop still reads (parquet resolves by name)
    assert(spark.table("ddl_drop_t").where("k = 1 AND v = 'a'").count() === 1)
    spark.sql("DROP TABLE ddl_drop_t")
  }

  test("ADD/DROP PARTITION + SHOW PARTITIONS lifecycle") {
    val loc = tmpDir("ddl_part")
    spark.sql("DROP TABLE IF EXISTS ddl_part_t")
    spark.sql(s"CREATE TABLE ddl_part_t (k INT) USING parquet PARTITIONED BY (p STRING) LOCATION '$loc'")
    Ddl.addPartition(spark, "ddl_part_t", "p='a'")
    Ddl.addPartition(spark, "ddl_part_t", "p='b'")
    assert(Ddl.showPartitions(spark, "ddl_part_t").count() === 2)
    spark.sql("INSERT INTO ddl_part_t PARTITION (p='a') VALUES (1)")
    Ddl.dropPartition(spark, "ddl_part_t", "p='b'")
    assert(Ddl.showPartitions(spark, "ddl_part_t").count() === 1)
    assert(spark.table("ddl_part_t").count() === 1)
    spark.sql("DROP TABLE ddl_part_t")
  }

  test("COMPUTE INCREMENTAL STATS analyzes only partitions without stats") {
    val loc = tmpDir("ddl_incr")
    spark.sql("DROP TABLE IF EXISTS ddl_incr_t")
    spark.sql(s"CREATE TABLE ddl_incr_t (k INT) USING parquet PARTITIONED BY (p STRING) LOCATION '$loc'")
    spark.sql("INSERT INTO ddl_incr_t PARTITION (p='a') VALUES (1), (2)")
    spark.sql("INSERT INTO ddl_incr_t PARTITION (p='b') VALUES (3)")
    assert(Ddl.computeIncrementalStats(spark, "ddl_incr_t") === 2)
    // second run is the incremental no-op: everything already has stats
    assert(Ddl.computeIncrementalStats(spark, "ddl_incr_t") === 0)
    // a new partition is the only one scanned
    spark.sql("INSERT INTO ddl_incr_t PARTITION (p='c') VALUES (4)")
    assert(Ddl.computeIncrementalStats(spark, "ddl_incr_t") === 1)
    // explicit PARTITION form re-analyzes unconditionally
    assert(Ddl.computeIncrementalStats(spark, "ddl_incr_t", Some("p='a'")) === 1)
    // the stats landed: partition-level row counts visible in the catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier("ddl_incr_t")
    val parts = spark.sessionState.catalog.listPartitions(ident)
    assert(parts.forall(_.stats.exists(_.rowCount.exists(_ > 0))))
    spark.sql("DROP TABLE ddl_incr_t")
  }

  test("SHOW TABLE STATS / COLUMN STATS / FILES after COMPUTE STATS") {
    spark.sql("DROP TABLE IF EXISTS ddl_stats_t")
    spark.sql("CREATE TABLE ddl_stats_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_stats_t VALUES (1, 'x'), (2, 'y'), (2, 'z')")
    Ddl.computeStats(spark, "ddl_stats_t")
    val stats = Ddl.showTableStats(spark, "ddl_stats_t").collect()
    assert(stats.length === 1 && stats(0).getString(1).contains("3 rows"))
    val colStats = Ddl.showColumnStats(spark, "ddl_stats_t", "k")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats("distinct_count") === "2")
    assert(Ddl.showFiles(spark, "ddl_stats_t").count() >= 1)
    spark.sql("DROP TABLE ddl_stats_t")
  }

  test("LOAD DATA moves files into the table and they become visible") {
    import spark.implicits._
    val src = tmpDir("ddl_load_src") + "/stage"
    Seq((10, "m"), (11, "n")).toDF("k", "v").write.mode("overwrite").parquet(src)
    spark.sql("DROP TABLE IF EXISTS ddl_load_t")
    spark.sql("CREATE TABLE ddl_load_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_load_t VALUES (1, 'a')")
    Ddl.loadData(spark, src, "ddl_load_t")
    assert(spark.table("ddl_load_t").count() === 3)
    // LOAD is a move, not a copy: staged data files are gone
    val left = new java.io.File(src).listFiles()
    assert(left == null || !left.exists(f => f.getName.endsWith(".parquet")))
    spark.sql("DROP TABLE ddl_load_t")
  }

  test("ALTER TABLE CHANGE renames a column (metadata-only, by-name caveat)") {
    import spark.implicits._
    val dir = tmpDir("ddl_change")
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS ddl_change_t")
    spark.sql(s"CREATE TABLE ddl_change_t (k INT, v STRING) USING parquet LOCATION '$dir'")
    Ddl.changeColumn(spark, "ddl_change_t", "v", "name STRING")
    assert(spark.table("ddl_change_t").columns.toSeq === Seq("k", "name"))
    // metadata-only: by-name parquet resolution means pre-rename files
    // surface NULL under the new name (the reference's documented caveat)
    val rows = spark.table("ddl_change_t").orderBy("k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    assert(rows.toSeq === Seq((1, None), (2, None)))
    // new writes use the new name and read back fully
    spark.sql("INSERT INTO ddl_change_t VALUES (3, 'c')")
    assert(spark.table("ddl_change_t").where("name = 'c'").count() === 1)
    spark.sql("DROP TABLE ddl_change_t")
  }

  test("ALTER TABLE CHANGE rejects partition columns instead of silently no-oping") {
    import spark.implicits._
    val dir = tmpDir("ddl_change_part")
    Seq((1, "a", "x"), (2, "b", "y")).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS ddl_change_pt")
    spark.sql(s"CREATE TABLE ddl_change_pt (k INT, v STRING) USING parquet " +
      s"PARTITIONED BY (p STRING) LOCATION '$dir'")
    spark.sql("MSCK REPAIR TABLE ddl_change_pt")
    val e = intercept[IllegalArgumentException] {
      Ddl.changeColumn(spark, "ddl_change_pt", "p", "p2 STRING")
    }
    assert(e.getMessage.contains("partition column"))
    // the table survives untouched — the old guard dropped+recreated it
    assert(spark.table("ddl_change_pt").columns.toSeq === Seq("k", "v", "p"))
    assert(spark.table("ddl_change_pt").count() === 2)
    spark.sql("DROP TABLE ddl_change_pt")
  }

  test("SET/UNSET table properties round-trip through the catalog") {
    spark.sql("DROP TABLE IF EXISTS ddl_props_t")
    spark.sql("CREATE TABLE ddl_props_t (k INT) USING parquet")
    Ddl.setTableProperties(spark, "ddl_props_t",
      Map("comment.owner" -> "graft", "quote'd" -> "va'lue"))
    val props = Ddl.tableProperties(spark, "ddl_props_t")
    assert(props.get("comment.owner").contains("graft"))
    assert(props.get("quote'd").contains("va'lue"))
    spark.sql("DROP TABLE ddl_props_t")
  }

  test("SHOW CREATE TABLE emits re-creatable DDL with schema and format") {
    spark.sql("DROP TABLE IF EXISTS ddl_sct_t")
    spark.sql("CREATE TABLE ddl_sct_t (k INT, v STRING) USING parquet PARTITIONED BY (p STRING)")
    val ddl = Ddl.showCreateTable(spark, "ddl_sct_t")
    assert(ddl.contains("CREATE TABLE") && ddl.contains("ddl_sct_t"))
    assert(ddl.contains("k INT") && ddl.contains("v STRING"))
    assert(ddl.toLowerCase.contains("parquet"))
    assert(ddl.contains("PARTITIONED BY"))
    spark.sql("DROP TABLE ddl_sct_t")
  }

  test("partition spec parsing survives quoted commas/equals and NULL") {
    assert(Ddl.parsePartitionSpec("p1='a,b', p2=\"x=y\", p3=3, p4=NULL") ===
      Seq("p1" -> Some("a,b"), "p2" -> Some("x=y"), "p3" -> Some("3"), "p4" -> None))
    assert(Ddl.parsePartitionSpec("k='O''Brien'") === Seq("k" -> Some("O'Brien")))
    intercept[IllegalArgumentException](Ddl.parsePartitionSpec("k='unterminated"))
  }

  test("LOAD DATA into a partition Hive-escapes the partition directory") {
    import spark.implicits._
    val src = tmpDir("ddl_load_part_src") + "/stage"
    Seq((20, "x")).toDF("k", "v").write.mode("overwrite").parquet(src)
    spark.sql("DROP TABLE IF EXISTS ddl_load_pt")
    spark.sql("CREATE TABLE ddl_load_pt (k INT, v STRING) USING parquet PARTITIONED BY (p STRING)")
    // value with a comma, an equals sign and a colon: must land in ONE
    // escaped directory that INSERT/SELECT resolves, not fragment into
    // nested dirs ('a,b=c:d' used to become .../'a/b=c/... )
    spark.sql("INSERT INTO ddl_load_pt PARTITION (p='a,b=c:d') VALUES (1, 'seed')")
    Ddl.loadData(spark, src, "ddl_load_pt", Some("p='a,b=c:d'"))
    spark.sql("REFRESH TABLE ddl_load_pt")
    assert(spark.table("ddl_load_pt").where("p = 'a,b=c:d'").count() === 2)
    spark.sql("DROP TABLE ddl_load_pt")
  }
}
