package graft

/** CREATE/ALTER/DROP VIEW family (reference:
  * fe/.../analysis/CreateViewStmt.java, AlterViewStmt.java,
  * testdata/.../QueryTest/views.test + views-ddl.test shapes) — all 1:1
  * on Spark SQL's catalog views; this spec pins the semantics the
  * reference's corpus exercises: definition capture, explicit column
  * aliases, nested views, CREATE OR REPLACE / ALTER VIEW AS
  * redefinition, WITH inside a view body, and drop lifecycle. */
class ViewsSpec extends SparkSpec {

  private def setupBase(): Unit = {
    spark.sql("DROP TABLE IF EXISTS vw_base")
    // An earlier JVM's run leaves the managed dir under spark-warehouse
    // while this session's in-memory catalog has never heard of the
    // table — CREATE would then fail on "location already exists".
    val whUri = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val whPath = Option(whUri.getPath).filter(_.nonEmpty).getOrElse(whUri.toString)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(c => rm(c)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    val dir = java.nio.file.Paths.get(whPath, "vw_base")
    if (java.nio.file.Files.exists(dir)) rm(dir)
    spark.sql("CREATE TABLE vw_base (k INT, grp STRING, x INT) USING parquet")
    spark.sql("""INSERT INTO vw_base VALUES
      (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40), (5, 'c', 50)""")
  }

  test("view captures its definition; explicit column aliases rename output") {
    setupBase()
    spark.sql("DROP VIEW IF EXISTS vw_simple")
    spark.sql("CREATE VIEW vw_simple (id, bucket) AS SELECT k, grp FROM vw_base WHERE x > 15")
    val rows = spark.sql("SELECT id, bucket FROM vw_simple ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((2, "a"), (3, "b"), (4, "b"), (5, "c")))
    // new base rows are visible through the view (definition, not snapshot)
    spark.sql("INSERT INTO vw_base VALUES (6, 'c', 60)")
    assert(spark.sql("SELECT count(*) FROM vw_simple").collect()(0).getLong(0) === 5L)
    spark.sql("DROP VIEW vw_simple")
  }

  test("nested views expand transitively; WITH works inside a view body") {
    setupBase()
    spark.sql("DROP VIEW IF EXISTS vw_outer")
    spark.sql("DROP VIEW IF EXISTS vw_inner")
    spark.sql("""CREATE VIEW vw_inner AS
      WITH t AS (SELECT grp, sum(x) AS sx FROM vw_base GROUP BY grp)
      SELECT grp, sx FROM t WHERE sx >= 30""")
    spark.sql("CREATE VIEW vw_outer AS SELECT grp FROM vw_inner WHERE sx > 50")
    val got = spark.sql("SELECT grp FROM vw_outer ORDER BY grp")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("b"))  // a=30 fails >50, b=70 passes, c=50 fails
    spark.sql("DROP VIEW vw_outer")
    spark.sql("DROP VIEW vw_inner")
  }

  test("CREATE OR REPLACE and ALTER VIEW AS redefine in place") {
    setupBase()
    spark.sql("DROP VIEW IF EXISTS vw_redef")
    spark.sql("CREATE VIEW vw_redef AS SELECT k FROM vw_base WHERE grp = 'a'")
    assert(spark.sql("SELECT count(*) FROM vw_redef").collect()(0).getLong(0) === 2L)
    spark.sql("CREATE OR REPLACE VIEW vw_redef AS SELECT k FROM vw_base WHERE grp = 'b'")
    assert(spark.sql("SELECT min(k) FROM vw_redef").collect()(0).getInt(0) === 3)
    spark.sql("ALTER VIEW vw_redef AS SELECT k FROM vw_base WHERE grp = 'c'")
    assert(spark.sql("SELECT max(k) FROM vw_redef").collect()(0).getInt(0) === 5)
    spark.sql("DROP VIEW vw_redef")
  }

  test("dropped view stops resolving; DROP VIEW IF EXISTS tolerates absence") {
    setupBase()
    spark.sql("DROP VIEW IF EXISTS vw_gone")
    spark.sql("CREATE VIEW vw_gone AS SELECT k FROM vw_base")
    spark.sql("DROP VIEW vw_gone")
    val e = intercept[Exception](spark.sql("SELECT * FROM vw_gone").collect())
    assert(e.getMessage.contains("vw_gone") || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    spark.sql("DROP VIEW IF EXISTS vw_gone") // no-op, no throw
  }
}
