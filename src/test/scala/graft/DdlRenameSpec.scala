package graft

/** Partition metadata survival across ALTER TABLE … RENAME TO — the
  * seed-56 DDL fuzz corpus' catch (r12): Spark's session catalog
  * re-escapes already-escaped partition directory names when renaming a
  * MANAGED partitioned table, leaving special-char partitions pointing at
  * nonexistent paths (zero rows read, later DROP PARTITION deletes the
  * wrong path). [[Ddl.repairPartitionLocations]] recomputes locations
  * from the (unmangled) spec; [[EngineSession.sql]] applies it after
  * every table-level RENAME. */
class DdlRenameSpec extends SparkSpec {

  private def sql(s: String) = EngineSession.sql(spark, s).collect()

  test("rename keeps special-char partitions readable and droppable") {
    sql("DROP TABLE IF EXISTS ddlren_t")
    sql("DROP TABLE IF EXISTS ddlren_r")
    try {
      sql("CREATE TABLE ddlren_t (a BIGINT, p STRING) USING parquet PARTITIONED BY (p)")
      sql("INSERT INTO ddlren_t VALUES (1,'Supplier#000000001'),(2,'Supplier#000000002'),(3,'plain')")
      sql("ALTER TABLE ddlren_t RENAME TO ddlren_r")
      sql("ALTER TABLE ddlren_r ADD IF NOT EXISTS PARTITION (p='zz_empty')")
      assert(spark.table("ddlren_r").count() === 3,
        "every pre-rename partition must stay readable")
      sql("ALTER TABLE ddlren_r DROP IF EXISTS PARTITION (p='Supplier#000000001')")
      assert(spark.table("ddlren_r").count() === 2,
        "post-rename DROP PARTITION must remove the dropped rows")
      assert(spark.table("ddlren_r").where("p = 'Supplier#000000002'").count() === 1)
    } finally {
      sql("DROP TABLE IF EXISTS ddlren_t")
      sql("DROP TABLE IF EXISTS ddlren_r")
    }
  }

  test("rename of an unpartitioned table is untouched by the repair") {
    sql("DROP TABLE IF EXISTS ddlren_u")
    sql("DROP TABLE IF EXISTS ddlren_v")
    try {
      sql("CREATE TABLE ddlren_u (a BIGINT) USING parquet")
      sql("INSERT INTO ddlren_u VALUES (1),(2)")
      sql("ALTER TABLE ddlren_u RENAME TO ddlren_v")
      assert(spark.table("ddlren_v").count() === 2)
    } finally {
      sql("DROP TABLE IF EXISTS ddlren_u")
      sql("DROP TABLE IF EXISTS ddlren_v")
    }
  }
}
