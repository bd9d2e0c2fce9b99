package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** INSERT statement semantics beyond the happy path — the reference's
  * insert_permutation.test / partition-col-types.test / wide-row.test
  * families:
  *  - column-permuted INSERT (`INSERT INTO t (c2, c1) ...`) maps values by
  *    the listed names, and omitted nullable columns fill with NULL;
  *  - typed (non-string) partition columns round-trip their type and are
  *    pruned at the scan (`PartitionFilters`, not a post-scan filter);
  *  - wide rows (500 columns) survive the writer/reader and projection
  *    pruning still reaches the scan schema. */
class InsertSemanticsSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("INSERT with a column-list permutation maps by name; omitted columns are NULL") {
    val dir = tmp("ins_perm")
    spark.sql("DROP TABLE IF EXISTS ins_perm_t")
    spark.sql(s"CREATE TABLE ins_perm_t (a INT, b STRING, c DOUBLE) USING parquet LOCATION '$dir'")
    // permuted order: values bind to (b, a), c omitted → NULL
    spark.sql("INSERT INTO ins_perm_t (b, a) VALUES ('x', 1), ('y', 2)")
    // full-width row through the natural order for contrast
    spark.sql("INSERT INTO ins_perm_t VALUES (3, 'z', 9.5)")
    val rows = spark.table("ins_perm_t").orderBy("a")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2))))
    assert(rows.toSeq === Seq(
      (1, "x", None), (2, "y", None), (3, "z", Some(9.5))))
    spark.sql("DROP TABLE ins_perm_t")
  }

  test("typed partition columns keep their type and prune at the scan") {
    val dir = tmp("part_types")
    spark.sql("DROP TABLE IF EXISTS part_types_t")
    spark.sql(
      s"CREATE TABLE part_types_t (v STRING) USING parquet " +
        s"PARTITIONED BY (pk INT, pd DATE) LOCATION '$dir'")
    spark.sql(
      "INSERT INTO part_types_t PARTITION (pk=1, pd=DATE'2024-01-01') VALUES ('a')")
    spark.sql(
      "INSERT INTO part_types_t PARTITION (pk=2, pd=DATE'2024-06-15') VALUES ('b')")
    val df = spark.table("part_types_t").filter(col("pk") === 2)
    // partition column types survive the round trip
    assert(df.schema("pk").dataType.typeName === "integer")
    assert(df.schema("pd").dataType.typeName === "date")
    assert(df.collect().map(r => (r.getString(0), r.getInt(1), r.getDate(2).toString)).toSeq
      === Seq(("b", 2, "2024-06-15")))
    // ...and the pk predicate prunes partitions at the scan, instead of
    // surviving as a post-scan filter over all partitions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("(pk"),
      s"pk filter must appear under PartitionFilters:\n$plan")
    spark.sql("DROP TABLE part_types_t")
  }

  test("500-column rows round-trip and projection pruning reaches the scan") {
    val dir = tmp("wide_row")
    val wide = (1 to 500).foldLeft(spark.range(3).toDF("id")) {
      (df, i) => df.withColumn(s"c$i", col("id") * i)
    }
    wide.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.length === 501)
    val two = back.select(col("id"), col("c250"))
    assert(two.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((0L, 0L), (1L, 250L), (2L, 500L)))
    // the 2-column projection must reach the parquet reader schema
    val plan = two.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,c250:bigint>"),
      "scan must read exactly the projected columns")
  }
}
