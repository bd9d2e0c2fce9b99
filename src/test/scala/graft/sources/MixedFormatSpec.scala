package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Mixed-format table reads (reference mixed-format.test: one table with
  * parquet + text + avro partitions read transparently; partition-
  * restricted reads still span formats). */
class MixedFormatSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private lazy val dataSchema = StructType.fromDDL("id INT, v INT")
  private lazy val partSchema = StructType.fromDDL("month INT")

  private def writeParts(): Seq[MixedFormat.Part] = {
    import spark.implicits._
    val m1 = tmp("mf_parquet"); val m2 = tmp("mf_csv"); val m3 = tmp("mf_avro")
    Seq((1, 10), (2, 20)).toDF("id", "v").write.mode("overwrite").parquet(m1)
    Seq((3, 30), (4, 40)).toDF("id", "v").write.mode("overwrite")
      .options(Map("delimiter" -> "|")).csv(m2)
    AvroIO.write(Seq((5, 50), (6, 60)).toDF("id", "v"), m3)
    Seq(
      MixedFormat.Part(m1, "parquet", partitionValues = Map("month" -> "1")),
      MixedFormat.Part(m2, "csv", Map("delimiter" -> "|"), Map("month" -> "2")),
      MixedFormat.Part(m3, "avro", partitionValues = Map("month" -> "3")))
  }

  test("data from mixed-format partitions reads transparently (count + sum)") {
    val df = MixedFormat.read(spark, writeParts(), dataSchema, partSchema)
    val r = df.agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (6L, 210L))
  }

  test("partition restriction spans formats and single-partition reads work") {
    val df = MixedFormat.read(spark, writeParts(), dataSchema, partSchema)
    val multi = df.filter(col("month") === 1 || col("month") === 3)
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert((multi.getLong(0), multi.getLong(1)) === (4L, 140L))
    val single = df.filter(col("month") === 2)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(single.toSeq === Seq((3, 30, 2), (4, 40, 2)))
  }

  test("partition predicate prunes branches at plan time; data filter pushes into parquet") {
    val df = MixedFormat.read(spark, writeParts(), dataSchema, partSchema)
    // month=1 folds the csv/avro branches' literal to false → they
    // collapse to empty relations; only the parquet scan survives
    val pruned = df.filter(col("month") === 1 && col("id") >= 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan csv"), s"csv branch must be pruned away:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,2)"),
      "data predicate must push into the surviving parquet scan")
    assert(pruned.collect().map(_.getInt(0)).toSeq === Seq(2))
  }
}
