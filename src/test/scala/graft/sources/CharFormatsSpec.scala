package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CHAR(n)/VARCHAR(n) semantics across storage formats (reference:
  * chars-formats.test runs the chars corpus through text/avro/parquet;
  * q_char_padding covers the parquet leg in the driver gate). Per format:
  * CHAR(n) table columns surface read-side padded to n and rtrim recovers
  * the raw value; VARCHAR(n) stays unpadded; the padding bytes survive the
  * physical roundtrip. Avro goes through [[AvroIO]] (no Spark avro
  * datasource in this build), where the check is that the writer/reader
  * pair is padding-transparent — stored strings keep their trailing
  * spaces byte-exact. */
class CharFormatsSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def charTableRoundtrip(format: String): Unit = {
    val dir = tmp(s"chars_$format")
    val t = s"graft_chars_$format"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(
      s"CREATE TABLE $t (id INT, c CHAR(10), v VARCHAR(10)) USING $format LOCATION '$dir'")
    // note: no empty-string row — CSV cannot round-trip '' vs NULL, which
    // is a format property, not a char-type one
    spark.sql(s"INSERT INTO $t VALUES (1, 'abc', 'abc'), (2, 'exactly10!', 'exactly10!'), (3, 'z', 'z')")
    val rows = spark.table(t).orderBy("id")
      .select(col("id"), col("c"), length(col("c")).as("lc"), rtrim(col("c")).as("rc"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3), r.getString(4)))
    assert(rows.toSeq === Seq(
      (1, "abc       ", 10, "abc", "abc"),
      (2, "exactly10!", 10, "exactly10!", "exactly10!"),
      (3, "z         ", 10, "z", "z")), s"format=$format")
    // VARCHAR(n) enforces its limit on write instead of silently truncating
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (4, 'x', 'longer than ten')") }
    spark.sql(s"DROP TABLE $t")
  }

  test("CHAR(n) pads and VARCHAR(n) bounds through a parquet table") {
    charTableRoundtrip("parquet")
  }

  test("CHAR(n) pads and VARCHAR(n) bounds through a CSV table") {
    charTableRoundtrip("csv")
  }

  test("CHAR(n) pads and VARCHAR(n) bounds through a JSON table") {
    charTableRoundtrip("json")
  }

  test("Avro roundtrip keeps CHAR padding bytes intact") {
    import spark.implicits._
    val dir = tmp("chars_avro")
    val padded = Seq((1, "abc       "), (2, "exactly10!"), (3, "          "))
      .toDF("id", "c")
    AvroIO.write(padded, dir)
    val back = AvroIO.read(spark, dir, Some(StructType.fromDDL("id INT, c STRING")))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(back.toSeq === Seq((1, "abc       "), (2, "exactly10!"), (3, "          ")))
  }
}
