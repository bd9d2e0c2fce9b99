package graft.sources

import graft.SparkSpec
import graft.sinks.TableSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Compressed storage coverage (reference: compressed text in
  * scanners.test — gzip'd delimited files scan transparently — and the
  * per-codec parquet writer surface behind the COMPRESSION_CODEC query
  * option / insert_parquet tests). */
class CompressionSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("gzip-compressed delimited text scans transparently by extension") {
    val dir = tmp("gz_text")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/data.csv.gz"))
    out.write("1|a\n2|b\n3|c\n".getBytes("UTF-8"))
    out.close()
    val schema = StructType.fromDDL("id INT, s STRING")
    val rows = Formats.readDelimited(spark, dir, schema, delimiter = "|")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq === Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("parquet writes honor the session compression codec and read back") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, s"row_$i")).toDF("id", "v")
    for (codec <- Seq("snappy", "gzip", "zstd", "uncompressed")) {
      val dir = tmp(s"codec_$codec")
      val prev = spark.conf.get("spark.sql.parquet.compression.codec")
      // the COMPRESSION_CODEC query option routes here (Options.set)
      graft.Options.set(spark, "COMPRESSION_CODEC", codec)
      try {
        TableSink.insertOverwrite(df, dir)
        val files = new java.io.File(dir).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet"))
        assert(files.nonEmpty)
        // codec is encoded in the part-file name (gzip abbreviates to .gz)
        val ext = Map("gzip" -> "gz").getOrElse(codec, codec)
        if (codec != "uncompressed")
          assert(files.forall(_.contains(s".$ext.")), s"$ext missing in ${files.head}")
        val back = TableSink.read(spark, dir)
        assert(back.count() === 100)
        assert(back.agg(sum(col("id"))).collect()(0).getLong(0) === 5050L)
      } finally spark.conf.set("spark.sql.parquet.compression.codec", prev)
    }
  }
}
