package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro container roundtrip + writer-schema resolution (the reference's
  * hdfs-avro-scanner semantics: reader schema resolved against the file's
  * embedded writer schema by name). */
class AvroSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/tmp/avro_spec_$name")
    if (d.exists()) {
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
    d.getPath
  }

  private lazy val sample = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, null.asInstanceOf[String], 0.0, true)
    ).toDF("id", "name", "score", "flag")
  }

  test("write/read roundtrip preserves rows, nulls and types") {
    val dir = tmpDir("roundtrip")
    AvroIO.write(sample.coalesce(2), dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType), ("flag", BooleanType)))
    assert(back.collect().map(_.toString).sorted.toSeq ===
      sample.collect().map(_.toString).sorted.toSeq)
  }

  test("reader schema resolves by name: reorder, drop, and default missing fields to null") {
    val dir = tmpDir("resolve")
    AvroIO.write(sample.coalesce(1), dir)
    // reordered subset + a field the writer never had (reads as null)
    val reader = StructType.fromDDL("score DOUBLE, id BIGINT, added STRING")
    val got = AvroIO.read(spark, dir, Some(reader)).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.isNullAt(2))).sortBy(_._2).toSeq
    assert(got === Seq((1.5, 1L, true), (-0.25, 2L, true), (0.0, 3L, true)))
  }

  test("byte/short columns roundtrip through avro int and narrow back") {
    val dir = tmpDir("narrow")
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, 7.toByte, 300.toShort),
        Row(2L, (-128).toByte, null)),
      StructType.fromDDL("id BIGINT, b TINYINT, s SMALLINT"))
    AvroIO.write(df.coalesce(1), dir)
    val back = AvroIO.read(spark, dir, Some(df.schema))
    assert(back.schema.fields.map(_.dataType).toSeq === Seq(LongType, ByteType, ShortType))
    val got = back.collect()
      .map(r => (r.getLong(0), r.getByte(1), if (r.isNullAt(2)) null else r.getShort(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 7.toByte, 300.toShort), (2L, (-128).toByte, null)))
    // without a reader schema the writer schema's INT shape is the contract
    assert(AvroIO.read(spark, dir).schema("b").dataType === IntegerType)
  }

  test("reader iterator is lazy: rows stream without materializing the file") {
    val dir = tmpDir("lazy")
    AvroIO.write(sample.coalesce(1), dir)
    // take(1) over the underlying RDD decodes only what it needs; correctness
    // of the early-terminated path is what guards the lazy-iterator rewrite
    val first = AvroIO.read(spark, dir).limit(1).collect()
    assert(first.length === 1)
  }

  test("write commits through task-attempt temps: clean dir, _SUCCESS, orphans removed") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("commit")
    // orphan temp from a dead prior attempt must not survive the job
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new Path(dir, "_temporary/attempt-999-part-00099.avro")
    val o = fs.create(orphan, true); o.write(1); o.close()
    AvroIO.write(sample.coalesce(2), dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(names.contains("_SUCCESS"))
    assert(!names.contains("_temporary"), s"temp dir must be cleaned, saw $names")
    assert(names.count(_.endsWith(".avro")) === 2, s"one committed file per partition: $names")
    assert(AvroIO.read(spark, dir).count() === sample.count())
  }

  test("commitPartition: losing concurrent attempt drops its temp; lost rename with no committed file throws") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("race"); new java.io.File(dir).mkdirs()
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeTemp(name: String): Path = {
      val t = new Path(p, s"_temporary/$name")
      val o = fs.create(t, true); o.write(7); o.close(); t
    }
    val dest = new Path(p, "part-00000.avro")
    // speculation: two attempts each finished a COMPLETE file for the same
    // partition; both commits must succeed, leaving exactly one published
    // file and no temp (which attempt won is FS-dependent and immaterial —
    // successful attempts produce identical partition content)
    AvroIO.commitPartition(fs, writeTemp("attempt-1-part-00000.avro"), dest)
    val loser = writeTemp("attempt-2-part-00000.avro")
    AvroIO.commitPartition(fs, loser, dest) // must not throw
    assert(!fs.exists(loser), "losing attempt's temp must be dropped")
    assert(fs.exists(dest))
    assert(fs.listStatus(new Path(p, "_temporary")).isEmpty)
    // a failed rename with NO committed sibling is data loss — must throw
    intercept[java.io.IOException] {
      AvroIO.commitPartition(fs,
        new Path(p, "_temporary/attempt-3-part-00042.avro"), // never written
        new Path(p, "part-00042.avro"))
    }
  }

  test("binary columns roundtrip through avro bytes") {
    val dir = tmpDir("bytes")
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Array[Byte](1, 2, 3)),
        Row(2L, Array.empty[Byte])),
      StructType.fromDDL("id BIGINT, payload BINARY"))
    AvroIO.write(df.coalesce(1), dir)
    val got = AvroIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1).toSeq
    assert(got === Seq((1L, Seq[Byte](1, 2, 3)), (2L, Seq.empty[Byte])))
  }
}
