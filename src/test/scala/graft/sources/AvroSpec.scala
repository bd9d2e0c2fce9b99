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
