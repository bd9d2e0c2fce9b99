package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on `org.apache.avro`
  * (present on Spark's classpath) — the spark-avro connector is not in
  * this container's jar set, but the format itself needs only the core
  * library. Mirrors the reference's Avro scanner semantics
  * (be/src/exec/hdfs-avro-scanner.cc): the WRITER schema is embedded in
  * each container header, and reads resolve a caller-declared READER
  * schema against it by field name — dropped fields are skipped, fields
  * missing from the writer default to null, order is immaterial (Avro's
  * standard schema-resolution rules, the same machinery the reference's
  * `ResolveSchemas` performs).
  *
  * Scope: flat records over the scalar types the engine's tables use
  * (boolean/int/long/float/double/string/bytes), nullable via
  * `union(null, T)`. Scale note: each container file is one input split
  * (parallelism = file count, like the reference's one-scanner-per-range);
  * the decode path is row-oriented GenericRecord — adequate for format
  * parity, not a vectorized scan (the parquet path remains the fast
  * columnar format, as in the reference).
  */
object AvroIO {

  /** StructType → Avro record schema; every field nullable union(null,T). */
  def toAvroSchema(st: StructType, name: String = "row"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroIO supports flat scalar columns; got ${other.catalogString}")
    }
    val fields = st.fields.map { f =>
      val union = Schema.createUnion(java.util.List.of(
        Schema.create(Schema.Type.NULL), base(f.dataType)))
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.List.of(fields: _*))
    rec
  }

  /** Avro record schema → StructType (unions collapse to nullable). */
  def toStructType(s: Schema): StructType = {
    def dt(t: Schema): DataType = t.getType match {
      case Schema.Type.UNION =>
        dt(t.getTypes.asScala.filter(_.getType != Schema.Type.NULL).head)
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, dt(f.schema), nullable = true)))
  }

  /** Write each partition as one Avro container file under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    val out = new File(dir)
    out.mkdirs()
    val absDir = out.getAbsolutePath
    // sum() forces every partition's write before the success marker lands
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, new File(absDir, f"part-$i%05d.avro"))
      var n = 0L
      rows.foreach { r =>
        val rec = new GenericData.Record(schema)
        var j = 0
        while (j < r.length) {
          rec.put(j, r.get(j) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            // Byte/Short map to Avro INT in toAvroSchema; Avro's union
            // resolution only recognizes Integer, so widen here.
            case b: java.lang.Byte => Int.box(b.intValue)
            case s: java.lang.Short => Int.box(s.intValue)
            case v => v
          })
          j += 1
        }
        writer.append(rec)
        n += 1
      }
      writer.close()
      Iterator.single(n.toDouble)
    }.sum()
    new java.io.FileOutputStream(new File(out, "_SUCCESS")).close()
  }

  /** Read the container files under `dir`. With `readSchema`, Avro schema
    * resolution projects/renumbers writer fields by name (missing-in-writer
    * fields read as null); without it, the writer schema is the shape. */
  def read(spark: SparkSession, dir: String,
      readSchema: Option[StructType] = None): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val writerSchema = {
      val r = new DataFileReader(new File(files.head), new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val target = readSchema.getOrElse(toStructType(writerSchema))
    val readerJson = toAvroSchema(target).toString
    val names = target.fieldNames
    val fieldTypes: Array[DataType] = target.fields.map(_.dataType)
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { path =>
      val expected = new Schema.Parser().parse(readerJson)
      val reader = new DataFileReader(new File(path),
        new GenericDatumReader[GenericRecord](null, expected))
      // Lazy: decode one record per next() so task memory stays O(1) in the
      // container size; the reader closes as soon as the file drains. A
      // consumer that stops early (limit/take) or a task failure never
      // exhausts the iterator, so the file handle is ALSO released via the
      // task-completion listener - close-on-drain alone would leak it
      // until GC.
      // (a local `object` here would compile to an inner class whose $outer
      // is AvroIO$, making the flatMap closure unserializable — plain vars
      // captured by reference keep the closure self-contained)
      var open = true
      val closeOnce: () => Unit = () => if (open) { open = false; reader.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      new Iterator[Row] {
        def hasNext: Boolean = {
          if (open && !reader.hasNext) closeOnce()
          open
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("exhausted avro file " + path)
          val rec = reader.next()
          Row.fromSeq(names.indices.map { k =>
            rec.get(names(k)) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case b: java.nio.ByteBuffer =>
                val a = new Array[Byte](b.remaining()); b.get(a); a
              // Avro INT carries Byte/Short columns (see toAvroSchema);
              // narrow back to the declared Catalyst type.
              case i: java.lang.Integer => fieldTypes(k) match {
                case ByteType => Byte.box(i.byteValue)
                case ShortType => Short.box(i.shortValue)
                case _ => i
              }
              case v => v
            }
          })
        }
      }
    }
    spark.createDataFrame(rdd, target)
  }
}
