package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

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

  /** Per-partition commit: promote a fully-written task-attempt temp file
    * to its final name. `rename` is the atomic publish — a concurrent
    * (speculative) or re-run attempt that loses the race sees `false`,
    * drops its own temp, and succeeds iff SOME attempt committed the
    * partition. Attempts never write the final name directly, so readers
    * can never observe a half-written container. */
  private[sources] def commitPartition(fs: FileSystem, temp: Path, dest: Path): Unit = {
    if (!fs.rename(temp, dest)) {
      fs.delete(temp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(
          s"avro commit failed: rename $temp -> $dest returned false and no sibling attempt committed")
    }
  }

  /** Write each partition as one Avro container file under `dir`.
    *
    * Cluster-safe commit protocol (the reference's sinks go through the
    * HDFS rename-on-commit dance for the same reason —
    * be/src/exec/hdfs-table-sink.cc): every task attempt writes through
    * the Hadoop `FileSystem` for `dir` (NOT `java.io.File` — on a real
    * cluster executor-local paths would silently land data off the target
    * FS) to a per-ATTEMPT temp name, then renames into place via
    * [[commitPartition]]. Retried and speculative attempts therefore never
    * collide mid-write, and `_SUCCESS` only lands after every partition
    * has committed and the temp dir is cleaned. */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    val sc = df.sparkSession.sparkContext
    val hconf = new SerializableConfiguration(sc.hadoopConfiguration)
    val outPath = new Path(dir)
    val fsDriver = outPath.getFileSystem(hconf.value)
    fsDriver.mkdirs(outPath)
    val qualified = fsDriver.makeQualified(outPath).toString
    // sum() forces every partition's commit before the success marker lands
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val dirPath = new Path(qualified)
      val fs = dirPath.getFileSystem(hconf.value)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val temp = new Path(dirPath, f"_temporary/attempt-$attempt%d-part-$i%05d.avro")
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, fs.create(temp, true))
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
      commitPartition(fs, temp, new Path(dirPath, f"part-$i%05d.avro"))
      Iterator.single(n.toDouble)
    }.sum()
    fsDriver.delete(new Path(outPath, "_temporary"), true)
    fsDriver.create(new Path(outPath, "_SUCCESS"), true).close()
  }

  /** Read the container files under `dir`. With `readSchema`, Avro schema
    * resolution projects/renumbers writer fields by name (missing-in-writer
    * fields read as null); without it, the writer schema is the shape. */
  def read(spark: SparkSession, dir: String,
      readSchema: Option[StructType] = None): DataFrame = {
    val hconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fsDriver = dirPath.getFileSystem(hconf.value)
    val files = (if (fsDriver.exists(dirPath)) fsDriver.listStatus(dirPath)
                 else Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val writerSchema = {
      val r = new DataFileReader(new FsInput(new Path(files.head), hconf.value),
        new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val target = readSchema.getOrElse(toStructType(writerSchema))
    val readerJson = toAvroSchema(target).toString
    val names = target.fieldNames
    val fieldTypes: Array[DataType] = target.fields.map(_.dataType)
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { path =>
      val expected = new Schema.Parser().parse(readerJson)
      // FsInput resolves the path against the SAME FileSystem the writer
      // committed to — executors on a real cluster must not assume the
      // container landed on their local disk.
      val reader = new DataFileReader(new FsInput(new Path(path), hconf.value),
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
