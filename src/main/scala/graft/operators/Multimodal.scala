package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata
  * struct, with batch decode/feature-extract stages.
  *
  * The decode kernel is STUBBED (no image/audio libs in this container):
  * [[FakeCodec.decode]] produces a deterministic fake feature vector from
  * the bytes. Everything around it — schema, batching, partitioning, the
  * Dataset[T] signature — is the real production shape: swap `decode` for
  * a JNI/FFI call and nothing else changes.
  *
  * Scale notes: decode runs per-partition with explicit micro-batching
  * (batch size bounds peak native memory per task, like Arrow batch size
  * does for pandas-UDF pipelines); media bytes never pass through a
  * shuffle — features are extracted scan-side and only the (small)
  * feature vectors flow downstream.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String, width: Int, height: Int)
  case class FeatureRow(media_id: Long, format: String, n_bytes: Int, features: Array[Float])

  /** STUB decode kernel — deterministic fake features from raw bytes.
    * Real implementation would decode pixels/samples here.
    *
    * The fake features derive from md5 over growing character prefixes of
    * the UTF-8 payload (feature i = value of the first hex digit of
    * md5(prefix of 64*(i+1) chars) / 16, exact in float), so the stub's
    * output is re-derivable by any engine with stock md5 — which lets the
    * whole binary→decode→aggregate pipeline be checked against an external
    * SQL oracle instead of rows-only. */
  object FakeCodec {
    val featureDims = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Float](featureDims)
      var i = 0
      while (i < featureDims) {
        val prefix = text.substring(0, math.min(text.length, 64 * (i + 1)))
        md.reset()
        val d = md.digest(prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hexVal = (d(0) >> 4) & 0xf // first hex char of the digest
        out(i) = hexVal / 16.0f
        i += 1
      }
      out
    }
  }

  /** Synthesize a media table from the documents table (text bytes stand in
    * for encoded media; metadata derived deterministically). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("media"),
        element_at(split(col("source"), ""), 4).as("fmt_digit"),
        col("n_chars"))
      .select(
        col("media_id"),
        col("media"),
        when(col("n_chars") % 3 === 0, "png")
          .when(col("n_chars") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Batch feature extraction: per-partition micro-batches through the
    * decode kernel. The batch loop is the mapInPandas/mapInArrow batch
    * shape expressed in Scala. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would decode the whole batch in one native call
        batch.iterator.map { r =>
          FeatureRow(r.media_id, r.format, r.media.length, FakeCodec.decode(r.media))
        }
      }
    }
  }
}
