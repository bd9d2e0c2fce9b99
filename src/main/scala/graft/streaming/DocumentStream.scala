package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming twin of the batch training-data pipeline's stateless front
  * (LlmOps.qPipelineE2e stages 1–3): incremental document ingest with
  * scrub → quality gate → exact dedup.
  *
  * Design notes, stage by stage, for the 100 TB ingest shape:
  *  - scrub + scoring are stateless per-row projections (codegen'd
  *    TextAnalysis expressions) — they ride the micro-batch scan;
  *  - the quality gate joins a small CALIBRATION table (per-language
  *    score cutoffs) broadcast per micro-batch — a stream cannot take the
  *    batch entry's per-language running quantile without a state
  *    barrier, and production pipelines recalibrate cutoffs offline and
  *    broadcast them (the stream-static analogue of keepAboveQuantile);
  *  - exact dedup keeps one row per content fingerprint via
  *    dropDuplicatesWithinWatermark: state is one md5 per kept document
  *    inside the watermark horizon — bounded by arrival rate × horizon,
  *    never by corpus size. Near-dup (minhash) stays a batch/compaction
  *    job by design: its banding passes are multi-shuffle barriers.
  */
object DocumentStream {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, lang: String, text: String)

  /** Per-language quality cutoffs from a calibration corpus: the median
    * stopword ratio per language, computed offline with the SAME exact
    * percentile the batch gate uses (`TextAnalysis.keepAboveQuantile` —
    * Spark `percentile`, linear interpolation), so a document scores past
    * the streamed gate iff it would pass the batch gate calibrated on the
    * same corpus. Tiny output — one row per language — intended for
    * `broadcast` into [[ingest]]. */
  def calibrateCutoffs(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("clean", TextAnalysis.scrub(col("text")))
      .withColumn("stop_ratio", TextAnalysis.stopwordRatio(col("clean")))
      .groupBy(col("lang"))
      .agg(expr("percentile(stop_ratio, 0.5)").as("min_stop_ratio"))

  /** Incremental ingest over a document stream (schema: [[Doc]]): returns
    * the surviving documents (doc_id, ts, lang, clean, fp). Works
    * identically over a batch DataFrame except for the dedup stage, which
    * requires a stream (`dropDuplicatesWithinWatermark`); the stateless
    * front is shared verbatim via [[gate]]. */
  def ingest(docs: DataFrame, cutoffs: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    gate(docs, cutoffs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** The stateless front of [[ingest]]: scrub, score, gate on the
    * broadcast calibration cutoffs, fingerprint. Strict `>` matches
    * `keepAboveQuantile`'s boundary exactly (a doc AT the median is
    * dropped by both). Unknown languages have
    * no cutoff and are rejected (inner join) — same posture as the batch
    * per-language quantile gate, which also emits nothing for a language
    * absent from the corpus. */
  def gate(docs: DataFrame, cutoffs: DataFrame): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("clean", TextAnalysis.scrub(col("text")))
      .withColumn("stop_ratio", TextAnalysis.stopwordRatio(col("clean")))
      .join(broadcast(cutoffs), Seq("lang"))
      .filter(col("stop_ratio") > col("min_stop_ratio"))
      .withColumn("fp", md5(col("clean")))
      .select(col("doc_id"), col("ts"), col("lang"), col("clean"), col("fp"))
}
