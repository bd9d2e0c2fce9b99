package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the events shape.
  *
  * The reference engine has NO streaming subsystem (SURVEY §2.11) — this is
  * extension surface: the same events schema processed incrementally, the
  * way a training-data ingest pipeline would tail an event log. Batch
  * queries in `TpchShapes.qEventsTimeseries` and these streaming transforms
  * share semantics: the windowed aggregate over a bounded replay equals the
  * batch group-by (asserted in StreamingSpec).
  *
  * Scale notes: watermark + windowed agg is incremental shuffle-by-window —
  * state is bounded by (watermark horizon × active keys); sessionization
  * uses mapGroupsWithState with explicit timeout so abandoned sessions
  * evict. Nothing here buffers unbounded history.
  */
object EventStream {

  /** Tumbling-window per-type counts/sums with a watermark for late data.
    * Append-mode compatible: windows close once the watermark passes. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Per-user gap-based sessionization via the built-in `session_window`
    * aggregate — a session extends while consecutive events arrive within
    * `gap`; state eviction follows the watermark. Works identically over a
    * stream (incremental, watermark-evicted) and a batch DataFrame (the
    * oracle-checked `q_sessionize` entry uses the batch form).
    *
    * Design note: Spark's session_window IS the custom-state operator for
    * this shape — a hand-rolled mapGroupsWithState would re-implement its
    * merge logic with more state and no codegen. (This environment's Spark
    * also hits an internal planner error constructing
    * FlatMapGroupsWithStateExec — session_window sidesteps the operator
    * entirely.)
    */
  /** Stream-static enrichment: join the event stream against a static
    * dimension (the training-pipeline shape "tail the event log, attach
    * user/document metadata"). On a cluster the static side is broadcast
    * per micro-batch — no stream-side shuffle, unbounded-state-free. */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left_outer")

  /** Streaming exact dedup on event_id with watermark-bounded state
    * (dropDuplicatesWithinWatermark): duplicates arriving within the
    * watermark horizon are dropped; state for old keys evicts with the
    * watermark instead of growing forever — the streaming twin of the
    * batch `Dedup.exact` operator. */
  def dedupedWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (attribution shape: match each left event
    * with right-side events of the same key that occur within `within`
    * AFTER it). Both sides carry watermarks and the join condition bounds
    * event-time distance, so Spark evicts join state once the watermark
    * passes — the state is (watermark + within) × arrival rate, never
    * unbounded history. Works identically over batch DataFrames (the spec
    * asserts stream == batch on a bounded replay). */
  def intervalJoined(left: DataFrame, right: DataFrame,
      key: String = "user_id", within: String = "15 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left
      .select(col(key), col("ts").cast("timestamp").as("l_ts"), col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right
      .select(col(key).as("__rk"), col("ts").cast("timestamp").as("r_ts"), col("event_id").as("r_id"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col(key) === col("__rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col(key), col("l_id"), col("r_id"),
        col("l_ts").cast("timestamp_ntz").as("l_ts"),
        col("r_ts").cast("timestamp_ntz").as("r_ts"))
  }

  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast("timestamp"))
    val withWm = watermark.fold(base)(w => base.withWatermark("ts", w))
    withWm
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        // session_window requires LTZ input; the engine's data model is
        // naive/NTZ timestamps (parquet without tz) — convert back on output.
        col("first_ts").cast("timestamp_ntz").as("first_ts"),
        col("last_ts").cast("timestamp_ntz").as("last_ts"),
        col("n_events"), col("total_value"))
  }
}
