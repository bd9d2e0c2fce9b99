package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics: the incremental windowed aggregate over a bounded
  * replay must equal the equivalent batch group-by, and sessionization
  * must fold per-user state across micro-batches. */
class StreamingSpec extends SparkSpec {

  private def sampleEvents = {
    import spark.implicits._
    (0 until 100).map { i =>
      EventStream.Event(
        event_id = i.toLong,
        ts = java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:${i % 60}%02d:00"),
        user_id = (i % 7).toLong,
        event_type = if (i % 3 == 0) "click" else "view",
        value = (i % 10) + 0.5)
    }
  }

  test("streaming windowed aggregate equals batch group-by on bounded replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val streamed = EventStream.windowedCounts(mem.toDF())
    val q = streamed.writeStream
      .format("memory").queryName("win_counts").outputMode("complete").start()
    try {
      mem.addData(sampleEvents)
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val want = EventStream.windowedCounts(sampleEvents.toDF())
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join enriches events with dimension rows per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = (0L until 5L).map(u => (u, s"user_$u")).toDF("user_id", "user_name")
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.enriched(mem.toDF(), dim).writeStream
      .format("memory").queryName("enriched_events").outputMode("append").start()
    try {
      mem.addData(sampleEvents)
      q.processAllAvailable()
      val got = spark.table("enriched_events")
      assert(got.count() === 100)
      // users 0-4 resolve; 5,6 fall outside the dim -> left-outer nulls
      assert(got.filter(col("user_name").isNull).select("user_id").distinct()
        .collect().map(_.getLong(0)).toSet === Set(5L, 6L))
      assert(got.filter(col("user_id") === 2L).select("user_name").distinct()
        .collect()(0).getString(0) === "user_2")
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.dedupedWithinWatermark(mem.toDF()).writeStream
      .format("memory").queryName("deduped_events").outputMode("append").start()
    try {
      val batch = sampleEvents.take(20)
      mem.addData(batch)
      q.processAllAvailable()
      mem.addData(batch.take(10)) // exact duplicates within the horizon
      q.processAllAvailable()
      val got = spark.table("deduped_events")
      assert(got.count() === 20)
      assert(got.select("event_id").distinct().count() === 20)
    } finally q.stop()
  }

  test("streaming sessionization equals batch session_window on bounded replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDF()).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      val (b1, b2) = sampleEvents.splitAt(60)
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        // first_ts/last_ts are NTZ (LocalDateTime) since the engine's data
        // model surfaces naive timestamps — compare via toString.
        (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3), r.getDouble(4))
      val got = spark.table("sessions").collect().map(key).toSet
      val want = EventStream.sessionize(sampleEvents.toDF(), watermark = None).collect().map(key).toSet
      assert(got === want)
      assert(want.toSeq.map(_._4).sum === 100L) // every event lands in exactly one session
      assert(want.map(_._1) === (0L until 7L).toSet)
    } finally q.stop()
  }

  test("streaming document ingest equals the batch gate + dedup on bounded replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus text, synthetic ingest times; duplicates planted BOTH
    // within a batch (copies of docs 0-4 appended after the first 40
    // originals, delivered in the SAME addData call) and across batches
    // (batch 2 re-sends docs 0-14 whose originals arrived in batch 1), so
    // the dedup must hold within a micro-batch AND span micro-batches
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docs = (corpus.take(40) ++ corpus.take(5) ++ corpus.drop(40) ++ corpus.take(15))
      .zipWithIndex.map { case ((id, lang, text), i) =>
        DocumentStream.Doc(1000L + i,
          java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00"), lang, text)
      }
    val cutoffs = DocumentStream.calibrateCutoffs(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    // gate == the batch pipeline's quality stage exactly: calibrated on
    // the SAME corpus, the streamed gate keeps precisely the doc_ids
    // keepAboveQuantile keeps (incl. the at-the-median boundary, which
    // both DROP — strict >)
    val replay = docs.toSeq.toDF()
    val replayGateIds = DocumentStream
      .gate(replay, DocumentStream.calibrateCutoffs(replay))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val batchGateIds = graft.operators.TextAnalysis.keepAboveQuantile(
        replay.withColumn("clean", graft.operators.TextAnalysis.scrub(col("text")))
          .withColumn("stop_ratio",
            graft.operators.TextAnalysis.stopwordRatio(col("clean"))),
        "stop_ratio", "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(replayGateIds === batchGateIds)
    assert(replayGateIds.nonEmpty && replayGateIds.size < docs.length)
    val mem = MemoryStream[DocumentStream.Doc]
    val q = DocumentStream.ingest(mem.toDF(), cutoffs).writeStream
      .format("memory").queryName("ingested_docs").outputMode("append").start()
    try {
      // batch 1 = 40 originals + the 5 within-batch duplicates;
      // batch 2 = 20 remaining originals + the 15 cross-batch duplicates
      val (b1, b2) = docs.splitAt(45)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val got = spark.table("ingested_docs")
      // batch reference: the same stateless gate, deduped by fingerprint
      val want = DocumentStream.gate(docs.toSeq.toDF(), cutoffs)
      assert(got.select("fp").collect().map(_.getString(0)).sorted.toSeq ===
        want.select("fp").distinct().collect().map(_.getString(0)).sorted.toSeq)
      // dedup was exercised: the replay contained duplicate texts
      assert(want.count() > want.select("fp").distinct().count())
      // the gate actually rejected something, and survivors are scrubbed
      assert(want.count() < docs.length)
      assert(got.count() > 0)
    } finally q.stop()
  }

  test("streaming ingest survives a checkpointed stop/restart exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The restart analogue of TaskRetrySpec: a production ingest is
    // stopped and redeployed constantly; correctness means the
    // dropDuplicatesWithinWatermark STATE (one md5 per kept doc) and the
    // file sink's commit manifest both survive the restart. The replay
    // plants duplicates whose originals arrived BEFORE the stop — if the
    // state store restore were broken they would be re-emitted; if the
    // sink manifest were broken, committed pre-stop files would be
    // re-written or half-written files would become visible.
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def mkDocs(rows: Seq[(Long, String, String)], idBase: Long) =
      rows.zipWithIndex.map { case ((_, lang, text), i) =>
        DocumentStream.Doc(idBase + i,
          java.sql.Timestamp.valueOf(f"2024-01-01 10:${(idBase + i) % 60}%02d:00"),
          lang, text)
      }
    val phaseA = mkDocs(corpus.take(40).toSeq, 1000L) // originals, pre-stop
    // post-restart: 10 duplicates of pre-stop docs + the 20 remaining originals
    val phaseB = mkDocs(corpus.take(10).toSeq ++ corpus.drop(40), 2000L)
    val cutoffs = DocumentStream.calibrateCutoffs(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val out = java.nio.file.Files.createTempDirectory("restart_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("restart_ckpt").toString
    val mem = MemoryStream[DocumentStream.Doc]
    def start() = DocumentStream.ingest(mem.toDF(), cutoffs).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try { mem.addData(phaseA); q1.processAllAvailable() } finally q1.stop()
    mem.addData(phaseB) // arrives while the query is DOWN
    val q2 = start() // fresh query instance, same checkpoint + sink
    try { q2.processAllAvailable() } finally q2.stop()
    // reading the sink dir goes through its _spark_metadata manifest, so
    // only files committed exactly-once are visible
    val got = spark.read.parquet(out)
      .select("fp").collect().map(_.getString(0)).sorted.toSeq
    val want = DocumentStream.gate((phaseA ++ phaseB).toDF(), cutoffs)
      .select("fp").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(got === want)
    // the restart boundary was actually exercised in both directions:
    // phase B contributed new survivors, and at least one phase-B
    // duplicate of a pre-stop original was dropped by restored state
    val aFps = DocumentStream.gate(phaseA.toDF(), cutoffs)
      .select("fp").distinct().collect().map(_.getString(0)).toSet
    assert(want.exists(fp => !aFps.contains(fp)), "phase B added no survivors")
    val bDupFps = DocumentStream.gate(mkDocs(corpus.take(10).toSeq, 2000L).toDF(), cutoffs)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(bDupFps.exists(aFps.contains),
      "no post-restart duplicate of a pre-stop doc passed the gate — state restore unexercised")
  }

  test("stream-stream interval join equals the batch interval join on bounded replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[EventStream.Event]
    val clicks = MemoryStream[EventStream.Event]
    // replay in event-time order: batches arriving BEHIND the watermark
    // would be dropped (correct streaming semantics, but then stream !=
    // unbounded batch — the equality below is only promised for in-order
    // bounded replays)
    val (imp, clk) = sampleEvents.sortBy(_.ts.getTime).partition(_.event_type == "view")
    val joined = EventStream.intervalJoined(impressions.toDF(), clicks.toDF())
    val q = joined.writeStream
      .format("memory").queryName("attributed").outputMode("append").start()
    try {
      impressions.addData(imp.take(20)); clicks.addData(clk.take(10))
      q.processAllAvailable()
      impressions.addData(imp.drop(20)); clicks.addData(clk.drop(10))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.get(3).toString, r.get(4).toString)
      val got = spark.table("attributed").collect().map(key).toSet
      val want = EventStream.intervalJoined(imp.toDF(), clk.toDF()).collect().map(key).toSet
      assert(got === want)
      assert(got.nonEmpty)
      // the interval condition actually constrains: every match is within 15 min after
      assert(want.forall { case (_, _, _, l, r) =>
        val lt = java.time.LocalDateTime.parse(l.replace(' ', 'T'))
        val rt = java.time.LocalDateTime.parse(r.replace(' ', 'T'))
        !rt.isBefore(lt) && !rt.isAfter(lt.plusMinutes(15))
      })
    } finally q.stop()
  }
}
