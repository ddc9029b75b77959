package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Streams.{Event, Session}

/** True Structured Streaming execution (readStream → transform →
  * writeStream) over a MemoryStream — the streaming half of SURVEY §2's
  * streaming block; the batch analogues are oracle-checked as
  * q_stream_* keys. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def runToCompletion(
      stream: org.apache.spark.sql.DataFrame,
      mode: String, name: String): org.apache.spark.sql.DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window counts over a real stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(10), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    val out = runToCompletion(
      Streams.tumblingCounts(mem.toDF()), "complete", "t_tumbling")
    val rows = out.orderBy("window_start", "event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2) // two clicks in hour 0
    assert(rows(1).getAs[Long]("n") == 1) // one view in hour 1
  }

  test("watermark drops late rows once the watermark passes them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val stream = Streams.tumblingCounts(mem.toDF(), watermark = "10 minutes")
    val q = stream.writeStream
      .format("memory").queryName("t_late").outputMode("append").start()
    // batch 1: hour-0 data, then advance event time far ahead
    mem.addData(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(30), 1, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(300), 1, "click", 1.0)) // watermark → 290min
    q.processAllAvailable()
    // batch 3: a VERY late hour-0 event — behind the watermark, dropped
    mem.addData(Event(4, ts(6), 1, "click", 99.0))
    q.processAllAvailable()
    q.stop()
    val hour0 = spark.table("t_late")
      .filter(col("window_start") === ts(0)).collect()
    assert(hour0.length == 1)
    assert(hour0(0).getAs[Long]("n") == 2, "late row must not be counted")
  }

  test("stream-stream interval join matches clicks to in-window purchases") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("click_id", "user_id", "click_ts"),
      purchases.toDF().toDF("purchase_id", "p_user_id", "p_ts", "value"))
    val q = joined.writeStream
      .format("memory").queryName("t_sjoin").outputMode("append").start()
    // event times start past 0: the initial watermark is the epoch itself,
    // and stream-stream joins drop input AT/behind the watermark as late
    clicks.addData((1L, 1L, ts(1)), (2L, 2L, ts(2)))
    purchases.addData(
      (10L, 1L, ts(10), 5.0),  // in window for click 1
      (11L, 1L, ts(45), 7.0),  // outside the 30-min window
      (12L, 3L, ts(5), 9.0))   // no matching user
    q.processAllAvailable()
    // later batch: purchase arrives for click 2, still inside its window
    purchases.addData((13L, 2L, ts(25), 3.0))
    q.processAllAvailable()
    // nudge batch: the two MemoryStreams' offsets can land in separate
    // micro-batches, so a side's rows may enter join state one batch after
    // the other side probed — a non-matching row on each side forces one
    // more cycle that flushes any straggler match
    clicks.addData((99L, 999L, ts(5000)))
    purchases.addData((99L, 998L, ts(5000), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_sjoin")
      .select("click_id", "purchase_id").orderBy("click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 13L)))
  }

  test("LEFT OUTER interval join emits the null row once the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("click_id", "user_id", "click_ts"),
      purchases.toDF().toDF("purchase_id", "p_user_id", "p_ts", "value"),
      joinType = "left_outer")
    val q = joined.writeStream
      .format("memory").queryName("t_sjoin_outer").outputMode("append").start()
    clicks.addData((1L, 1L, ts(1)), (2L, 2L, ts(2)))   // 2 never converts
    purchases.addData((10L, 1L, ts(10), 5.0))
    q.processAllAvailable()
    // click 2's null row may only emit once the watermark passes
    // click_ts + window + delay — advance BOTH sides far past it
    clicks.addData((99L, 999L, ts(5000)))
    purchases.addData((98L, 998L, ts(5000), 0.0))
    q.processAllAvailable()
    // one more cycle so the watermark computed from batch N's max event
    // time is APPLIED to state eviction in batch N+1
    clicks.addData((97L, 997L, ts(6000)))
    purchases.addData((96L, 996L, ts(6000), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_sjoin_outer")
      .filter(col("click_id") < 90)
      .select("click_id", "purchase_id").orderBy("click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, -1L)),
      s"click 2 must surface with a NULL purchase: ${rows.toSeq}")
  }

  test("chunked interval join runs as a REAL stream and matches the plain variant") {
    // the hot-user scale-out must stay a legal stream-stream join: the
    // added (time-chunk) equi-key and the click-side explode may not
    // break watermark-based state GC or drop/duplicate matches across
    // micro-batch boundaries (a click replicated to 2 chunks meets each
    // purchase in exactly one of them)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = Streams.intervalJoinChunked(
      clicks.toDF().toDF("click_id", "user_id", "click_ts"),
      purchases.toDF().toDF("purchase_id", "p_user_id", "p_ts", "value"),
      windowSeconds = 1800L, chunkSeconds = 1800L)
    val q = joined.writeStream
      .format("memory").queryName("t_sjoinc").outputMode("append").start()
    clicks.addData((1L, 1L, ts(1)), (2L, 2L, ts(2)),
      (3L, 1L, ts(28))) // window [28, 58) straddles the 30-min chunk edge
    purchases.addData(
      (10L, 1L, ts(10), 5.0),  // in window for click 1 (same chunk)
      (11L, 1L, ts(45), 7.0),  // next chunk: matches click 3 ONLY (via its replica)
      (12L, 3L, ts(5), 9.0))   // no matching user
    q.processAllAvailable()
    purchases.addData((13L, 2L, ts(25), 3.0))
    q.processAllAvailable()
    clicks.addData((99L, 999L, ts(5000)))
    purchases.addData((99L, 998L, ts(5000), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_sjoinc")
      .select("click_id", "purchase_id").orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // click 3 (t=28min) matches purchases 10? no (t=10 < 28) — matches 11
    // (t=45 ∈ [28, 58]) across the chunk boundary, exactly once
    assert(rows.toSeq == Seq((1L, 10L), (2L, 13L), (3L, 11L)))
  }

  test("stateful dedup within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = Streams.dedupWithinWatermark(mem.toDF()).writeStream
      .format("memory").queryName("t_dedup").outputMode("append").start()
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0), // dup id in same batch
      Event(2, ts(2), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: an at-least-once REPLAY of batch 1 plus one new event —
    // the state store dedups ACROSS micro-batches, not just within one
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 1, "click", 1.0),
      Event(3, ts(3), 1, "click", 2.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_dedup")
    assert(out.count() == 3)
    assert(out.select("event_id").distinct().count() == 3)
  }

  test("custom sessionization via flatMapGroupsWithState (batch mode)") {
    import spark.implicits._
    // batch Dataset through the same state function: two sessions for
    // user 1 (40-min gap), one for user 2
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(50), 1, "click", 3.0),
      Event(4, ts(0), 2, "view", 4.0)).toDS()
    val sessions = Streams.sessionize(events).collect()
      .sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0) == Session(1, ts(0), ts(10), 2, 3.0))
    assert(sessions(1) == Session(1, ts(50), ts(50), 1, 3.0))
    assert(sessions(2) == Session(2, ts(0), ts(0), 1, 4.0))
  }

  test("transformWithState sessionizer equals flatMapGroupsWithState on the warehouse slice") {
    import spark.implicits._
    // the modern-API twin's batch contract, pinned on REAL data: both
    // state machines fold the same (µs, event_id)-ordered events, so
    // the session rows — double sums included — must be identical
    val ev = graft.warehouse.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("t_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    val legacy = Streams.sessionizeMicros(ev).collect().toSet
    val modern = Streams.sessionizeMicrosTws(ev).collect().toSet
    assert(modern == legacy,
      s"tws diverged from fMGWS: missing=${legacy -- modern}, " +
        s"extra=${modern -- legacy}")
    assert(modern.nonEmpty)
  }

  test("transformWithState sessionizer stitches an open session across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // flushAtEnd=false is the TRUE-STREAMING contract the fMGWS twin
    // cannot express: the open session lives in ValueState between
    // micro-batches, so a session spanning the batch boundary stitches
    // instead of splitting, and only gap-closed sessions ever emit.
    // STREAMING tws needs the RocksDB store (multiple column families —
    // same requirement as the spend-alert test; batch-mode tws runs on
    // the default provider)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val q = Streams.sessionizeMicrosTws(mem.toDS(), flushAtEnd = false)
      .toDF().writeStream
      .format("memory").queryName("t_tws_sessions")
      .outputMode("append").start()
    val min = 60L * 1000000L
    // batch 1: user 7 active at t=0..10min — stays OPEN (no emission)
    mem.addData((7L, 0L, 1L, 1.0), (7L, 10 * min, 2L, 2.0))
    q.processAllAvailable()
    assert(spark.table("t_tws_sessions").count() == 0,
      "an open session must not emit at a micro-batch boundary")
    // batch 2: user 7 returns at t=25min (gap 15min < 30 → SAME session),
    // then at t=90min (gap 65min → closes the stitched session)
    mem.addData((7L, 25 * min, 3L, 4.0), (7L, 90 * min, 4L, 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_tws_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.toSeq == Seq((7L, 0L, 25 * min, 3L, 7.0)),
      s"expected the stitched 3-event session, got ${rows.toSeq}")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("tws sessionizer survives cross-batch DISORDER without rewinding the open session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // round-15 review: under TimeMode.None nothing drops late rows, so
    // a cross-batch out-of-order event used to rewind the open
    // session's `last` backward and a later event could emit
    // start > end. The interval coalesce keeps every emission a
    // well-formed envelope.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Long, Double)]
      val q = Streams.sessionizeMicrosTws(mem.toDS(), flushAtEnd = false)
        .toDF().writeStream
        .format("memory").queryName("t_tws_disorder")
        .outputMode("append").start()
      val min = 60L * 1000000L
      // batch 1: open session at t=100min
      mem.addData((7L, 100 * min, 1L, 1.0))
      q.processAllAvailable()
      // batch 2: a STALE event at t=10min — older than the open
      // session's gap horizon → closes immediately as its own
      // singleton; the open session must NOT rewind
      mem.addData((7L, 10 * min, 2L, 2.0))
      q.processAllAvailable()
      val afterStale = spark.table("t_tws_disorder").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(afterStale.toSeq == Seq((10 * min, 10 * min, 1L)),
        s"stale event must emit as its own envelope, got ${afterStale.toSeq}")
      // batch 3: a within-gap REGRESSION at t=90min envelope-merges into
      // the open [100,100] session (start = min), then t=200min closes it
      mem.addData((7L, 90 * min, 3L, 4.0), (7L, 200 * min, 4L, 8.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t_tws_disorder").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq(
        (10 * min, 10 * min, 1L, 2.0),
        (90 * min, 100 * min, 2L, 5.0)),
        s"expected the merged [90,100] envelope to close, got ${rows.toSeq}")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("timed tws sessionizer emits an idle session when the WATERMARK passes — no next event needed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the contract flushAtEnd=false cannot express: a user who goes
    // QUIET still gets their session emitted, because the event-time
    // timer fires when the watermark (advanced by OTHER keys' events)
    // passes last + gap. RocksDB provider as in the sibling tws tests.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Long, Double)]
      val q = Streams.sessionizeMicrosTwsTimed(mem.toDS())
        .toDF().writeStream
        .format("memory").queryName("t_tws_timed")
        .outputMode("append").start()
      val min = 60L * 1000000L
      // fixture sits at t = 1000min+ so no event can collide with the
      // INITIAL watermark at epoch 0 (EventTime mode drops rows at or
      // behind the watermark as late)
      val base = 1000 * min
      // batch 1: user 7 active for 10min, then silent forever
      mem.addData((7L, base, 1L, 1.0), (7L, base + 10 * min, 2L, 2.0))
      q.processAllAvailable()
      assert(spark.table("t_tws_timed").count() == 0,
        "open session must not emit while the watermark is behind the gap")
      // batch 2: ANOTHER user's event 120min later advances the
      // watermark (applied from the NEXT batch on)
      mem.addData((9L, base + 120 * min, 3L, 5.0))
      q.processAllAvailable()
      // batch 3: any further data triggers timer evaluation against the
      // now-advanced watermark (base+120min > base+10min + 30min gap)
      mem.addData((9L, base + 121 * min, 4L, 6.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t_tws_timed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      assert(rows.toSeq == Seq((7L, base, base + 10 * min, 2L, 3.0)),
        s"expected user 7's idle session via the event-time timer, got ${rows.toSeq}")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("file-source stream: readStream over the parquet warehouse (Trigger.AvailableNow)") {
    import org.apache.spark.sql.streaming.Trigger
    // stream the events table as if files were arriving; one AvailableNow
    // pass must reproduce the batch tumbling aggregation. events.ts has
    // shipped as both TIMESTAMP(NANOS) and TIMESTAMP_NTZ parquet —
    // Tables.normalizeTs is the single shim that maps either form to
    // TimestampType, and the stream path must ride the SAME shim (this
    // test is the regression net for the round-10 NTZ breakage).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source wants a directory it can watch — stage the table file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.warehouse.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val agg = Streams.tumblingCounts(stream, watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("t_file_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("t_file_stream")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    val batch = spark.read.parquet(dir.toString).count()
    assert(streamed == batch, "streamed window counts must cover every event")
  }

  test("transformWithState: spend alerts fire on threshold crossings across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState's multiple column families need the RocksDB store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val mem = MemoryStream[Event]
    val alerts = Streams.spendAlerts(mem.toDS(), alertEvery = 100.0)
    val q = alerts.toDF("user_id", "running_total").writeStream
      .format("memory").queryName("t_spend").outputMode("update").start()
    // batch 1: user 1 reaches 90 (no alert), user 2 reaches 120 (alert)
    mem.addData(Event(1, ts(1), 1, "purchase", 90.0),
      Event(2, ts(1), 2, "purchase", 120.0))
    q.processAllAvailable()
    // batch 2: user 1 crosses 100 with +20 (alert); user 2 adds 10 (none)
    mem.addData(Event(3, ts(2), 1, "purchase", 20.0),
      Event(4, ts(2), 2, "purchase", 10.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_spend").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._2)
    assert(rows.toSeq == Seq((1L, 110.0), (2L, 120.0)),
      s"expected exactly the two crossing alerts, got ${rows.toSeq}")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streaming session_window matches the batch oracle shape") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(120), 1, "click", 1.0))
    val out = runToCompletion(
      Streams.sessionCounts(mem.toDF()), "complete", "t_session")
    val rows = out.orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2)
    assert(rows(1).getAs[Long]("n") == 1)
  }

  test("corpus curation as a micro-batch stream: batch == stream over the same files, restart-safe") {
    import org.apache.spark.sql.streaming.Trigger
    // the continuously-fed stage: document batches land in a graft stage
    // dir, the curation gate (broadcast drop-list anti-join + quality
    // threshold) admits rows per micro-batch through the graft stream
    // source, results must equal the BATCH q_pipeline_curate gate over
    // the same files — including across a stop/restart with new arrivals.
    val docs = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val drops = graft.SparkEntry.queries("q_dedup_resolve")(spark, sfDir)
      .filter(!col("is_survivor")).select("doc_id")
      .cache() // static side: computed once, reused across micro-batches
    val stageDir = java.nio.file.Files.createTempDirectory("graft_curate_stage").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_curate_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_curate_out").toString
    val schema = docs.schema

    // parquet file sink: supports checkpoint RECOVERY (the memory sink
    // does not) and gives exactly-once output via its own metadata log
    def runStream(): Unit = {
      val stream = spark.readStream.format("graft").schema(schema)
        .option("max_files_per_trigger", "1") // bounded catch-up batches
        .load(stageDir)
      val q = Streams.curate(stream, drops).writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def curatedOut(): Set[(Long, String, Long)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // phase 1: half the corpus is staged
    docs.filter(col("doc_id") % 2 === 0).repartition(2)
      .write.mode("append").parquet(stageDir)
    runStream()
    val phase1 = curatedOut()
    assert(phase1.nonEmpty, "first stream pass must admit rows")

    // phase 2: the rest lands; SAME checkpoint → the restarted stream
    // processes only the new files (committed offsets replay nothing)
    docs.filter(col("doc_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(stageDir)
    runStream()
    val all = curatedOut()
    val phase2 = all -- phase1
    assert(phase2.nonEmpty, "restart must pick up the new files")

    // exactly-once across the restart AND batch == stream over all files
    val batch = Streams.curate(docs, drops).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(spark.read.parquet(outDir).count() == all.size,
      "a restarted stream must not re-admit rows the checkpoint covered (no dup rows)")
    assert(all == batch,
      s"stream output (${all.size}) must equal the batch gate (${batch.size})")
    drops.unpersist()
  }

  test("nightly-ingest dedup verdicts: stream == q_dedup_incremental, restart-safe") {
    // the nightly-ingest scenario: new document batches land in a stage
    // dir; each micro-batch is probed against the STANDING corpus registry
    // (distinct digests + distinct band buckets over the 6/7 old slice)
    // and must produce byte-identical verdicts to the oracle-checked batch
    // key q_dedup_incremental — including across a stop/restart, with no
    // duplicated verdicts (idempotent per-batchId output).
    val docs = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val isNew = col("doc_id") % 7 === 0
    val old = docs.filter(!isNew)
    val oldDg = old.select(md5(col("text")).as("dg")).distinct().cache()
    val oldBk = graft.ops.Dedup.bandsOf(old)
      .select("band_idx", "band_val").distinct().cache()

    val stageDir = java.nio.file.Files.createTempDirectory("graft_ingest_stage").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val schema = docs.schema

    def runStream(): Unit = {
      val stream = spark.readStream.format("graft").schema(schema)
        .load(stageDir)
      val q = Streams.ingestVerdictQuery(stream, oldDg, oldBk, outDir, ckpt)
      q.awaitTermination(120000)
    }
    def verdicts(): Seq[(Long, Boolean, Long, String)] =
      spark.read.parquet(s"$outDir/batch-*").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3)))
        .toSeq

    // phase 1: half the new batch lands
    docs.filter(isNew && col("doc_id") % 2 === 0).repartition(2)
      .write.mode("append").parquet(stageDir)
    runStream()
    val phase1 = verdicts()
    assert(phase1.nonEmpty, "first stream pass must emit verdicts")

    // phase 2: the rest lands; SAME checkpoint → only the new files run
    docs.filter(isNew && col("doc_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(stageDir)
    runStream()
    val all = verdicts()
    assert(all.size > phase1.size, "restart must pick up the new files")

    // no duplicate verdicts across the restart, and stream == the
    // oracle-checked batch key over the same corpus slice
    assert(all.map(_._1).distinct.size == all.size,
      "a restarted stream must not re-emit verdicts the checkpoint covered")
    val batch = graft.SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(all.toSet == batch.toSet,
      s"stream verdicts (${all.size}) must equal batch q_dedup_incremental (${batch.size})")
    oldDg.unpersist(); oldBk.unpersist()
  }
}
