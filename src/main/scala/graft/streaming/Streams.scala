package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2 streaming block). The reference
  * has no streaming (Dask-side streams unused; Snowflake streams/tasks
  * untouched) — this is north-star scope: the same aggregations the batch
  * oracle validates in [[graft.ops.Temporal]], expressed over unbounded
  * input with watermarks and state.
  *
  * Each transform takes ANY events-shaped DataFrame — batch or streaming —
  * because `window`/`session_window` aggregations are identical in both
  * modes; StreamingSpec runs them on a MemoryStream, the oracle keys run
  * them on the parquet table. At scale these are shuffle-by-key stateful
  * aggregations whose state is bounded by the watermark, exactly the
  * Structured Streaming execution model.
  */
object Streams {

  /** events-shaped row for typed state ops */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** a closed user session produced by the custom state machine */
  case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  private case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** The cross-micro-batch session merge shared by both
    * `transformWithState` assemblers: fold the batch's SORTED events
    * into batch-local gap-sessions, then interval-coalesce the CARRIED
    * open session into the start-sorted list (envelope min/max merge
    * when within `gapUs`). Returns (closed sessions in start order,
    * trailing open session).
    *
    * Why not the plain "t − last < gap" probe against carried state:
    * under TimeMode.None nothing drops late rows, so a cross-batch
    * out-of-order event older than the open session would REWIND
    * `last` backward through the signed comparison and a later event
    * could emit a session with start > end (round-15 review catch).
    * Interval coalescing keeps every emission a well-formed envelope:
    * a within-gap regression merges (start = min, last = max), and an
    * event older than the gap horizon closes as its own session
    * immediately — with no watermark it provably cannot stitch to
    * anything still open. Events WITHIN one batch are exact (full
    * fold); only the carried envelope is coalesced at interval
    * granularity — bounded-lateness exactness is the watermarked
    * [[SessionAssemblerTimed]]'s job. For in-order streams this
    * reduces to the original fold bit-for-bit. */
  private def coalesceSessions(
      carried: Option[SessionState], events: Seq[(Long, Double)],
      gapUs: Long): (Seq[SessionState], Option[SessionState]) = {
    val batch = scala.collection.mutable.ListBuffer.empty[SessionState]
    var cur: Option[SessionState] = None
    events.foreach { case (t, v) =>
      cur match {
        case Some(s) if t - s.last < gapUs =>
          cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + v))
        case Some(s) =>
          batch += s; cur = Some(SessionState(t, t, 1, v))
        case None => cur = Some(SessionState(t, t, 1, v))
      }
    }
    cur.foreach(batch += _)
    val all = (carried.toList ++ batch.toList).sortBy(s => (s.start, s.last))
    val out = scala.collection.mutable.ListBuffer.empty[SessionState]
    all.foreach { s =>
      out.lastOption match {
        case Some(p) if s.start - p.last < gapUs =>
          out(out.length - 1) = SessionState(
            math.min(p.start, s.start), math.max(p.last, s.last),
            p.n + s.n, p.sum + s.sum)
        case _ => out += s
      }
    }
    (out.toList.dropRight(1), out.lastOption)
  }

  /** 1-hour tumbling counts with late-data bound. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** sliding 1h/15m windows with late-data bound. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** built-in session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))

  /** Stream-stream INTERVAL JOIN: each click matches same-user purchases
    * landing within [click_ts, click_ts + window]. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, so Structured Streaming can GC join state — the canonical
    * bounded-state stream-stream join. Expects `clicks(click_id, user_id,
    * click_ts)` and `purchases(purchase_id, p_user_id, p_ts, value)`;
    * works identically on batch frames (withWatermark is a no-op there),
    * which is how the `q_stream_join` oracle key validates it.
    * `joinType = "left_outer"` keeps unmatched clicks: in streaming mode
    * the null row emits once the watermark proves no purchase can still
    * arrive inside the click's window (the state-GC'd outer join —
    * StreamingSpec drives it); in batch mode it is a plain left join,
    * which is the `q_stream_join_outer` oracle.
    *
    * Hot-user bound (SkewSpec fixture): unlike the LSH/cell candidate
    * generators, the matching pairs here are the ANSWER, not an
    * intermediate — a user with C clicks and P same-window purchases
    * OWNS C·P output rows and no guard can shrink that without changing
    * the semantics. What a hot user DOES concentrate is placement: the
    * equi-key is user_id alone, so all C·P pairs (and both event lists)
    * land in one join partition / one state store. That placement — not
    * the output size — is what [[intervalJoinChunked]] bounds. */
  def intervalJoin(
      clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes", watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("p_ts", watermark),
        expr(s"""user_id = p_user_id
                | AND p_ts >= click_ts
                | AND p_ts <= click_ts + INTERVAL '$window'""".stripMargin),
        joinType)

  /** EXACT hot-user scale-out of [[intervalJoin]] — the per-(key,
    * time-chunk) decomposition [[graft.ops.Temporal.asofJoinChunked]]
    * proved, applied to the pair-producing stream join: the equi-key
    * becomes (user_id, time-chunk), so one user's events spread over
    * time spread over MANY join partitions instead of serializing into
    * one.
    *
    * Chunking rule (exactness argument): purchases key on their own
    * chunk `floor(p_ts / chunkSeconds)`; each click is REPLICATED to the
    * chunk of `click_ts` and the chunk of `click_ts + window` (distinct,
    * so ≤2 rows/click). With `chunkSeconds >= windowSeconds` a click's
    * match window spans at most those two chunks, and every matching
    * purchase lives in exactly ONE of them — each pair is produced
    * exactly once, no post-join dedup. Identical rows to [[intervalJoin]]
    * (SkewSpec proves it on a 160k-pair hot-user fixture); cost is the
    * ≤2× click-side replication. A hot user's per-partition work drops
    * from C·P to the pairs of one time chunk — bounded by event RATE,
    * not event count, the same bound the as-of chunking bought. Works on
    * batch frames identically; on streams the added equi-key narrows
    * each partition's state to one chunk of one user. */
  def intervalJoinChunked(
      clicks: DataFrame, purchases: DataFrame,
      windowSeconds: Long = 1800L, watermark: String = "10 minutes",
      chunkSeconds: Long = 1800L): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    require(chunkSeconds >= windowSeconds,
      s"chunkSeconds ($chunkSeconds) must be >= windowSeconds " +
        s"($windowSeconds): a click's window may span at most two chunks")
    val cw = chunkSeconds * 1000000L // micros
    val ck = clicks.withColumn("__chunk", explode(array_distinct(array(
      expr(s"unix_micros(click_ts) DIV $cw"),
      expr(s"(unix_micros(click_ts) + ${windowSeconds * 1000000L}) DIV $cw")))))
    val pk = purchases.withColumn("__pchunk", expr(s"unix_micros(p_ts) DIV $cw"))
    ck.withWatermark("click_ts", watermark)
      .join(pk.withWatermark("p_ts", watermark),
        expr(s"""user_id = p_user_id
                | AND __chunk = __pchunk
                | AND p_ts >= click_ts
                | AND p_ts <= click_ts + INTERVAL $windowSeconds SECOND"""
          .stripMargin))
      .drop("__chunk", "__pchunk")
  }

  /** Stateful exact dedup on event_id, state GC'd by the watermark —
    * the at-least-once-delivery repair stage (streaming twin of
    * `q_dedup_exact`). Mode-adaptive because Spark REJECTS
    * `dropDuplicatesWithinWatermark` on batch frames (unlike
    * `withWatermark`, which is a batch no-op): on a stream the
    * watermark bounds per-key state, on a batch frame the same
    * semantics are exactly `dropDuplicates` — every duplicate is
    * "within the watermark" when the whole input is one batch. The
    * `q_stream_dedup` oracle key pins the batch form; StreamingSpec
    * drives the true-streaming form through this same function. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Running per-user spend monitor on the MODERN state API
    * (`transformWithState`, Spark 4): a typed [[ValueState]] accumulates
    * each user's total; a row is emitted whenever the running total
    * crosses another multiple of `alertEvery`. The processor-based API is
    * the successor to (f)mapGroupsWithState — explicit state handles,
    * composable state variables, timer support — and is where new custom
    * state logic should land. */
  class SpendMonitor(alertEvery: Double)
      extends StatefulProcessor[Long, Event, (Long, Double)] {
    @transient private var total: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Double]("total", Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Double)] = {
      val before = if (total.exists()) total.get() else 0.0
      var acc = before
      rows.foreach(e => acc += e.value)
      total.update(acc)
      val crossed = (acc / alertEvery).toLong - (before / alertEvery).toLong
      if (crossed > 0) Iterator.single((key, acc)) else Iterator.empty
    }
  }

  /** spend alerts per user (emits (user_id, running_total) on threshold
    * crossings) via transformWithState. */
  def spendAlerts(events: Dataset[Event], alertEvery: Double = 100.0): Dataset[(Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SpendMonitor(alertEvery),
        TimeMode.None(), OutputMode.Update())
  }

  /** The corpus-curation gate as a TRANSFORM — batch or micro-batch
    * stream: drop near-dup non-survivors via a broadcast anti-join on the
    * (static, cluster-count-sized) drop list, then gate on the shared
    * quality score ([[graft.ops.Dedup.qualityE6]]). The batch oracle key
    * `q_pipeline_curate` runs exactly this function, so stream output per
    * micro-batch provably matches the batch result over the same files —
    * the continuously-fed stage scenario: a warehouse unloads document
    * batches while the curation gate admits them into the training
    * corpus. Stream-static LEFT ANTI with the static side broadcast keeps
    * the stream side shuffle-free and stateless (no watermark needed —
    * the gate is per-row). */
  def curate(
      docs: DataFrame, dropList: DataFrame,
      minQualityE6: Long = 480000L): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("text"))
      .join(broadcast(dropList.select("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        graft.ops.Dedup.qualityE6.as("quality_e6"))
      .filter(col("quality_e6") >= minQualityE6)

  /** Nightly-ingest dedup verdicts as a micro-batch stream: every batch of
    * newly-landed documents is probed against the STANDING corpus registry
    * (distinct md5 digests + distinct LSH band buckets — the two
    * membership sets [[graft.ops.Dedup.incrementalVerdicts]] builds once
    * per corpus) and each doc gets its `(exact_dup, n_bands_old, verdict)`
    * row, written idempotently to `outDir/batch-<id>`.
    *
    * Why `foreachBatch`, not a pure streaming transform: the verdict needs
    * a per-doc COUNT over the band semi-join (an aggregation) and the
    * ingest batch has no event time to watermark — `foreachBatch` gives
    * each ingest batch full batch semantics against the static registry,
    * which is exactly the nightly-ingest contract (the registry is the
    * state; the stream is stateless). Exactly-once comes from the
    * per-`batchId` overwrite: a replayed batch rewrites its own directory,
    * so restarts never duplicate verdicts — StreamingSpec proves
    * stream ≡ batch across a stop/restart. `outDir` must be owned by
    * this checkpoint: batch-<id> directories from a DIFFERENT checkpoint
    * would survive alongside this query's output and pollute a
    * glob-union read. At scale both registry sides are id-only distinct
    * sets (32-byte digests, 12-byte buckets), shuffled once and reused
    * every night — cache them, or every micro-batch re-aggregates the
    * corpus. */
  def ingestVerdictQuery(
      newDocs: DataFrame, oldDigests: DataFrame, oldBuckets: DataFrame,
      outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Dedup.ingestVerdicts(batch, oldDigests, oldBuckets)
          .write.mode("overwrite").parquet(s"$outDir/batch-$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** a closed session keyed in raw epoch MICROSECONDS — the exactness
    * carrier behind [[sessionize]] and the `q_stream_session_state`
    * oracle key (events.ts has true µs precision; a millis-based state
    * machine would silently truncate boundaries and output stamps) */
  case class USession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Custom sessionization core via arbitrary state
    * (`flatMapGroupsWithState`): emits a [[USession]] when a user goes
    * quiet for `gapUs` microseconds. This is the escape hatch for
    * semantics `session_window` can't express (e.g. value-dependent
    * gaps); state per key is O(1). Input rows are (user_id, t_us,
    * event_id, value); within a user, events fold in (t_us, event_id)
    * order, so the running double sum is a DETERMINISTIC left fold the
    * DuckDB oracle replays with an ordered list_reduce. */
  def sessionizeMicros(events: Dataset[(Long, Long, Long, Double)],
      gapUs: Long = 30L * 60 * 1000000L): Dataset[USession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, USession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[(Long, Long, Long, Double)],
         state: GroupState[SessionState]) =>
          // batch-mode contract: each group's full event set arrives once
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          val out = Seq.newBuilder[USession]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { case (_, t, _, v) =>
            cur match {
              case Some(s) if t - s.last < gapUs =>
                cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + v))
              case Some(s) =>
                out += USession(userId, s.start, s.last, s.n, s.sum)
                cur = Some(SessionState(t, t, 1, v))
              case None =>
                cur = Some(SessionState(t, t, 1, v))
            }
          }
          // flush the trailing open session (batch semantics; a true
          // stream would keep it in state until timeout)
          cur.foreach(s => out += USession(userId, s.start, s.last, s.n, s.sum))
          state.remove()
          out.result().iterator
      }
  }

  /** [[sessionizeMicros]]'s state machine on the MODERN state API
    * (`transformWithState`, Spark 4 — the successor to
    * (f)mapGroupsWithState with explicit state handles, composable
    * state variables, timer/TTL support). Identical fold, identical
    * µs-exact semantics; the one contract dial is `flushAtEnd`:
    *
    *  - `true` (batch mode / the oracle key): the trailing open
    *    session flushes and state clears — each key's full event set
    *    arrives in one invocation, so every session is closed.
    *  - `false` (true streaming): the open session STAYS in the
    *    [[ValueState]] across micro-batches and only gap-closed
    *    sessions emit — a session spanning two micro-batches stitches
    *    instead of splitting at the batch boundary (StreamingSpec pins
    *    the stitch). Idle-timeout emission would add an event-time
    *    timer here; the batch oracle doesn't need one.
    */
  class SessionAssembler(gapUs: Long, flushAtEnd: Boolean)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), USession] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long, Double)],
        timerValues: TimerValues): Iterator[USession] = {
      // same deterministic (µs, event_id) fold order as sessionizeMicros;
      // the carried open session merges by interval coalescing
      // ([[coalesceSessions]] — rewind-safe under cross-batch disorder)
      val sorted = rows.toSeq.sortBy(e => (e._2, e._3)).map(e => (e._2, e._4))
      val carried = if (open.exists()) Some(open.get()) else None
      val (closed, openNow) = coalesceSessions(carried, sorted, gapUs)
      if (flushAtEnd) {
        open.clear()
        (closed ++ openNow)
          .map(s => USession(key, s.start, s.last, s.n, s.sum)).iterator
      } else {
        openNow match {
          case Some(s) => open.update(s)
          case None => open.clear()
        }
        closed.map(s => USession(key, s.start, s.last, s.n, s.sum)).iterator
      }
    }
  }

  /** [[sessionizeMicros]] on `transformWithState` — the oracle key
    * `q_stream_session_tws` runs this in BATCH mode (flushAtEnd) and
    * must equal the flatMapGroupsWithState key row for row;
    * StreamingSpec additionally drives it over MemoryStream
    * micro-batches with `flushAtEnd = false`, where the open session
    * stitches across batches instead of splitting. */
  def sessionizeMicrosTws(events: Dataset[(Long, Long, Long, Double)],
      gapUs: Long = 30L * 60 * 1000000L,
      flushAtEnd: Boolean = true): Dataset[USession] = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) ensureStateStoreCoordinator(events.sparkSession)
    events.groupByKey(_._1)
      .transformWithState(new SessionAssembler(gapUs, flushAtEnd),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[SessionAssembler]] plus the rung its scaladoc names: IDLE-TIMEOUT
    * emission through an EVENT-TIME TIMER. `flushAtEnd = false` stitches
    * open sessions across micro-batches but can only ever CLOSE a
    * session when a later event for the same key arrives — a user who
    * goes quiet holds state forever and their last session never emits.
    * Here every open session re-arms one per-key timer at
    * `last + gap` (old timers deleted first — one timer per key), and
    * [[handleExpiredTimer]] emits + clears when the WATERMARK passes
    * that instant: the stream itself proves no in-gap event can still
    * arrive, which is exactly the correctness condition
    * `sessionizeMicros`' batch fold gets for free from seeing all data.
    * Timer granularity is ms (the timer API), event math stays µs — the
    * expiry rounds UP so a timer can never fire a µs early. */
  class SessionAssemblerTimed(gapUs: Long)
      extends StatefulProcessor[
        Long, (Long, Long, Long, Double, java.sql.Timestamp), USession] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[USession] = {
      // allowed-late rows (inside the watermark delay) merge through the
      // same rewind-safe interval coalesce as the un-timed assembler
      val sorted = rows.toSeq.sortBy(e => (e._2, e._3)).map(e => (e._2, e._4))
      val carried = if (open.exists()) Some(open.get()) else None
      val (closed, openNow) = coalesceSessions(carried, sorted, gapUs)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      openNow match {
        case Some(s) =>
          open.update(s)
          // µs → ms rounded UP: fire only once the watermark has passed
          // the full µs-precise gap boundary
          getHandle.registerTimer(
            Math.floorDiv(s.last + gapUs - 1, 1000L) + 1)
        case None => open.clear()
      }
      closed.map(s => USession(key, s.start, s.last, s.n, s.sum)).iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[USession] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        open.clear()
        Iterator.single(USession(key, s.start, s.last, s.n, s.sum))
      }
    }
  }

  /** [[sessionizeMicrosTws]]'s idle-timeout sibling — true-streaming
    * session emission driven by the WATERMARK, not by the next event:
    * a session emits as soon as the watermark proves its gap closed.
    * Requires event-time mode, so the µs column is lifted to a
    * timestamp and watermarked with `delay`. StreamingSpec pins that an
    * idle user's session emits via the timer with NO further event for
    * that user. */
  def sessionizeMicrosTwsTimed(events: Dataset[(Long, Long, Long, Double)],
      gapUs: Long = 30L * 60 * 1000000L,
      delay: String = "0 milliseconds"): Dataset[USession] = {
    val sess = events.sparkSession
    import sess.implicits._
    if (!events.isStreaming) ensureStateStoreCoordinator(sess)
    events.toDF("user_id", "t_us", "event_id", "value")
      .withColumn("__ts", timestamp_micros(col("t_us")))
      .withWatermark("__ts", delay)
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionAssemblerTimed(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch execution of `transformWithState` looks up the driver's
    * StateStoreCoordinator RPC endpoint, but only streaming-query
    * startup creates it — a cold session running the batch plan dies
    * with RpcEndpointNotFoundException. Initialize the
    * StreamingQueryManager's OWN lazy coordinator handle (JVM-public,
    * Scala `private[sql]` — hence the one reflective call) so batch
    * and later streaming queries share the one endpoint; idempotent,
    * and creating it through the manager can never collide with the
    * manager's own registration. */
  private def ensureStateStoreCoordinator(
      spark: org.apache.spark.sql.SparkSession): Unit =
    spark.streams.getClass.getMethod("stateStoreCoordinator")
      .invoke(spark.streams)

  /** [[sessionizeMicros]] under the typed [[Event]]/[[Session]] surface
    * (timestamps in and out; µs-exact through the state machine). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    def toUs(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
      t
    }
    sessionizeMicros(
      events.map(e => (e.user_id, toUs(e.ts), e.event_id, e.value)),
      gapMs * 1000L)
      .map(s => Session(s.user_id, toTs(s.start_us), toTs(s.end_us),
        s.n_events, s.sum_value))
  }
}
