package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Temporal ops (ops/Temporal.scala): sessionize's gap split must match
  * a hand-checked fixture exactly — including the strict-> boundary —
  * and be invariant to partitioning (the session number is a pure
  * function of each key's ordered history). */
class TemporalSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private val rows = Seq(
    // user 1: events at minute 0, 10 (gap 10), 41 (gap 31 → NEW),
    // 70 (gap 29), 100 (gap 30 EXACTLY → strict >, same session)
    (1L, ts(0), 1L, 1.0), (1L, ts(10), 2L, 1.0), (1L, ts(41), 3L, 1.0),
    (1L, ts(70), 4L, 1.0), (1L, ts(100), 5L, 1.0),
    // user 2: a lone event, and one 31 min later → two sessions
    (2L, ts(0), 6L, 1.0), (2L, ts(31), 7L, 1.0))

  private val want = Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
    5L -> 2L, 6L -> 1L, 7L -> 2L)

  private def run(parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
      .repartition(parts)
    Temporal.sessionize(ev).select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sessionize splits strictly above the gap and numbers sessions per key") {
    assert(run(1) == want)
  }

  test("sessionize is partitioning-invariant") {
    assert(run(5) == want)
  }

  test("sessionize honours a custom gap") {
    import spark.implicits._
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
    // 9-minute gap: user 1's minute-10 event starts its own session
    val got = Temporal.sessionize(ev, gapUs = 9L * 60000000L)
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("OHLC bars: open/close bracketed by low/high, counts partition the stream") {
    val bars = graft.SparkEntry.queries("q_timeseries_resample")(spark, sfDir)
      .collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
      assert(r.getLong(2) >= 1)
    }
    val nEvents = graft.warehouse.Tables.table(spark, sfDir, "events").count()
    assert(bars.map(_.getLong(2)).sum == nEvents,
      "bar counts must partition the event stream exactly")
  }

  test("RFM: every purchase user scored once, scores in 1..5, each axis spans its range") {
    val rfm = graft.SparkEntry.queries("q_events_rfm")(spark, sfDir).collect()
    val users = graft.warehouse.Tables.table(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rfm.length == users, s"${rfm.length} scored vs $users purchase users")
    val scores = Seq(4, 5, 6).map(i => rfm.map(_.getLong(i)).toSet)
    scores.foreach(s => assert(s.subsetOf((1L to 5L).toSet), s"score outside 1..5: $s"))
    // quintile scoring must actually discriminate (≥3 distinct values
    // per axis on the fixture), and the best/worst buckets must exist
    scores.foreach { s =>
      assert(s.size >= 3, s"degenerate quintile axis: $s")
      assert(s.contains(1L) && s.contains(5L), s"missing extreme bucket: $s")
    }
  }

  // ------------------------------------------------------------- scd2

  /** (key, ts-as-long, id, attr) change log: user 1 runs a→a→b→b→a
    * (two collapses, three versions); user 2 runs NULL→NULL→x (the
    * null-safe compare: NULL→NULL is NOT a change, NULL→x is). */
  private val scdRows = Seq(
    (1L, 10L, 1L, Some("a")), (1L, 20L, 2L, Some("a")),
    (1L, 30L, 3L, Some("b")), (1L, 40L, 4L, Some("b")),
    (1L, 50L, 5L, Some("a")),
    (2L, 10L, 6L, None), (2L, 20L, 7L, None), (2L, 30L, 8L, Some("x")))

  private def scdBuild(parts: Int) = {
    import spark.implicits._
    val log = scdRows.toDF("k", "t", "id", "attr").repartition(parts)
    Temporal.scd2(log, "k", "t", "id", Seq("attr"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4))))
      .toSeq
  }

  private val scdWant = Seq(
    (1L, 1L, 10L, Some(30L), Some("a")),
    (1L, 2L, 30L, Some(50L), Some("b")),
    (1L, 3L, 50L, None, Some("a")),
    (2L, 1L, 10L, Some(30L), None),
    (2L, 2L, 30L, None, Some("x")))

  test("scd2 collapses runs, versions changes, and closes intervals") {
    assert(scdBuild(1) == scdWant)
  }

  test("scd2 is partitioning-invariant and its intervals partition time") {
    val vs = scdBuild(5)
    assert(vs == scdWant)
    // structural invariants: per key, exactly one open version (the
    // last), each valid_to equals the next version's valid_from
    vs.groupBy(_._1).foreach { case (_, kv) =>
      assert(kv.count(_._4.isEmpty) == 1)
      kv.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }

  test("scd2 point-in-time lookup via asofJoin equals the interval join") {
    import spark.implicits._
    val log = scdRows.toDF("k", "t", "id", "attr")
    val versions = Temporal.scd2(log, "k", "t", "id", Seq("attr"))
    // facts at ts 15 (inside v1), 30 (exactly at a change → new
    // version), 60 (open version)
    val facts = Seq((100L, 1L, 15L), (101L, 1L, 30L), (102L, 1L, 60L))
      .toDF("fact_id", "k", "t")
    val got = graft.Graft.asofJoin(facts, versions, Seq("k"), "t",
        "valid_from")
      .select("fact_id", "attr", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((100L, "a", 1L), (101L, "b", 2L), (102L, "a", 3L)))
  }
}
