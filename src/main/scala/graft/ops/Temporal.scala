package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.warehouse.Tables

/** Time/JSON/event-stream operators over the `events` table (SURVEY §2:
  * `q_scalar_json`, `q_join_asof`, and the batch-checkable analogues of the
  * Structured Streaming windows — time `window()`/`session_window()` are
  * identical expressions in batch mode, so the oracle validates the exact
  * aggregation a stream would run; true `readStream` execution is covered
  * in StreamingSpec).
  */
object Temporal {

  private val D386 = DecimalType(38, 6)
  private val D380 = DecimalType(38, 0)

  /** Exact sum of a double column that is reproducible across engines and
    * partition orders: decimal inside the agg, double on the way out. */
  private def dsum(c: String) = sum(col(c).cast(D386)).cast(DoubleType)

  /** Gap-based session assignment ([[graft.Graft.sessionize]]): appends
    * `session_seq` — a 1-based per-key session number that increments
    * wherever the gap to the key's previous row exceeds `gapUs`
    * microseconds. Gaps-and-islands as two windows over ONE
    * (keyCol)-hash partitioning: a lag() marks session starts, a
    * running sum numbers them — at 100 TB this is one shuffle on the
    * key followed by partition-local sorts, and any downstream
    * per-(key, session_seq) aggregate reuses the same partitioning.
    * Determinism: the row order is total ((tsCol, idCol) with a unique
    * id), the gap compare is exact integer microseconds. A pathological
    * mega-key sorts on one core — the documented chunking treatment
    * (q_pack_sequences_chunked) applies if a fixture grows one. */
  private[graft] def sessionize(ev: org.apache.spark.sql.DataFrame,
      gapUs: Long = 1800000000L, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id") = {
    require(gapUs > 0, s"session gap must be positive microseconds: $gapUs")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, idCol)
    ev.withColumn("__gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new_sess",
        when(col("__gap_us").isNull || col("__gap_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("__new_sess").over(w))
      .drop("__gap_us", "__new_sess")
  }

  /** SCD Type-2 dimension build ([[graft.Graft.scd2]]): collapse a
    * change log into versioned validity intervals — per `keyCol`, rows
    * where the `attrCols` tuple differs from the key's previous row
    * (null-safe struct compare) open a new version; `valid_from` is the
    * change row's `tsCol`, `valid_to` the next change's (NULL = current
    * version). The warehouse dimension-history primitive: downstream
    * point-in-time lookups join the version valid at a fact's
    * timestamp. Shape: ONE keyCol hash shuffle carrying a lag (change
    * detection), a row_number (version), and a lead (interval close) —
    * all three windows share the partitioning and the (tsCol, idCol)
    * total order, so at 100 TB this is one shuffle + partition-local
    * sorts regardless of log size. Determinism: idCol must be unique
    * within (keyCol, tsCol) ties. */
  private[graft] def scd2(log: org.apache.spark.sql.DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      attrCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, idCol)
    val attrs = struct(attrCols.map(col): _*)
    log
      .withColumn("__prev", lag(attrs, 1).over(w))
      // first row: lag is NULL and <=> is false → a change by definition
      .filter(!(attrs <=> col("__prev")))
      .drop("__prev")
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select((Seq(keyCol, "version", "valid_from", "valid_to") ++ attrCols)
        .map(col): _*)
  }

  /** The right side of both as-of variants: one purchase per (user, ts) —
    * max event_id wins, with its value — so the as-of match is
    * deterministic under ts ties. ONE definition shared by the window and
    * broadcast plans ("two plans, one truth"). */
  private def purchasesDeduped(ev: org.apache.spark.sql.DataFrame) =
    ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("p_id"),
        max_by(col("value"), col("event_id")).as("p_value"))

  /** Generic LEFT AS-OF join (the warehouse ASOF JOIN shape,
    * [[graft.Graft.asofJoin]]): for every left row, attach the value
    * columns of the most recent right row with `rightTime` ≤ `leftTime`,
    * matched on equal `keys`; no match → nulls. Union + last(ignoreNulls)
    * over ONE window: one shuffle on the keys, no range explosion, never
    * O(n²). At equal timestamps the right row IS visible (the `>=`
    * ASOF semantics — right rows sort before left rows at a tie). For a
    * deterministic result the right side should be unique per
    * (keys, rightTime) — pre-aggregate ties like [[purchasesDeduped]]
    * does. Right value column names must not collide with left columns,
    * and neither side may use the reserved `__t`/`__side`/`__rv` names.
    *
    * The right row's value columns travel as ONE struct, not
    * independently: a struct is non-null even when every field is, so
    * the window's last(ignoreNulls) always picks the MOST RECENT right
    * row — per-column carries would skip a genuinely-NULL newest value
    * (returning a stale older one) and could stitch fields from
    * different right rows into one that never existed. The
    * oracle-checked `q_join_asof` runs THROUGH this function, so the
    * DuckDB ASOF JOIN pins its semantics.
    *
    * NULL keys NEVER match (warehouse ASOF equality semantics): right
    * rows with any NULL key are dropped before the union, so a NULL-key
    * left row shares its window partition with no right rows and comes
    * back with NULL values — not with "the most recent NULL-key right
    * row", which `Window.partitionBy`'s NULL-grouping would otherwise
    * silently produce.
    *
    * Scale note (hot keys): the window partitions by `keys`, so ALL
    * rows of one key — left and right together — sort inside a single
    * task. Cost is the sort, O(n log n) per key with no pair blowup
    * (the carried state is one struct), which stays tractable into the
    * low millions of rows per key (SkewSpec pins a 100k-event hot
    * key); beyond that, pre-aggregate the right side coarser (as
    * `purchasesDeduped` does per (key, ts)) or split the time axis into
    * coarse epochs and as-of join per epoch carrying each epoch's last
    * right row forward — the same chunk trick `Text.packChunked` uses. */
  private def asofValidate(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], rightTime: String): Seq[String] = {
    val leftCols = left.columns.toSeq
    val rightVals = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTime)
    require(rightVals.nonEmpty,
      "the right side carries no value columns beyond the keys and time")
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.intersect(leftCols)} collide with left columns")
    val reserved = Seq("__t", "__side", "__rv", "__epoch", "__carry")
    val clashes = (leftCols ++ right.columns).filter(reserved.contains)
    require(clashes.isEmpty,
      s"columns $clashes collide with asofJoin's reserved internal names $reserved")
    rightVals
  }

  /** The union+window carry at the heart of both as-of variants:
    * left rows come back with the matched right row as ONE struct
    * column `__rv` (null = no right row at or before the left time
    * within the partition keys). Callers run [[asofValidate]] first;
    * `partKeys` may extend the user keys (the chunked variant adds
    * `__epoch`). */
  private def asofCore(
      left: org.apache.spark.sql.DataFrame, rightKeyed: org.apache.spark.sql.DataFrame,
      partKeys: Seq[String], leftTime: String, rightTime: String,
      rightVals: Seq[String]): org.apache.spark.sql.DataFrame = {
    val leftCols = left.columns.toSeq
    val leftOnly = leftCols.filterNot(partKeys.contains)
    val unionCols = (partKeys ++ leftOnly ++ Seq("__rv", "__t", "__side")).map(col)
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => rightKeyed.schema(rightKeyed.schema.fieldIndex(c))))
    val lSide = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
      .select(unionCols: _*)
    val rSide = leftOnly.foldLeft(
      rightKeyed.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__rv", struct(rightVals.map(col): _*))) {
      (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(unionCols: _*)
    val w = Window.partitionBy(partKeys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** NULL keys never match under ASOF equality, and a NULL rightTime
    * never satisfies `rightTime ≤ leftTime` (three-valued comparison) —
    * drop both before the union. Without the time filter a NULL-__t
    * right row sorts FIRST (nulls first) and its struct would be
    * carried into every left row as a phantom match. A NULL LEFT time
    * needs no filter: it sorts to the partition start ahead of every
    * (non-NULL-time) right row, so the carry is empty → NULL values,
    * the correct unknown-comparison result. */
  private def dropNullKeys(
      right: org.apache.spark.sql.DataFrame, keys: Seq[String],
      rightTime: String) =
    (keys :+ rightTime).foldLeft(right)((df, k) => df.filter(col(k).isNotNull))

  private[graft] def asofJoin(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val leftCols = left.columns.toSeq
    val rightVals = asofValidate(left, right, keys, rightTime)
    asofCore(left, dropNullKeys(right, keys, rightTime), keys, leftTime,
        rightTime, rightVals)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** FORWARD as-of join ([[graft.Graft.asofJoin]] with
    * `forward = true`): for every left row, the EARLIEST right row with
    * `rightTime` >= `leftTime` on equal keys — the conversion/next-event
    * shape (each click's first following purchase). Implemented by exact
    * time reversal: negate both time axes, run the backward join, negate
    * back — so it inherits every backward hardening verbatim (NULL keys
    * never match, NULL right times never match, the one-struct carry,
    * and the `epochWidth` hot-key chunking, whose epoch math is a true
    * floor for the negative times this creates). Equality is inclusive
    * in both directions: rt == lt matches forward exactly as it does
    * backward. Time columns must be numeric (negation), which
    * [[asofValidate]]'s integral-time check already demands for
    * chunking; the facade requires it for both variants. */
  private[graft] def asofJoinForward(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      epochWidth: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val l2 = left.withColumn(leftTime, -col(leftTime))
    val r2 = right.withColumn(rightTime, -col(rightTime))
    val joined = epochWidth match {
      case Some(w) => asofJoinChunked(l2, r2, keys, leftTime, rightTime, w)
      case None => asofJoin(l2, r2, keys, leftTime, rightTime)
    }
    joined.withColumn(leftTime, -col(leftTime))
  }

  /** Floor division that is a true floor for negative times too (SQL
    * `DIV` truncates toward zero, which would put t ∈ (-w, 0) in epoch
    * 0 alongside t ∈ [0, w)). The column name is backtick-quoted — it
    * is USER input interpolated into a SQL fragment, and an unquoted
    * name like `t-1` would silently parse as arithmetic. */
  private def floorDivExpr(c: String, w: Long): String = {
    val q = s"`${c.replace("`", "``")}`"
    s"CASE WHEN $q >= 0 THEN $q DIV $w ELSE -(((-$q) + ${w - 1}) DIV $w) END"
  }

  /** EXACT as-of join for hot keys ([[graft.Graft.asofJoin]] with
    * `epochWidth`): the same result as [[asofJoin]], computed as a
    * two-level parallel scan instead of one window task per key — the
    * packing trick ([[Text.packAssignments]]) applied to time.
    *
    * Level 1 runs the union+carry INSIDE `(keys, epoch)` chunks
    * (`epoch = floor(time / epochWidth)`) — the corpus-sized work, fully
    * parallel across epochs, so a hyperactive key spreads over
    * range/epochWidth tasks. Level 2 fixes up left rows whose match
    * precedes their epoch: per (keys, epoch) the LAST right row
    * aggregates to one struct row (map-side combinable), a per-key
    * window over that epoch summary (one row per occupied epoch — the
    * skew-collapse) carries the latest earlier right row forward, and a
    * coalesce takes the in-epoch match when present, the carry
    * otherwise. The most recent right row at or before a left time is
    * either in the left row's own epoch (level 1 finds it) or the last
    * right row of the nearest earlier occupied epoch (the carry) — so
    * the decomposition is exact, not approximate; the spec asserts
    * row-for-row equality with [[asofJoin]] on boundary-straddling
    * fixtures. Time columns must be integral (convert timestamps with
    * `unix_micros` first); ties on (keys, rightTime) must be
    * pre-aggregated for determinism, as in [[asofJoin]]. */
  private[graft] def asofJoinChunked(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      epochWidth: Long): org.apache.spark.sql.DataFrame = {
    require(epochWidth > 0, s"epochWidth must be positive: $epochWidth")
    val leftCols = left.columns.toSeq
    val rightVals = asofValidate(left, right, keys, rightTime)
    Seq(left.schema(leftTime).dataType, right.schema(rightTime).dataType)
      .foreach(t => require(t match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
        case _ => false
      }, s"chunked as-of needs integral time columns, got $t " +
        "(convert timestamps with unix_micros)"))
    val lE = left.withColumn("__epoch", expr(floorDivExpr(leftTime, epochWidth)))
    val rE = dropNullKeys(right, keys, rightTime)
      .withColumn("__epoch", expr(floorDivExpr(rightTime, epochWidth)))
    val chunkKeys = keys :+ "__epoch"
    val inEpoch = asofCore(lE, rE, chunkKeys, leftTime, rightTime, rightVals)
    // one struct row per occupied (keys, epoch): the chunk's last right
    // row (max_by is an ordinary aggregate — no window over raw rows)
    val lastPerEpoch = rE.groupBy(chunkKeys.map(col): _*)
      .agg(max_by(struct(rightVals.map(col): _*), col(rightTime)).as("__rv"))
    // epoch axis = every (keys, epoch) either side occupies, so the
    // carry window sees left-only epochs too; its input is EPOCH
    // SUMMARIES (range/epochWidth rows per key), not raw rows
    val axis = lE.select(chunkKeys.map(col): _*)
      .unionByName(rE.select(chunkKeys.map(col): _*)).distinct()
    val wC = Window.partitionBy(keys.map(col): _*).orderBy(col("__epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = axis.join(lastPerEpoch, chunkKeys, "left")
      .withColumn("__carry", last(col("__rv"), ignoreNulls = true).over(wC))
      .select(chunkKeys.map(col) :+ col("__carry"): _*)
    // both sides arrive hash-partitioned by (keys, epoch); carry is
    // epoch-summary-sized, so AQE broadcasts it at any sane width.
    // LEFT join: a NULL-key left row never equals its own axis row
    // (SQL join equality), and it must survive with NULL values, not
    // vanish — the windowed variant keeps it via the window's
    // NULL-grouping (whose partition holds no right rows post-filter)
    inEpoch.join(carry, chunkKeys, "left")
      .withColumn("__rv", coalesce(col("__rv"), col("__carry")))
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** Hot-key gate for [[asofJoinAuto]]'s measured dispatch: above this
    * many rows (left + right) on a single key, the windowed arm's
    * one-task-per-key sort stops being the right plan and the exact
    * two-level chunked scan takes over. Sized like the scaladoc's
    * "low millions per key" tractability note, with headroom. */
  private[graft] val AsofHotKeyMax: Long = 1L << 21

  /** Per-epoch row target for an auto-chosen width: the hottest key
    * spreads over ~maxRows/target epochs, each a comfortably
    * single-task chunk. */
  private val AsofEpochTargetRows: Long = 1L << 16

  /** The MEASUREMENT behind [[asofJoinAuto]] — the same
    * measured-volume dispatch pattern as [[Graph.hintNodeGrain]] and
    * [[Dedup.connectedComponents]]: the code makes the hot-key call,
    * not a human editing an `epochWidth` constant per corpus.
    *
    * One mergeable hash-agg over both sides (count + time extent per
    * key, then a global max/min — the shuffle carries |keys| summary
    * rows, not data) yields the hottest key's row volume and the time
    * span. Returns `None` (stay windowed) when every key fits one
    * window task or the time columns are not integral (the chunked arm
    * cannot epoch non-numeric time); otherwise the epoch width that
    * puts ~[[AsofEpochTargetRows]] rows of the hottest key in each
    * epoch under a uniform-time assumption (non-uniform corpora still
    * get EXACT results — the decomposition is correctness-independent
    * of the width; width only steers parallelism). Exposed
    * `private[graft]` so SkewSpec pins the dispatch decision itself,
    * not just the (identical) results of the two arms. */
  private[graft] def asofAutoWidth(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      hotKeyMax: Long = AsofHotKeyMax): Option[Long] = {
    val integral = Seq(left.schema(leftTime).dataType,
      right.schema(rightTime).dataType).forall {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    if (!integral) return None
    val both = left
      .select(keys.map(col) :+ col(leftTime).cast(LongType).as("__t"): _*)
      .unionByName(right
        .select(keys.map(col) :+ col(rightTime).cast(LongType).as("__t"): _*))
    val row = both.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("c"), min("__t").as("lo"), max("__t").as("hi"))
      .agg(max("c").as("mx"), min("lo").as("lo"), max("hi").as("hi"))
      .head()
    if (row.isNullAt(0) || row.getLong(0) <= hotKeyMax || row.isNullAt(1)) None
    else {
      val (mx, lo, hi) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val nEpochs = math.max(2L, mx / AsofEpochTargetRows)
      // span/nEpochs, floored at 1 (degenerate: all times equal — one
      // epoch, still exact, the carry level is simply empty)
      Some(math.max(1L, (hi - lo + 1) / nEpochs))
    }
  }

  /** The production default behind [[graft.Graft.asofJoin]] when no
    * explicit `epochWidth` is given: measure, then dispatch — windowed
    * arm below the hot-key gate (the common case; the measurement is
    * one summary-row-sized agg), exact epoch-chunked arm above it.
    * `forward` routes through the time-reversal wrapper so both
    * directions share the dispatch.
    *
    * COST NOTE (deliberate trade): the measurement is an EAGER action
    * at call time — it executes both inputs' upstream pipelines once
    * before the as-of frame exists. The agg itself is summary-sized
    * (|keys| rows shuffled, three columns scanned), but callers whose
    * inputs are expensive unpersisted pipelines pay one extra upstream
    * execution per call — persist/cache hot inputs, or pass an explicit
    * `epochWidth` (`Some(w)` to force the chunked arm, or route via the
    * plain window arm) to skip the measurement entirely. The width
    * cannot ride inside the returned plan lazily because it SHAPES the
    * plan (epoch keys join on it). */
  private[graft] def asofJoinAuto(
      left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      forward: Boolean = false,
      hotKeyMax: Long = AsofHotKeyMax): org.apache.spark.sql.DataFrame = {
    val width = asofAutoWidth(left, right, keys, leftTime, rightTime, hotKeyMax)
    if (forward) asofJoinForward(left, right, keys, leftTime, rightTime, width)
    else width match {
      case Some(w) => asofJoinChunked(left, right, keys, leftTime, rightTime, w)
      case None => asofJoin(left, right, keys, leftTime, rightTime)
    }
  }

  /** Shared DuckDB oracle for the two arbitrary-state sessionization
    * keys (`q_stream_session_state` on flatMapGroupsWithState,
    * `q_stream_session_tws` on transformWithState): gap-islands over
    * (user, ts) with the running double sum replayed as an ORDERED
    * left fold — both engines add left-to-right in (ts, event_id)
    * order, so the doubles are bit-identical. */
  private val sessionStateOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL '30 minutes'
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), islands AS (
      |  SELECT user_id, ts, event_id, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM flagged
      |)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(count(1) AS BIGINT) AS n_events,
      |  round(list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE),
      |      list(value ORDER BY ts, event_id)),
      |    (a, b) -> a + b), 6) AS sum_value
      |FROM islands GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin

  /** Shared DuckDB oracle for both as-of variants. */
  private val asofOracle =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts
      |  FROM events WHERE event_type = 'click'
      |), purchases AS (
      |  SELECT user_id, ts, max(event_id) AS p_id,
      |         arg_max(value, event_id) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
      |)
      |SELECT c.click_id, c.user_id,
      |       p.p_id AS asof_p_id, p.p_value AS asof_p_value
      |FROM clicks c
      |ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.click_id""".stripMargin

  /** Generic ordered-funnel analysis ([[graft.Graft.eventFunnel]];
    * `q_events_funnel`): per-user count of users whose earliest
    * completion of each step comes STRICTLY after their earliest
    * completion of the previous one — and, when `windowSeconds` is
    * set, within that many seconds of it (the conversion-window
    * variant, `q_events_funnel_windowed`: a click counts only inside
    * the attribution window after the first view). One frame per step,
    * each ≤ one row per surviving user; every shuffle keys on
    * `userCol`, so the N stages reuse a single hash partitioning and
    * nothing corpus-sized crosses users. Step labels are zero-padded
    * `<idx+1>_<type>` (`01_view`, `02_click`, …) so the lexicographic
    * output order IS the step order up to 99 steps. */
  private[graft] def eventFunnel(
      events: org.apache.spark.sql.DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts",
      windowSeconds: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    windowSeconds.foreach(w =>
      require(w > 0, s"conversion window must be positive: $w"))
    val ev = events.select(
      col(userCol).as("user_id"), col(typeCol).as("et"), col(tsCol).as("ts"))
    val stepFrames = steps.zipWithIndex
      .foldLeft(List.empty[(String, org.apache.spark.sql.DataFrame)]) {
        case (acc, (et, i)) =>
          val base = ev.filter(col("et") === et)
          val gated = acc.headOption match {
            case None => base
            case Some((_, prev)) =>
              val inOrder = base
                .join(prev.select(col("user_id"), col("t").as("t_prev")),
                  Seq("user_id")).where(col("ts") > col("t_prev"))
              windowSeconds match {
                case Some(w) =>
                  // type-aware bound: TIMESTAMP times advance by an
                  // interval, numeric times by the raw seconds value
                  val bound = ev.schema("ts").dataType match {
                    case _: org.apache.spark.sql.types.TimestampType =>
                      col("t_prev") + expr(s"INTERVAL $w SECOND")
                    case _ => col("t_prev") + lit(w)
                  }
                  inOrder.where(col("ts") <= bound)
                case None => inOrder
              }
          }
          val f = gated.groupBy("user_id").agg(min("ts").as("t"))
          (f"${i + 1}%02d_" + et, f) :: acc
      }.reverse
    stepFrames.map { case (label, f) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(label).as("step"), col("users"))
    }.reduce(_ unionAll _).orderBy("step")
  }

  /** Generic cohort-retention table ([[graft.Graft.retentionCohorts]];
    * `q_events_retention`): bucket activity into `periodDays`-wide
    * periods from `anchor`, cohort each user by their FIRST active
    * period, and count users active at each (cohort, offset). Three
    * user-keyed stages — distinct activity, first-period agg, join-back
    * — then a final aggregate whose output is bounded by
    * periods², not users. The distinct makes the last count a distinct-
    * user count without a second distinct. */
  private[graft] def retentionCohorts(
      events: org.apache.spark.sql.DataFrame, anchor: String,
      periodDays: Int = 7, userCol: String = "user_id",
      tsCol: String = "ts"): org.apache.spark.sql.DataFrame = {
    require(periodDays > 0, s"periodDays must be positive: $periodDays")
    // an unparseable anchor would cast to NULL and silently collapse the
    // whole report into one (null, null, n) row — reject it driver-side
    require(scala.util.Try(java.time.LocalDate.parse(anchor)).isSuccess,
      s"anchor must be an ISO date (yyyy-MM-dd): '$anchor'")
    val act = events.select(col(userCol).as("user_id"),
        floor(datediff(col(tsCol).cast("date"), lit(anchor).cast("date"))
          / lit(periodDays.toDouble)).cast(LongType).as("wk"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    act.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** Seasonal-baseline anomaly report ([[graft.Graft.seasonalOutliers]]):
    * rows whose `value` exceeds mean + z·σ for their (`key`,
    * hour-of-day) bucket. Moments from exact DECIMAL(38,6) Σv/Σv² (one
    * map-side-combined pass), σ = sqrt(max(var, 0)); the profile is
    * ≤ |keys|×24 rows and broadcasts back — one corpus pass + one
    * broadcast at any scale. */
  private[graft] def seasonalOutliers(events: org.apache.spark.sql.DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      z: Double): org.apache.spark.sql.DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val ev = events.withColumn("__hr", hour(col(tsCol)))
    val prof = ev.groupBy(col(keyCol), col("__hr"))
      .agg(sum(col(valueCol).cast(D386)).as("sv"),
        sum((col(valueCol) * col(valueCol)).cast(D386)).as("svv"),
        count(lit(1)).as("cnt"))
      .select(col(keyCol).as("__pk"), col("__hr").as("__ph"),
        (col("sv").cast(DoubleType) / col("cnt")).as("__mean"),
        sqrt(greatest(
          col("svv").cast(DoubleType) / col("cnt") -
            (col("sv").cast(DoubleType) / col("cnt")) *
            (col("sv").cast(DoubleType) / col("cnt")),
          lit(0.0))).as("__sd"))
    ev.join(broadcast(prof),
        col(keyCol) === col("__pk") && col("__hr") === col("__ph"))
      .filter(col(valueCol) > col("__mean") + lit(z) * col("__sd"))
      .withColumnRenamed("__hr", "hr")
      .drop("__pk", "__ph", "__mean", "__sd")
  }

  val defs: Seq[QueryDef] = Seq(

    // JSON / VARIANT path extraction (events.props is a JSON object string
    // — the arrival shape of Snowflake VARIANT through Arrow, SURVEY §1.1)
    QueryDef("q_scalar_json",
      (s, d) => Tables.table(s, d, "events").select(
          col("event_id"),
          col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type,
             |  CAST(json_extract(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Snowflake LATERAL FLATTEN's relational shape: a JSON object
    // column explodes to one (key, value) row per entry —
    // schema-on-read without a fixed path list (q_scalar_json is the
    // fixed-path sibling). Row-local explode, zero shuffle; DuckDB's
    // json_each is the oracle twin.
    QueryDef("q_json_flatten",
      (s, d) => Tables.table(s, d, "events")
        .select(col("event_id"),
          explode(from_json(col("props"),
            MapType(StringType, LongType))))
        .orderBy("event_id", "key"),
      Some("""SELECT event_id, k AS key,
             |  CAST(json_extract(props, '$.' || k) AS BIGINT) AS value
             |FROM (SELECT event_id, props,
             |        unnest(json_keys(props)) AS k FROM events)
             |ORDER BY event_id, key""".stripMargin)),

    // AS-OF join (Snowflake ASOF JOIN): for every click, the most recent
    // purchase by the same user at or before the click. No Spark built-in;
    // the scale-safe pattern is union + last(..., ignoreNulls) over a
    // window — ONE shuffle on user_id, no range explosion, no O(n²)
    // (SURVEY §2 q_join_asof). DuckDB's native ASOF JOIN is the oracle.
    QueryDef("q_join_asof",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = purchasesDeduped(ev)
        asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("p_id").as("asof_p_id"), col("p_value").as("asof_p_value"))
          .orderBy("click_id")
      },
      Some(asofOracle)),

    // The same as-of semantics through the SQL-TEXT front door
    // ([[graft.SqlText.sql]]): Snowflake's `ASOF JOIN …
    // MATCH_CONDITION(l.ts >= r.ts) ON l.k = r.k` syntax — what the
    // reference's query-string-first caller (core.py:143) would type —
    // parsed and rewritten onto the same union+window engine operator
    // as q_join_asof. Same DuckDB ASOF oracle: two entry paths, one
    // truth.
    QueryDef("q_sql_asof",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
          .createOrReplaceTempView("sql_clicks")
        purchasesDeduped(ev).createOrReplaceTempView("sql_purchases")
        graft.SqlText.sql(s,
          """SELECT c.event_id AS click_id, c.user_id,
            |  p.p_id AS asof_p_id, p.p_value AS asof_p_value
            |FROM sql_clicks c ASOF JOIN sql_purchases p
            |MATCH_CONDITION(c.ts >= p.ts)
            |ON c.user_id = p.user_id
            |ORDER BY click_id""".stripMargin)
      },
      Some(asofOracle)),

    // The same as-of semantics by a second physical strategy: when the
    // right side is small, broadcast it and reduce candidate pairs with
    // max_by instead of sorting a union — no shuffle of the left side at
    // all. Same DuckDB ASOF oracle as q_join_asof: two plans, one truth.
    QueryDef("q_join_asof_broadcast",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        val purchases = purchasesDeduped(ev)
          .select(col("user_id"), col("ts").as("p_ts"), col("p_id"), col("p_value"))
        clicks
          .join(broadcast(purchases),
            clicks("user_id") === purchases("user_id") && col("p_ts") <= col("ts"),
            "left")
          .groupBy(col("click_id"), clicks("user_id"))
          .agg(
            max_by(col("p_id"), col("p_ts")).as("asof_p_id"),
            max_by(col("p_value"), col("p_ts")).as("asof_p_value"))
          .orderBy("click_id")
      },
      Some(asofOracle)),

    // The same as-of semantics by the THIRD physical strategy — the
    // hot-key scale-out ([[asofJoinChunked]]): in-epoch union+carry per
    // (user, hour-of-unix-micros) chunk plus the per-epoch-summary carry
    // window. Same DuckDB ASOF oracle as both siblings: three plans, one
    // truth — a decomposition bug (boundary straddle, empty epochs,
    // carry ordering) breaks the hash here even if the specs' synthetic
    // fixtures miss it.
    QueryDef("q_join_asof_chunked",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"))
        val purchases = purchasesDeduped(ev)
          .withColumn("rt_us", unix_micros(col("ts"))).drop("ts")
        asofJoinChunked(clicks, purchases, Seq("user_id"), "t_us", "rt_us",
            epochWidth = 3600L * 1000000L)
          .select(col("event_id").as("click_id"), col("user_id"),
            col("p_id").as("asof_p_id"), col("p_value").as("asof_p_value"))
          .orderBy("click_id")
      },
      Some(asofOracle)),

    // FORWARD as-of: each click's FIRST purchase at-or-after it by the
    // same user — the conversion/next-event query every funnel pipeline
    // runs. Runs through Temporal.asofJoinForward (time-reversal reuse
    // of the backward join — fourth plan, its own DuckDB forward-ASOF
    // truth), so NULL-key/NULL-time semantics and the epochWidth
    // scale-out are inherited rather than re-implemented; the GraftSpec
    // property drives the forward+chunked combination on random data.
    QueryDef("q_join_asof_forward",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"))
        val purchases = purchasesDeduped(ev)
          .withColumn("rt_us", unix_micros(col("ts"))).drop("ts")
        asofJoinForward(clicks, purchases, Seq("user_id"), "t_us", "rt_us")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("p_id").as("next_p_id"), col("p_value").as("next_p_value"))
          .orderBy("click_id")
      },
      Some("""WITH clicks AS (
             |  SELECT event_id AS click_id, user_id, ts
             |  FROM events WHERE event_type = 'click'
             |), purchases AS (
             |  SELECT user_id, ts, max(event_id) AS p_id,
             |         arg_max(value, event_id) AS p_value
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
             |)
             |SELECT c.click_id, c.user_id,
             |       p.p_id AS next_p_id, p.p_value AS next_p_value
             |FROM clicks c
             |ASOF LEFT JOIN purchases p
             |  ON c.user_id = p.user_id AND c.ts <= p.ts
             |ORDER BY c.click_id""".stripMargin)),

    // ------------------------------- time-interval RANGE window frame
    // the sliding "last hour per key" aggregate as a RANGE frame over
    // event time — the VALUE-based frame (all rows within 1h of the
    // current row's time), not the ROWS-based count frame
    // q_window_running_sum pins. Time ties need no tie-break: a range
    // frame includes every tied row by definition, identically on both
    // engines. The frame bound is integer µs (unix_micros), the sum is
    // exact decimal → DOUBLE, so ordered accumulation cannot drift.
    // One user-keyed window — same single-exchange contract as every
    // window key; at 100 TB the per-user sort is key-local.
    QueryDef("q_window_time_range",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t_us")
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.table(s, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            sum(col("value").cast(D386)).over(w).cast(DoubleType))
          .select("event_id", "user_id", "n_1h", "sum_1h")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(count(1) OVER w AS BIGINT) AS n_1h,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR)
             |    AS DOUBLE) AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // NEAREST as-of: each click's closest purchase in EITHER direction,
    // ties to the earlier (backward) match — the sensor-alignment
    // semantics (pandas merge_asof direction='nearest'). Composed from
    // the two proven primitives instead of a fifth core: run backward
    // AND forward (each carrying the matched purchase time as a value
    // column), join the two one-row-per-click frames on the click id,
    // and pick per row by |Δt| — a row-local integer compare. Cost is
    // exactly backward + forward + one click-grain join; inherits every
    // NULL/tie hardening from the primitives. The DuckDB twin replays
    // the same pick over its two native ASOF joins.
    QueryDef("q_join_asof_nearest",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"))
        val purchases = purchasesDeduped(ev)
          .withColumn("rt_us", unix_micros(col("ts"))).drop("ts")
          .withColumn("p_t", col("rt_us"))
        val back = asofJoin(clicks, purchases, Seq("user_id"), "t_us", "rt_us")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("t_us"), col("p_id").as("b_id"), (col("t_us") - col("p_t")).as("b_d"))
        val fwd = asofJoinForward(clicks, purchases, Seq("user_id"), "t_us", "rt_us")
          .select(col("event_id").as("f_click_id"),
            col("p_id").as("f_id"), (col("p_t") - col("t_us")).as("f_d"))
        val takeBack = col("f_d").isNull ||
          (col("b_d").isNotNull && col("b_d") <= col("f_d"))
        back.join(fwd, col("click_id") === col("f_click_id"))
          .select(col("click_id"), col("user_id"),
            when(takeBack, col("b_id")).otherwise(col("f_id")).as("near_p_id"),
            when(takeBack, col("b_d")).otherwise(col("f_d")).as("near_d_us"))
          .orderBy("click_id")
      },
      Some("""WITH clicks AS (
             |  SELECT event_id AS click_id, user_id, ts
             |  FROM events WHERE event_type = 'click'
             |), purchases AS (
             |  SELECT user_id, ts, max(event_id) AS p_id,
             |         arg_max(value, event_id) AS p_value
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
             |), b AS (
             |  SELECT c.click_id, c.user_id, p.p_id AS b_id,
             |    epoch_us(c.ts) - epoch_us(p.ts) AS b_d
             |  FROM clicks c ASOF LEFT JOIN purchases p
             |    ON c.user_id = p.user_id AND c.ts >= p.ts
             |), f AS (
             |  SELECT c.click_id, p.p_id AS f_id,
             |    epoch_us(p.ts) - epoch_us(c.ts) AS f_d
             |  FROM clicks c ASOF LEFT JOIN purchases p
             |    ON c.user_id = p.user_id AND c.ts <= p.ts
             |)
             |SELECT b.click_id, b.user_id,
             |  CASE WHEN f.f_d IS NULL OR (b.b_d IS NOT NULL AND b.b_d <= f.f_d)
             |       THEN b.b_id ELSE f.f_id END AS near_p_id,
             |  CASE WHEN f.f_d IS NULL OR (b.b_d IS NOT NULL AND b.b_d <= f.f_d)
             |       THEN b.b_d ELSE f.f_d END AS near_d_us
             |FROM b JOIN f ON b.click_id = f.click_id
             |ORDER BY b.click_id""".stripMargin)),

    // tumbling window (streaming: groupBy(window($"ts","1 hour"))) — the
    // epoch-aligned 1h window start equals date_trunc('hour')
    // ---------------------------------------- ordered funnel analysis
    // the product-analytics sequential-pattern shape: how many users did
    // view → click → purchase IN ORDER (each step strictly after the
    // user's earliest completion of the previous one). Runs through the
    // generic [[eventFunnel]] ([[graft.Graft.eventFunnel]]): N key-local
    // passes — min-per-user of step 1, then each later step filters on
    // the prior step's time and re-aggregates — every shuffle is on
    // user_id, so at 100 TB the stages reuse one hash partitioning
    // (no corpus-wide window, no cross-user data movement), and each
    // stage's output is ≤ one row per surviving user. Strict `>` on both
    // engines; counts (not timestamps) are the output, so the ns-vs-µs
    // parquet precision difference never reaches the hash compare.
    QueryDef("q_events_funnel",
      (s, d) => eventFunnel(Tables.table(s, d, "events"),
        Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id
             |), s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
             |  WHERE e.event_type = 'click' GROUP BY e.user_id
             |), s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
             |)
             |SELECT '01_view' AS step, count(1) AS users FROM s1
             |UNION ALL SELECT '02_click', count(1) FROM s2
             |UNION ALL SELECT '03_purchase', count(1) FROM s3
             |ORDER BY step""".stripMargin)),

    // ------------------------------- funnel with a conversion window
    // the ATTRIBUTION-window funnel: each step counts only within 72
    // hours of the user's previous-step time — the form every growth
    // dashboard actually runs (an unbounded funnel credits conversions
    // weeks later). Same per-step key-local plan as q_events_funnel
    // (one reused user_id partitioning, ≤ one row per user per stage);
    // the window is a pure timestamp comparison — exact µs on both
    // engines. sf0.01 decay: 150 → 115 → 81, a real funnel, not a
    // degenerate all-pass.
    QueryDef("q_events_funnel_windowed",
      (s, d) => eventFunnel(Tables.table(s, d, "events"),
        Seq("view", "click", "purchase"),
        windowSeconds = Some(72L * 3600)),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id
             |), s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
             |    AND e.ts <= s1.t1 + INTERVAL 259200 SECOND
             |  WHERE e.event_type = 'click' GROUP BY e.user_id
             |), s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
             |    AND e.ts <= s2.t2 + INTERVAL 259200 SECOND
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
             |)
             |SELECT '01_view' AS step, count(1) AS users FROM s1
             |UNION ALL SELECT '02_click', count(1) FROM s2
             |UNION ALL SELECT '03_purchase', count(1) FROM s3
             |ORDER BY step""".stripMargin)),

    // ---------------------------------------- cohort retention
    // the "do users come back" report over weekly periods: users
    // cohorted by first active week, counted at each (cohort, offset).
    // Everything is exact integer arithmetic on day counts (the µs-vs-ns
    // parquet precision difference dies at the CAST to DATE), and the
    // final output is bounded by weeks² whatever the event volume.
    // ------------------------------------- DAU / WAU stickiness
    // the product-health staple: per day, the distinct actives that day
    // (DAU), the distinct actives over the trailing 7 days (WAU), and
    // their ratio. Engine form: ONE distinct (user, day) reduction of
    // the fact, then the 7-day window is a bounded self-replication of
    // that day-grain frame (each active day contributes to ≤7 report
    // days via a row-local explode — day-grain × 7, never fact-sized),
    // so WAU is an ordinary count(DISTINCT) per report day. Integer
    // counts; the single ratio division is double. At 100 TB the
    // (user, day) frame is the only fact-sized reduction, and the
    // documented alternative for very long windows is mergeable HLL
    // sketches per day (q_agg_approx_distinct's machinery).
    // MEASURED BOUND (sf0.1): 100k events → 40,083 distinct (user,
    // day) pairs → 280,581 explode rows (0.29 s min-of-3 solo). The
    // 7× rides AFTER the distinct, so the explode is 7·|user-days|,
    // never 7·|events| — it SHRINKS relative to the fact as per-
    // user-day density grows (crossover at 7 events/user/day; a
    // 100 TB clickstream at ~100 events/user/day explodes to ~7% of
    // the fact). The window length W is the only multiplier: W=7 here,
    // and the HLL path above replaces the explode when W gets long.
    QueryDef("q_events_dau_wau",
      (s, d) => {
        val ud = Tables.table(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val contrib = ud.select(col("user_id"), col("day"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .select(col("user_id"), date_add(col("day"), col("off")).as("rday"))
        val dau = ud.groupBy(col("day").as("rday"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val wau = contrib.groupBy("rday")
          .agg(countDistinct(col("user_id")).as("wau"))
        // report only days with actual activity (the dau side), so the
        // explode's trailing phantom days never appear
        dau.join(wau, Seq("rday"))
          // emit the day as midnight TIMESTAMP: the driver compare
          // equates tz-aware/naive timestamps but not date-vs-timestamp
          .select(col("rday").cast("timestamp").as("rday"), col("dau"), col("wau"),
            (col("dau").cast(DoubleType) / col("wau")).as("stickiness"))
          .orderBy("rday")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
             |), contrib AS (
             |  SELECT user_id, day + CAST(o.off AS INT) AS rday
             |  FROM ud, (SELECT unnest(generate_series(0, 6)) AS off) o
             |), dau AS (
             |  SELECT day AS rday, CAST(count(DISTINCT user_id) AS BIGINT)
             |    AS dau
             |  FROM ud GROUP BY 1
             |), wau AS (
             |  SELECT rday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |  FROM contrib GROUP BY 1
             |)
             |SELECT rday, dau, wau,
             |  CAST(dau AS DOUBLE) / wau AS stickiness
             |FROM dau JOIN wau USING (rday)
             |ORDER BY rday""".stripMargin)),

    // ------------------------------------------ monthly order backlog
    // the event-sourcing BALANCE report: per month, how many orders are
    // open — placed at or before month end, last line not yet shipped.
    // Engine form: orders reduce to (placed_month, completed_month) in
    // one pass (completion = month of the LAST line's ship date — one
    // orderkey-grain max), then each month's balance is the difference
    // of two running totals over the tiny month-grain frame: cumulative
    // placed − cumulative completed. No interval join, no per-month
    // rescan — the shape that turns "state at every point in time" into
    // two cumsum windows over a bounded axis. All integer counts.
    QueryDef("q_orders_backlog",
      (s, d) => {
        val li = Tables.table(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(max(col("l_shipdate")).as("done_ts"))
        val o = Tables.table(s, d, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"), "inner")
          .select(date_trunc("month", col("o_orderdate")).as("pm"),
            date_trunc("month", col("done_ts")).as("cm"))
        val placed = o.groupBy(col("pm").as("m")).agg(count(lit(1)).as("n_placed"))
        val done = o.groupBy(col("cm").as("m")).agg(count(lit(1)).as("n_done"))
        // DELIBERATELY unpartitioned: the cumsum input is the
        // month-grain frame (one row per month in the data's range —
        // dozens, not billions, at ANY corpus scale), the same bounded
        // skew-collapse axis as selectTokenBudget's bucket-summary
        // window. The fact-sized work all happened in the aggs above.
        val w = Window.orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        placed.join(done, Seq("m"), "full_outer")
          .select(col("m"),
            coalesce(col("n_placed"), lit(0L)).as("n_placed"),
            coalesce(col("n_done"), lit(0L)).as("n_done"))
          .withColumn("backlog",
            sum(col("n_placed")).over(w) - sum(col("n_done")).over(w))
          .orderBy("m")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, max(l_shipdate) AS done_ts
             |  FROM lineitem GROUP BY 1
             |), o AS (
             |  SELECT date_trunc('month', o_orderdate) AS pm,
             |    date_trunc('month', done_ts) AS cm
             |  FROM orders JOIN li ON o_orderkey = l_orderkey
             |), placed AS (
             |  SELECT pm AS m, CAST(count(1) AS BIGINT) AS n_placed
             |  FROM o GROUP BY 1
             |), done AS (
             |  SELECT cm AS m, CAST(count(1) AS BIGINT) AS n_done
             |  FROM o GROUP BY 1
             |)
             |SELECT m, coalesce(n_placed, 0) AS n_placed,
             |  coalesce(n_done, 0) AS n_done,
             |  CAST(sum(coalesce(n_placed, 0)) OVER w
             |    - sum(coalesce(n_done, 0)) OVER w AS BIGINT) AS backlog
             |FROM placed FULL OUTER JOIN done USING (m)
             |WINDOW w AS (ORDER BY m
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY m""".stripMargin)),

    // ------------------------------------------- cohort LTV curves
    // cumulative purchase value per (cohort week, week offset) — the
    // LTV curve next to q_events_retention's user counts: users cohort
    // by FIRST activity week (any event type), value accrues from
    // purchases only, and the running total per cohort answers "how
    // much has week-N's cohort spent by offset k". Plan: one distinct
    // (user, week) reduction + first-week agg (both user-keyed, reused
    // partitioning), purchase values reduce to the (cohort, offset)
    // grain in ONE exact-decimal agg, and the cumsum window runs over
    // that weeks²-bounded frame — never the fact (the q_orders_backlog
    // skew-collapse shape). Values sum as DECIMAL(38,6) (identical
    // rounding both engines), DOUBLE only on the way out.
    QueryDef("q_events_cohort_ltv",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val wkOf = floor(datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")) / lit(7.0)).cast(LongType)
        val first = ev.select(col("user_id"), wkOf.as("wk")).distinct()
          .groupBy("user_id").agg(min("wk").as("cohort_wk"))
        val cells = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), wkOf.as("wk"),
            col("value").cast(D386).as("v"))
          .join(first, Seq("user_id"))
          .groupBy(col("cohort_wk"),
            (col("wk") - col("cohort_wk")).as("week_offset"))
          .agg(sum(col("v")).as("val_sum"), count(lit(1)).as("n_purch"))
        val w = Window.partitionBy("cohort_wk").orderBy("week_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("cum_value",
            sum(col("val_sum")).over(w).cast(DoubleType))
          .select(col("cohort_wk"), col("week_offset"), col("n_purch"),
            col("cum_value"))
          .orderBy("cohort_wk", "week_offset")
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    CAST(floor(date_diff('day', DATE '2024-01-01',
             |      CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
             |  FROM events
             |), fw AS (
             |  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1
             |), cells AS (
             |  SELECT cohort_wk,
             |    CAST(floor(date_diff('day', DATE '2024-01-01',
             |      CAST(ts AS DATE)) / 7.0) AS BIGINT) - cohort_wk
             |      AS week_offset,
             |    sum(CAST(value AS DECIMAL(38,6))) AS val_sum,
             |    CAST(count(1) AS BIGINT) AS n_purch
             |  FROM events e JOIN fw ON e.user_id = fw.user_id
             |  WHERE event_type = 'purchase'
             |  GROUP BY 1, 2
             |)
             |SELECT cohort_wk, week_offset, n_purch,
             |  CAST(sum(val_sum) OVER (PARTITION BY cohort_wk
             |    ORDER BY week_offset
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) AS cum_value
             |FROM cells
             |ORDER BY cohort_wk, week_offset""".stripMargin)),

    QueryDef("q_events_retention",
      (s, d) => retentionCohorts(Tables.table(s, d, "events"), "2024-01-01"),
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    CAST(floor(date_diff('day', DATE '2024-01-01',
             |      CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
             |  FROM events
             |), fw AS (
             |  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
             |)
             |SELECT f.cohort_wk, a.wk - f.cohort_wk AS week_offset,
             |  count(1) AS users
             |FROM act a JOIN fw f ON a.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin)),

    QueryDef("q_stream_tumbling",
      (s, d) => Tables.table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  CAST(count(1) AS BIGINT) AS n,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    // sliding window (1h window, 15min slide): every event lands in 4
    // overlapping windows; oracle replays that expansion with a 0..3 series
    QueryDef("q_stream_sliding",
      (s, d) => Tables.table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
        .select(col("w.start").as("window_start"), col("n"), col("sum_value"))
        .orderBy("window_start"),
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts)
             |         - k * INTERVAL '15 minutes' AS window_start,
             |  CAST(count(1) AS BIGINT) AS n,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS sum_value
             |FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
             |GROUP BY 1 ORDER BY window_start""".stripMargin)),

    // session window (30-min inactivity gap per user). Streaming form:
    // groupBy(session_window($"ts","30 minutes"), $"user_id"); the batch
    // oracle is the classic gaps-and-islands rewrite.
    QueryDef("q_stream_session",
      (s, d) => Tables.table(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |              >= INTERVAL '30 minutes'
             |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |), islands AS (
             |  SELECT user_id, ts, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM flagged
             |)
             |SELECT user_id, min(ts) AS session_start,
             |  CAST(count(1) AS BIGINT) AS n,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS sum_value
             |FROM islands GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin)),

    // stream-stream interval join (batch analogue of
    // streaming.Streams.intervalJoin, same code path — withWatermark is a
    // no-op on batch): clicks ⋈ same-user purchases within 30 minutes
    // AFTER the click. At scale this shuffles both sides by user_id once;
    // in streaming mode the two-sided time bound lets Spark GC join state.
    QueryDef("q_stream_join",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
            col("ts").as("p_ts"), col("value"))
        graft.streaming.Streams.intervalJoin(clicks, purchases)
          .select(col("click_id"), col("purchase_id"), col("user_id"), col("value"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |  c.user_id, p.value
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // LEFT OUTER stream-stream interval join: every click survives, the
    // purchase columns NULL where no same-user purchase landed in the
    // window. In streaming mode the unmatched row emits only when the
    // watermark proves no match can still arrive (state-GC'd outer
    // join — StreamingSpec drives the real stream); in batch mode the
    // same code is a plain left join, which IS the oracle. The
    // conversion-rate denominator query: inner joins silently drop
    // exactly the non-converting clicks an analyst is counting.
    QueryDef("q_stream_join_outer",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
            col("ts").as("p_ts"), col("value"))
        graft.streaming.Streams.intervalJoin(clicks, purchases,
            joinType = "left_outer")
          .select(col("click_id"), col("purchase_id"), col("user_id"), col("value"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |  c.user_id, p.value
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // the chunked interval join against the SAME truth as q_stream_join —
    // the as-of pattern (three plans, one oracle) applied to the last
    // pair-producing join: the equi-key becomes (user, 30-min time chunk)
    // with each click replicated to the ≤2 chunks its window touches, so
    // a hot user's pairs spread over many partitions. Identical rows by
    // construction (SkewSpec proves it on the 160k-pair hot-user
    // fixture); the oracle is the SAME SQL as q_stream_join's.
    QueryDef("q_stream_join_chunked",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
            col("ts").as("p_ts"), col("value"))
        graft.streaming.Streams.intervalJoinChunked(clicks, purchases,
            windowSeconds = 1800L, chunkSeconds = 1800L)
          .select(col("click_id"), col("purchase_id"), col("user_id"), col("value"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |  c.user_id, p.value
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // time-to-convert report: the percentile distribution of the
    // click→next-purchase lag — the composition every funnel owner runs
    // after the as-of join (CONSUMES asofJoinForward, so the forward
    // match semantics are inherited, not re-implemented; the matched
    // purchase TIME rides along as an ordinary value column copy since
    // the join drops its time key). Interpolated percentiles use the
    // same (1−d)·lo + d·hi definition on both engines
    // (q_agg_percentile precedent); the µs lag is integer-exact and the
    // /60e6 minutes division is the identical double op both sides.
    // One as-of join (user-keyed) + one global 1-row percentile agg.
    // ------------------------------------------- time-series gap fill
    // calendar densify + forward fill: the reporting primitive for
    // sparse event streams — every (user, day) cell exists, missing
    // days carry the last observed daily total forward (days before a
    // user's first observation stay NULL; the oracle agrees). Engine
    // form: per-user daily sums (ONE user/day shuffle), the calendar
    // from a 1-row min/max agg exploded into a date sequence (bounded
    // by the RANGE, not the data — 100 years is 36.5k rows, broadcast
    // everywhere), the user×day grid via broadcast cross join (the
    // deliberate, bounded kind), a left join back, and last-ignoreNulls
    // over a per-user window — partitioned by user_id, never global.
    // The user cut (user_id % 10 = 0) bounds the demo grid; the %-hash
    // is the same reproducible admission used by the sampling keys.
    // Daily sums stay exact DECIMAL through the fill; DOUBLE only on
    // the way out.
    // MEASURED BOUND (sf0.1): 1,500 users × 30 calendar days →
    // 45,000 grid cells vs 100k raw events (0.29 s min-of-3 solo).
    // The grid is |users| × |span days| — linear in users, and the
    // span multiplier is CALENDAR time, not event volume: a 10-year
    // daily grid is 3,652 cells/user regardless of corpus size. The
    // grid only exceeds the (user, day) aggregate by the gap factor
    // (span days ÷ active days per user) — large exactly for the
    // sparse streams densification exists for; for dense streams the
    // left join back is the dominant (and shuffle-aligned) cost.
    QueryDef("q_timeseries_gapfill",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
          .filter(col("user_id") % 10 === 0)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast(DecimalType(38, 6))).as("v"))
        val days = ev.agg(min("day").as("lo"), max("day").as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val grid = ev.select("user_id").distinct().crossJoin(broadcast(days))
        grid.join(ev, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day").cast("timestamp").as("day"),
            last(col("v"), ignoreNulls = true)
              .over(Window.partitionBy("user_id").orderBy("day")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast(DoubleType).as("v_filled"))
          .orderBy("user_id", "day")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    sum(CAST(value AS DECIMAL(38,6))) AS v
             |  FROM events WHERE user_id % 10 = 0
             |  GROUP BY 1, 2
             |), b AS (
             |  SELECT min(day) AS lo, max(day) AS hi FROM ev
             |), days AS (
             |  SELECT CAST(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM b
             |), grid AS (
             |  SELECT u.user_id, d.day
             |  FROM (SELECT DISTINCT user_id FROM ev) u, days d
             |)
             |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
             |  CAST(last_value(ev.v IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) AS v_filled
             |FROM grid g LEFT JOIN ev
             |  ON ev.user_id = g.user_id AND ev.day = g.day
             |ORDER BY g.user_id, g.day""".stripMargin)),

    QueryDef("q_events_conversion_lag",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"))
        val purchases = purchasesDeduped(ev)
          .withColumn("rt_us", unix_micros(col("ts"))).drop("ts")
          .withColumn("p_t_us", col("rt_us"))
        val lags = asofJoinForward(clicks, purchases,
            Seq("user_id"), "t_us", "rt_us")
          .filter(col("p_id").isNotNull)
          .select(((col("p_t_us") - col("t_us")) / lit(60000000.0))
            .as("lag_min"))
        // quartiles via the histogram+rank-scan form (no whole-column
        // Percentile buffer); n_converted rides along as the
        // histogram's count total — still one pass over the asof join
        graft.ops.Relational.histQuantiles(lags, "lag_min", Nil,
          Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"),
          totalAs = Some("n_converted"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts
             |  FROM events WHERE event_type = 'click'
             |), purchases AS (
             |  SELECT user_id, ts, max(event_id) AS p_id
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY user_id, ts
             |), m AS (
             |  SELECT (epoch_us(p.ts) - epoch_us(c.ts)) / 60000000.0
             |    AS lag_min
             |  FROM clicks c
             |  ASOF JOIN purchases p
             |    ON c.user_id = p.user_id AND c.ts <= p.ts
             |)
             |SELECT CAST(count(1) AS BIGINT) AS n_converted,
             |  round(quantile_cont(lag_min, 0.25), 6) AS p25,
             |  round(quantile_cont(lag_min, 0.5), 6) AS p50,
             |  round(quantile_cont(lag_min, 0.75), 6) AS p75
             |FROM m""".stripMargin)),

    // gap-session via ARBITRARY STATE (flatMapGroupsWithState), the
    // custom-semantics sibling of q_stream_session's built-in
    // session_window: the same 30-minute-gap sessions produced by the
    // Streams.sessionizeMicros state machine — the escape hatch a user
    // reaches for when gaps become value-dependent. Exactness contract:
    // the state machine folds each user's events in (µs, event_id)
    // order, so the running double sum is a deterministic left fold that
    // the oracle replays with an ordered list_reduce (0.0 + v1 ≡ v1 in
    // IEEE, then identical left-to-right adds); session boundaries
    // compare raw microseconds (strict `< gap` stays, `>= gap` splits —
    // the same convention as the islands SQL). At scale this is one
    // shuffle by user_id with O(1) state per key; in true streaming the
    // same code GC's state on quiet users (StreamingSpec drives it over
    // MemoryStream micro-batches).
    QueryDef("q_stream_session_state",
      (s, d) => {
        import s.implicits._
        val ev = Tables.table(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"), col("value"))
          .as[(Long, Long, Long, Double)]
        graft.streaming.Streams.sessionizeMicros(ev).toDF()
          .select(col("user_id"),
            expr("timestamp_micros(start_us)").as("session_start"),
            expr("timestamp_micros(end_us)").as("session_end"),
            col("n_events"), round(col("sum_value"), 6).as("sum_value"))
          .orderBy("user_id", "session_start")
      },
      Some(sessionStateOracle)),

    // the SAME state machine on the MODERN state API: transformWithState
    // (Spark 4's successor to flatMapGroupsWithState — explicit state
    // handles, composable variables, timer/TTL support) executes the
    // identical µs-exact fold as a batch-mode StatefulProcessor. One
    // oracle string pins both arms to the same answer; StreamingSpec
    // additionally pins tws ≡ fMGWS row-for-row AND drives tws over
    // MemoryStream micro-batches where the open session stitches across
    // the batch boundary (the capability fMGWS's batch-contract twin
    // does not exercise).
    QueryDef("q_stream_session_tws",
      (s, d) => {
        import s.implicits._
        val ev = Tables.table(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
            col("event_id"), col("value"))
          .as[(Long, Long, Long, Double)]
        graft.streaming.Streams.sessionizeMicrosTws(ev).toDF()
          .select(col("user_id"),
            expr("timestamp_micros(start_us)").as("session_start"),
            expr("timestamp_micros(end_us)").as("session_end"),
            col("n_events"), round(col("sum_value"), 6).as("sum_value"))
          .orderBy("user_id", "session_start")
      },
      Some(sessionStateOracle)),

    // watermark / late-data batch analogue: keep events within 1 day of the
    // observed max ts. The scalar max is broadcast — no single-partition
    // window, no second scan of a sorted stream.
    QueryDef("q_stream_late_filter",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val maxTs = ev.agg(max("ts").as("max_ts"))
        ev.join(broadcast(maxTs))
          .filter(col("ts") >= col("max_ts") - expr("INTERVAL '1' DAY"))
          .select("event_id", "ts", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, ts, event_type, value FROM events
             |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '1' DAY
             |ORDER BY event_id""".stripMargin)),

    // at-least-once replay dedup — the batch analogue of
    // streaming.Streams.dedupWithinWatermark (SAME code path; the
    // watermark is a no-op in batch and the stateful dedup degrades to
    // an ordinary hash dedup on event_id). The input simulates a
    // replayed delivery — the events feed unioned with itself, every
    // row delivered twice — and the dedup must restore exactly the
    // original table, which IS the oracle. Deterministic even though
    // dropDuplicates keeps "an arbitrary" row: replays are full-row
    // identical, so whichever copy survives, the bytes are the same.
    // PRECONDITION: event_id is unique in the fixture (FIXTURES.md
    // declares it; duplicate source ids would make the surviving row
    // genuinely arbitrary and the oracle unmatchable).
    // At scale: one hash shuffle on event_id; in streaming mode the
    // per-key state is GC'd by the watermark instead of growing with
    // the stream (StreamingSpec drives the true-streaming path).
    QueryDef("q_stream_dedup",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
          .select("event_id", "ts", "user_id", "event_type", "value")
        graft.streaming.Streams.dedupWithinWatermark(ev.unionAll(ev))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, ts, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---------------------------------- behavioral transition matrix
    // first-order Markov transitions between consecutive events of the
    // SAME user — the clickstream path-mining shape (what follows what).
    // Engine form: one window lag per user ordered by (ts, event_id) —
    // the unique id breaks timestamp ties so "previous event" is a total
    // order on BOTH engines — then a tiny (|types|²-bounded) count
    // aggregate. At 100 TB the window shuffles once on user_id and each
    // user's history sorts locally (users are small; a pathological
    // mega-user would need the session-chunking treatment of
    // q_pack_sequences_chunked, documented not needed for this fixture).
    // Output is pure integer counts — nothing to drift.
    QueryDef("q_events_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.table(s, d, "events")
          .select("user_id", "ts", "event_id", "event_type")
          .withColumn("from_type", lag("event_type", 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS from_type
             |  FROM events
             |)
             |SELECT from_type, event_type AS to_type,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM seq WHERE from_type IS NOT NULL
             |GROUP BY 1, 2
             |ORDER BY from_type, to_type""".stripMargin)),

    // ------------------------------------ seasonal-baseline outliers
    // anomaly detection against a SEASONAL profile: an event is
    // anomalous if its value exceeds mean + 3σ for its (event_type,
    // hour-of-day) bucket — the time-of-day-aware twin of
    // q_profile_outliers' global z-score. Determinism contract: the
    // bucket moments come from exact DECIMAL(38,6) sums (Σv, Σv² — the
    // per-row square is one IEEE double multiply, identical both
    // engines), mean/variance derive from those sums in double with
    // IDENTICAL expression text, σ = sqrt(max(var, 0)) (correctly
    // rounded, and the clamp kills the tiny-negative-variance NaN).
    // Plan contract: profile table is ≤ |types|×24 rows — ONE groupBy
    // shuffle then a broadcast join back onto the fact; the filter is
    // a row-local double compare. At 100 TB: one pass + one broadcast.
    QueryDef("q_events_seasonal_outliers",
      (s, d) => seasonalOutliers(
          Tables.table(s, d, "events")
            .select("event_id", "event_type", "ts", "value"),
          keyCol = "event_type", tsCol = "ts", valueCol = "value", z = 3.0)
        .select("event_id", "event_type", "hr", "value")
        .orderBy("event_id"),
      Some("""WITH prof AS (
             |  SELECT event_type AS p_type, hour(ts) AS p_hr,
             |    CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
             |      / count(1) AS mean,
             |    sqrt(greatest(
             |      CAST(CAST(sum(CAST(value * value AS DECIMAL(38,6)))
             |        AS VARCHAR) AS DOUBLE) / count(1)
             |      - (CAST(CAST(sum(CAST(value AS DECIMAL(38,6)))
             |        AS VARCHAR) AS DOUBLE) / count(1))
             |      * (CAST(CAST(sum(CAST(value AS DECIMAL(38,6)))
             |        AS VARCHAR) AS DOUBLE) / count(1)), 0.0)) AS sd
             |  FROM events GROUP BY 1, 2
             |)
             |SELECT event_id, event_type, hour(ts) AS hr, value
             |FROM events JOIN prof
             |  ON event_type = p_type AND hour(ts) = p_hr
             |WHERE value > mean + 3.0 * sd
             |ORDER BY event_id""".stripMargin)),

    // -------------------------------------- gap-based sessionization
    // the batch sessionizer (warehouse SESSIONIZE / the batch twin of
    // q_stream_session's session_window): split each user's event
    // stream wherever the gap to the previous event exceeds 30 minutes,
    // then report one row per session. Engine form is the classic
    // gaps-and-islands two-window pass: a lag() marks session starts, a
    // running sum of the start flags numbers the sessions, then ONE
    // groupBy folds per-session stats — all three stages share the same
    // user_id hash partitioning, so at 100 TB this is ONE shuffle on
    // user_id followed by entirely partition-local sorts + a map-side-
    // combinable aggregate. Determinism: the event order is total
    // ((ts, event_id) — event_id is unique), the gap compare is exact
    // integer microseconds (no interval semantics to drift between
    // engines), and the value sum rides the exact DECIMAL(38,6)
    // accumulator. A pathological mega-user sorts on one core — the
    // documented chunking treatment (q_pack_sequences_chunked) applies
    // if a fixture ever grows one; this one tops out at ~2k events/user.
    QueryDef("q_events_sessionize",
      (s, d) => sessionize(
          Tables.table(s, d, "events")
            .select("user_id", "ts", "event_id", "value"))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          max("ts").as("session_end"),
          dsum("value").as("total_value"))
        .orderBy("user_id", "session_seq"),
      Some("""WITH seq AS (
             |  SELECT user_id, ts, event_id, value,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events
             |), flagged AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM seq
             |), sess AS (
             |  SELECT user_id, ts, value,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS BIGINT) AS session_seq
             |  FROM flagged
             |)
             |SELECT user_id, session_seq,
             |  CAST(count(1) AS BIGINT) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS total_value
             |FROM sess GROUP BY 1, 2
             |ORDER BY user_id, session_seq""".stripMargin)),

    // ---------------------------------------------- OHLC resampling
    // downsample the event stream to 15-minute OHLC bars per event
    // type — the time-series resample/candlestick shape (and the
    // metric-rollup pass of an observability pipeline). Bucket = exact
    // integer floor of epoch microseconds (no calendar/interval
    // semantics to drift between engines); open/close are picked by
    // row_number over the TOTAL (ts, event_id) order inside each bar
    // — two window passes and the final aggregate all share ONE
    // (event_type, bucket) hash partitioning, so at 100 TB this is a
    // single shuffle of the fact stream, and bar keys are high-
    // cardinality so no reducer hot-spots. high/low/volume are plain
    // min/max/DECIMAL-exact sums; bar count is bounded by |events|.
    QueryDef("q_timeseries_resample",
      (s, d) => {
        val bucketed = Tables.table(s, d, "events")
          .select("event_type", "ts", "event_id", "value")
          .withColumn("bar_start", timestamp_micros(
            expr("(unix_micros(ts) div 900000000) * 900000000")))
        val wAsc = Window.partitionBy("event_type", "bar_start")
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy("event_type", "bar_start")
          .orderBy(col("ts").desc, col("event_id").desc)
        bucketed
          .withColumn("rn_a", row_number().over(wAsc))
          .withColumn("rn_d", row_number().over(wDesc))
          .groupBy("event_type", "bar_start")
          .agg(count(lit(1)).as("n_events"),
            max(when(col("rn_a") === 1, col("value"))).as("open"),
            max("value").as("high"),
            min("value").as("low"),
            max(when(col("rn_d") === 1, col("value"))).as("close"),
            dsum("value").as("volume"))
          .orderBy("event_type", "bar_start")
      },
      Some("""WITH bucketed AS (
             |  SELECT event_type, ts, event_id, value,
             |    make_timestamp((epoch_us(ts) // 900000000) * 900000000)
             |      AS bar_start
             |  FROM events
             |), ranked AS (
             |  SELECT event_type, bar_start, value,
             |    row_number() OVER (PARTITION BY event_type, bar_start
             |      ORDER BY ts, event_id) AS rn_a,
             |    row_number() OVER (PARTITION BY event_type, bar_start
             |      ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM bucketed
             |)
             |SELECT event_type, bar_start,
             |  CAST(count(1) AS BIGINT) AS n_events,
             |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
             |  max(value) AS high, min(value) AS low,
             |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS volume
             |FROM ranked GROUP BY 1, 2
             |ORDER BY event_type, bar_start""".stripMargin)),

    // ------------------------------------------- SCD2 dimension build
    // the warehouse dimension-history primitive: collapse the event
    // log into versioned (valid_from, valid_to] intervals per user,
    // versioning the value-derived tier. ONE user shuffle, three
    // windows on the same (ts, event_id) total order — see
    // [[Temporal.scd2]]. Tier thresholds are exact double compares
    // (identical literals both engines); tier is never NULL so the
    // oracle's lag() <> change test matches the struct <=> compare.
    QueryDef("q_scd2_build",
      (s, d) => {
        val ev = Tables.table(s, d, "events").withColumn("tier",
          when(col("value") < 50, "low")
            .when(col("value") < 200, "mid").otherwise("high"))
        scd2(ev, "user_id", "ts", "event_id", Seq("tier"))
          .orderBy("user_id", "version")
      },
      Some("""WITH tiers AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN value < 50 THEN 'low'
             |      WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier
             |  FROM events
             |), marked AS (
             |  SELECT *, lag(tier) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
             |  FROM tiers
             |), changes AS (
             |  SELECT user_id, ts, event_id, tier FROM marked
             |  WHERE prev_tier IS NULL OR prev_tier <> tier
             |)
             |SELECT user_id,
             |  CAST(row_number() OVER w AS BIGINT) AS version,
             |  ts AS valid_from, lead(ts) OVER w AS valid_to, tier
             |FROM changes
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, version""".stripMargin)),

    // ------------------------------------- SCD2 point-in-time lookup
    // each purchase fetches the tier version valid AT its timestamp.
    // Spark-first shape: because SCD2 intervals partition time per key
    // (non-overlapping, contiguous from the first change), "the version
    // with valid_from ≤ ts AND (ts < valid_to OR open)" IS the as-of
    // backward match on valid_from — so this reuses [[Graft.asofJoin]]'s
    // union+window plan (no interval range join, no row explosion at
    // 100 TB). The oracle states the textbook BETWEEN-join spelling;
    // hash equality proves the reduction. (user_id, ts) is unique in
    // every fixture incl. the 10× replica (checked), so the as-of tie
    // case cannot arise.
    QueryDef("q_scd2_lookup",
      (s, d) => {
        val ev = Tables.table(s, d, "events").withColumn("tier",
          when(col("value") < 50, "low")
            .when(col("value") < 200, "mid").otherwise("high"))
        val versions = scd2(ev, "user_id", "ts", "event_id", Seq("tier"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        graft.Graft.asofJoin(purchases, versions, Seq("user_id"),
            "ts", "valid_from")
          .select("event_id", "user_id", "ts", "tier", "version")
          .orderBy("event_id")
      },
      Some("""WITH tiers AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN value < 50 THEN 'low'
             |      WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier
             |  FROM events
             |), marked AS (
             |  SELECT *, lag(tier) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
             |  FROM tiers
             |), versions AS (
             |  SELECT user_id,
             |    CAST(row_number() OVER w AS BIGINT) AS version,
             |    ts AS valid_from, lead(ts) OVER w AS valid_to, tier
             |  FROM (SELECT user_id, ts, event_id, tier FROM marked
             |        WHERE prev_tier IS NULL OR prev_tier <> tier)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |)
             |SELECT e.event_id, e.user_id, e.ts, v.tier, v.version
             |FROM tiers e JOIN versions v
             |  ON e.user_id = v.user_id AND e.ts >= v.valid_from
             |  AND (v.valid_to IS NULL OR e.ts < v.valid_to)
             |WHERE e.event_type = 'purchase'
             |ORDER BY e.event_id""".stripMargin)),

    // --------------------------------------------------- EWMA (α = ½)
    // exponentially weighted moving average of daily event value
    // volume per event type, EXACT: the recursion y_t = ½y_{t-1} + ½x_t is
    // algebraically unrolled as z_t = Σ x_i·2^(i-1) (z_0 = x_0), y_t =
    // z_t ⌊div⌋ 2^t — with α = ½ every weight is a power of two, so in
    // integer micro-units the whole smoother is DECIMAL(38,0)/HUGEINT
    // arithmetic with NO float accumulation: both engines compute the
    // identical integers in any summation order. Missing days decay
    // exactly (z constant, divisor doubles ≡ x = 0 that day). Horizon
    // bound: 2^t·x_micro caps DECIMAL(38,0) near t ≈ 90 at these
    // volumes; the fixture era spans 30 days, and overflow is loud
    // (NULL → hash mismatch), not silent drift. Shape: one (type, day)
    // hash agg → broadcast era-origin scalar → one type shuffle
    // carrying the running window.
    QueryDef("q_timeseries_ewma",
      (s, d) => {
        val daily = Tables.table(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("abs_day"))
          .agg(sum(round(col("value") * 1e6).cast(LongType)).as("x_micro"))
        val day0 = daily.agg(min("abs_day").as("day0"))
        val w = Window.partitionBy("event_type").orderBy("rel_day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(day0))
          .withColumn("rel_day", (col("abs_day") - col("day0")).cast(LongType))
          .withColumn("z", sum(col("x_micro").cast(D380) *
            expr("CAST(pow(2, rel_day) AS DECIMAL(38,0))")).over(w))
          .withColumn("ewma_micro",
            expr("CAST(z div CAST(pow(2, rel_day) AS DECIMAL(38,0)) AS BIGINT)"))
          .select(col("event_type"), col("rel_day"), col("x_micro"),
            col("ewma_micro"))
          .orderBy("event_type", "rel_day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS abs_day,
             |    CAST(sum(CAST(round(value * 1000000) AS BIGINT))
             |      AS BIGINT) AS x_micro
             |  FROM events GROUP BY 1, 2
             |), rel AS (
             |  SELECT event_type,
             |    abs_day - (SELECT min(abs_day) FROM daily) AS rel_day,
             |    x_micro
             |  FROM daily
             |)
             |SELECT event_type, rel_day, x_micro,
             |  CAST((sum(CAST(x_micro AS HUGEINT)
             |          * CAST(pow(2, rel_day) AS HUGEINT)) OVER
             |        (PARTITION BY event_type ORDER BY rel_day))
             |      // CAST(pow(2, rel_day) AS HUGEINT) AS BIGINT)
             |    AS ewma_micro
             |FROM rel ORDER BY event_type, rel_day""".stripMargin)),

    // ------------------------------------- concurrency sweep-line
    // peak concurrent sessions per day — the capacity-planning report:
    // sessions ([[sessionize]] intervals) become ±1 boundary points;
    // concurrency at a point is the running sum in (pt, delta DESC)
    // order. Scale-shaped as the classic two-level scan: the running
    // sum is windowed WITHIN each day partition (arbitrarily parallel),
    // then a |days|-bounded prefix over day totals adds each day's
    // carried-over open sessions — the only global window runs on ≤
    // one row per calendar day, never on the event stream. Determinism
    // under ts ties: both engines' default RANGE frame collapses
    // peers, so equal-(pt, delta) rows share one running value and the
    // day max cannot depend on tie order; starts sort before ends at
    // the same instant (delta DESC — inclusive interval semantics).
    // Measured at boundary points: a day fully inside one session with
    // no boundaries would report only its carry — absent at these
    // fixtures (every day has points) and the honest semantics for a
    // boundary-event sweep.
    QueryDef("q_events_concurrency",
      (s, d) => {
        val sess = sessionize(Tables.table(s, d, "events")
            .select("user_id", "ts", "event_id"))
          .groupBy("user_id", "session_seq")
          .agg(min("ts").as("s_start"), max("ts").as("s_end"))
        val points = sess.select(col("s_start").as("pt"), lit(1L).as("delta"))
          .unionAll(sess.select(col("s_end").as("pt"), lit(-1L).as("delta")))
          .withColumn("day", expr("unix_micros(pt) div 86400000000"))
        val wIn = Window.partitionBy("day")
          .orderBy(col("pt"), col("delta").desc)
        val daily = points
          .withColumn("run_in_day", sum("delta").over(wIn))
          .groupBy("day")
          .agg(max("run_in_day").as("local_peak"),
            sum("delta").as("day_total"), count(lit(1)).as("n_points"))
        val wDays = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        daily
          .withColumn("carry",
            coalesce(sum("day_total").over(wDays), lit(0L)))
          .select(timestamp_micros(col("day") * 86400000000L).as("day"),
            (col("carry") + col("local_peak")).as("peak_concurrent"),
            col("n_points"))
          .orderBy("day")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, ts, event_id,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events
             |), flagged AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM seq
             |), sess AS (
             |  SELECT user_id, ts,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS BIGINT) AS session_seq
             |  FROM flagged
             |), intervals AS (
             |  SELECT user_id, session_seq,
             |    min(ts) AS s_start, max(ts) AS s_end
             |  FROM sess GROUP BY 1, 2
             |), points AS (
             |  SELECT s_start AS pt, 1 AS delta FROM intervals
             |  UNION ALL SELECT s_end, -1 FROM intervals
             |), pts AS (
             |  SELECT pt, delta,
             |    epoch_us(pt) // 86400000000 AS day
             |  FROM points
             |), runs AS (
             |  SELECT day, delta, sum(delta) OVER (
             |    PARTITION BY day ORDER BY pt, delta DESC) AS run_in_day
             |  FROM pts
             |), daily AS (
             |  SELECT day, max(run_in_day) AS local_peak,
             |    sum(delta) AS day_total, count(1) AS n_points
             |  FROM runs GROUP BY day
             |)
             |SELECT make_timestamp(day * 86400000000) AS day,
             |  CAST(coalesce(sum(day_total) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + local_peak AS BIGINT) AS peak_concurrent,
             |  CAST(n_points AS BIGINT) AS n_points
             |FROM daily ORDER BY 1""".stripMargin)),

    // ---------------------------------------------- journey mining
    // top session paths: each session's ordered event-type sequence
    // becomes one '>'-joined path string; the report is the 10 most
    // common journeys — the product-analytics "what do users actually
    // do" query. Path build rides the SAME user shuffle as sessionize
    // (collect_list over the full-session frame in (ts, event_id)
    // order — deterministic because the order is total); then one
    // path-grain agg + TakeOrdered top-10 (ties broken by path text,
    // so the cut is stable at any parallelism).
    QueryDef("q_events_paths",
      (s, d) => {
        val sess = sessionize(Tables.table(s, d, "events")
          .select("user_id", "ts", "event_id", "event_type"))
        val w = Window.partitionBy("user_id", "session_seq")
          .orderBy("ts", "event_id")
        sess
          .withColumn("path", concat_ws(">",
            collect_list("event_type").over(w.rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path")).limit(10)
      },
      Some("""WITH seq AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events
             |), flagged AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM seq
             |), sess AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS session_seq
             |  FROM flagged
             |), paths AS (
             |  SELECT string_agg(event_type, '>' ORDER BY ts, event_id)
             |    AS path
             |  FROM sess GROUP BY user_id, session_seq
             |)
             |SELECT path, CAST(count(1) AS BIGINT) AS n_sessions
             |FROM paths GROUP BY path
             |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin)),

    // ------------------------------------- inter-arrival percentiles
    // latency profiling: p50/p90/p99 of the WHOLE-SECOND gap between a
    // user's
    // consecutive events of each type (integer seconds keep the
    // interpolated quantile inside round-6's absorption range — at
    // microsecond magnitude ~4e11 the two engines' interpolation ulp
    // exceeds 1e-6) — per-(user, type) lag windows
    // (user-grain partitions, never 5 fat per-type reducers), then the
    // spillable histogram quantiles per type ([[graft.Graft
    // .quantiles]] — no global sort, quantile_cont-exact).
    QueryDef("q_events_interarrival",
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables.table(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("gap_s",
            expr("(unix_micros(ts) div 1000000)")
              - lag(expr("(unix_micros(ts) div 1000000)"), 1).over(w))
          .filter(col("gap_s").isNotNull)
        graft.ops.Relational.histQuantiles(gaps, "gap_s",
            Seq("event_type"),
            Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    (epoch_us(ts) // 1000000)
             |      - lag(epoch_us(ts) // 1000000) OVER (
             |      PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) AS gap_s
             |  FROM events
             |)
             |SELECT event_type,
             |  round(quantile_cont(gap_s, 0.5), 6) AS p50,
             |  round(quantile_cont(gap_s, 0.9), 6) AS p90,
             |  round(quantile_cont(gap_s, 0.99), 6) AS p99
             |FROM g WHERE gap_s IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // --------------------------------------------- TWAP (time-weighted)
    // time-weighted average value per (type, day) — the finance/ops
    // metric where a value HOLDS until the next observation, so
    // sparse-but-stable readings aren't drowned by bursts (the plain
    // mean's failure mode). Each event's segment runs to the next
    // same-day event of its type, the last to midnight; the span
    // before the day's first event has no reading and is excluded.
    // EXACT: duration µs × value micro-units ride DECIMAL(38,0)/
    // HUGEINT; twap_micro = num div den — integer floor on both
    // engines, no float accumulation. The lead() window and the final
    // agg share ONE (event_type, day) partitioning.
    QueryDef("q_timeseries_twap",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            col("value"))
          .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        val w = Window.partitionBy("event_type", "day")
          .orderBy("ts", "event_id")
        ev
          .withColumn("dur",
            coalesce(lead(unix_micros(col("ts")), 1).over(w),
              (col("day") + 1) * 86400000000L) - unix_micros(col("ts")))
          .withColumn("vmicro", round(col("value") * 1e6).cast("long"))
          .groupBy("event_type", "day")
          .agg(sum(col("vmicro").cast(D380) * col("dur").cast(D380))
              .as("num"),
            sum(col("dur").cast(D380)).as("den"),
            count(lit(1)).as("n_events"))
          .select(col("event_type"),
            timestamp_micros(col("day") * 86400000000L).as("day"),
            expr("CAST(num div den AS BIGINT)").as("twap_micro"),
            col("n_events"))
          .orderBy("event_type", "day")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, ts, event_id, value,
             |    epoch_us(ts) // 86400000000 AS day
             |  FROM events
             |), seg AS (
             |  SELECT event_type, day,
             |    coalesce(lead(epoch_us(ts)) OVER (
             |        PARTITION BY event_type, day ORDER BY ts, event_id),
             |      (day + 1) * 86400000000) - epoch_us(ts) AS dur,
             |    CAST(round(value * 1000000) AS BIGINT) AS vmicro
             |  FROM ev
             |)
             |SELECT event_type,
             |  make_timestamp(day * 86400000000) AS day,
             |  CAST(sum(CAST(vmicro AS HUGEINT) * dur)
             |    // sum(CAST(dur AS HUGEINT)) AS BIGINT) AS twap_micro,
             |  CAST(count(1) AS BIGINT) AS n_events
             |FROM seg GROUP BY event_type, day
             |ORDER BY event_type, 2""".stripMargin)),

    // ------------------------------------------------ RFM segmentation
    // recency/frequency/monetary customer scoring over purchase events
    // — the classic lifecycle-segmentation report, built scale-safe:
    // per-user metrics are ONE map-side-combinable aggregate over the
    // fact stream; the three quintile cutpoint sets come from the
    // spillable value-grain histogram quantiles ([[graft.Graft
    // .quantiles]] — NO global sort, NO whole-column window, the
    // q_agg_percentile ≡ quantile_cont precedent), broadcast back as
    // 1-row frames; scores are row-local threshold compares. Recency
    // counts calendar days from each user's last purchase to the
    // corpus max (broadcast scalar). 5 = best on every axis (most
    // recent / most orders / most spend). Exact-decimal money sums;
    // the cutpoint compares are doubles derived identically on both
    // engines, so the quintile boundaries cannot flake.
    QueryDef("q_events_rfm",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val gmax = ev.agg(max("ts").as("gmax"))
        // |users|-grain and read FOUR times (three cutpoint histograms +
        // the scoring join) — materialize once so the fact stream is
        // scanned once, not four times (the q_join_interval precedent)
        val user = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(max("ts").as("last_ts"),
            count(lit(1)).as("frequency"),
            dsum("value").as("monetary"))
          .join(broadcast(gmax))
          .withColumn("recency_days",
            datediff(to_date(col("gmax")), to_date(col("last_ts")))
              .cast(LongType))
          .withColumn("__g", lit(1))
          .localCheckpoint(true)
        // ONE histQuantiles pass over the three metrics STACKED into a
        // (metric, value) frame grouped by (__g, metric) — r17
        // optimization round; was three independent passes, i.e. 3×
        // the checkpoint/rank/bucket machinery (PlanDump: 45 stage-jobs
        // for 1.4 s of task time, the suite's purest job-constant
        // waste). Per-metric rank arithmetic is untouched (each metric
        // is its own group); casting the two integer metrics to DOUBLE
        // is exact at these magnitudes and the interpolation already
        // ran in double, so the cutpoints are bit-identical. The cut
        // frame is localized ONCE (3 rows) so the three per-metric
        // broadcast joins read LocalRelations instead of each
        // re-running the level-2 quantile scan.
        val stacked = user.selectExpr("__g",
          "stack(3, 'r', CAST(recency_days AS DOUBLE), " +
            "'f', CAST(frequency AS DOUBLE), 'm', monetary) " +
            "AS (metric, val)")
        val cutsAll = graft.ops.Relational.localized(
          graft.ops.Relational.histQuantiles(stacked, "val",
            Seq("__g", "metric"),
            Seq(0.2 -> "c20", 0.4 -> "c40", 0.6 -> "c60", 0.8 -> "c80")))
        def cuts(tag: String) = cutsAll.filter(col("metric") === tag)
          .select(col("__g"),
            col("c20").as(s"${tag}20"), col("c40").as(s"${tag}40"),
            col("c60").as(s"${tag}60"), col("c80").as(s"${tag}80"))
        def above(metric: String, tag: String) =
          (col(metric) > col(s"${tag}20")).cast("int") +
            (col(metric) > col(s"${tag}40")).cast("int") +
            (col(metric) > col(s"${tag}60")).cast("int") +
            (col(metric) > col(s"${tag}80")).cast("int")
        user
          .join(broadcast(cuts("r")), Seq("__g"))
          .join(broadcast(cuts("f")), Seq("__g"))
          .join(broadcast(cuts("m")), Seq("__g"))
          .select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            (lit(5) - above("recency_days", "r")).cast(LongType)
              .as("r_score"),
            (lit(1) + above("frequency", "f")).cast(LongType)
              .as("f_score"),
            (lit(1) + above("monetary", "m")).cast(LongType)
              .as("m_score"))
          .orderBy("user_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, max(ts) AS last_ts,
             |    CAST(count(1) AS BIGINT) AS frequency,
             |    CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
             |      AS DOUBLE) AS monetary
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1
             |), g AS (SELECT max(ts) AS gmax FROM events),
             |r AS (
             |  SELECT user_id,
             |    date_diff('day', CAST(last_ts AS DATE), CAST(gmax AS DATE))
             |      AS recency_days,
             |    frequency, monetary
             |  FROM u, g
             |), q AS (
             |  SELECT
             |    quantile_cont(recency_days, 0.2) AS r20,
             |    quantile_cont(recency_days, 0.4) AS r40,
             |    quantile_cont(recency_days, 0.6) AS r60,
             |    quantile_cont(recency_days, 0.8) AS r80,
             |    quantile_cont(frequency, 0.2) AS f20,
             |    quantile_cont(frequency, 0.4) AS f40,
             |    quantile_cont(frequency, 0.6) AS f60,
             |    quantile_cont(frequency, 0.8) AS f80,
             |    quantile_cont(monetary, 0.2) AS m20,
             |    quantile_cont(monetary, 0.4) AS m40,
             |    quantile_cont(monetary, 0.6) AS m60,
             |    quantile_cont(monetary, 0.8) AS m80
             |  FROM r
             |)
             |SELECT user_id, recency_days, frequency, monetary,
             |  CAST(5 - ((recency_days > r20)::INT + (recency_days > r40)::INT
             |    + (recency_days > r60)::INT + (recency_days > r80)::INT)
             |    AS BIGINT) AS r_score,
             |  CAST(1 + ((frequency > f20)::INT + (frequency > f40)::INT
             |    + (frequency > f60)::INT + (frequency > f80)::INT)
             |    AS BIGINT) AS f_score,
             |  CAST(1 + ((monetary > m20)::INT + (monetary > m40)::INT
             |    + (monetary > m60)::INT + (monetary > m80)::INT)
             |    AS BIGINT) AS m_score
             |FROM r, q
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------- last-touch attribution
    // marketing attribution: each purchase credits the user's most
    // recent click, but only when that click falls inside a 7-day
    // attribution window — outside it the purchase is reported
    // unattributed (NULL click, the organic bucket). Engine form is
    // the [[asofJoin]] union+window operator (ONE user_id shuffle, no
    // range explosion) carrying the click's OWN timestamp as a value
    // column, then a row-local window gate — correct because the as-of
    // pick IS the only candidate: if the latest prior click is outside
    // the window, every earlier one is too. Clicks dedup to (user, ts)
    // grain with max-event_id (the purchasesDeduped discipline) so ties
    // are deterministic; the lag is exact integer minutes. The DuckDB
    // oracle runs its native ASOF LEFT JOIN plus the same gate: two
    // engines, one attribution rule.
    QueryDef("q_events_attribution",
      (s, d) => {
        val ev = Tables.table(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts")
          .agg(max("event_id").as("c_id"))
          .withColumn("c_ts", col("ts"))
        val gate = col("c_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("c_ts")) <=
            lit(7L * 24 * 3600 * 1000000)
        asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
          .select(col("p_id"), col("user_id"), col("value"),
            when(gate, col("c_id")).as("click_id"),
            when(gate,
              expr("(unix_micros(ts) - unix_micros(c_ts)) div 60000000"))
              .as("mins_since_click"))
          .orderBy("p_id")
      },
      Some("""WITH purchases AS (
             |  SELECT event_id AS p_id, user_id, ts, value
             |  FROM events WHERE event_type = 'purchase'
             |), clicks AS (
             |  SELECT user_id, ts AS c_ts, max(event_id) AS c_id
             |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
             |), joined AS (
             |  SELECT p.p_id, p.user_id, p.value, c.c_id, c.c_ts,
             |    epoch_us(p.ts) - epoch_us(c.c_ts) AS lag_us
             |  FROM purchases p
             |  ASOF LEFT JOIN clicks c
             |    ON p.user_id = c.user_id AND p.ts >= c.c_ts
             |)
             |SELECT p_id, user_id, value,
             |  CASE WHEN lag_us <= 604800000000 THEN c_id END AS click_id,
             |  CAST(CASE WHEN lag_us <= 604800000000
             |    THEN lag_us // 60000000 END AS BIGINT) AS mins_since_click
             |FROM joined
             |ORDER BY p_id""".stripMargin))
  )
}
