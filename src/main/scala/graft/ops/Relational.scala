package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.warehouse.Tables

/** Tier B of SURVEY.md §2 — the relational surface a `read_snowflake` caller
  * reaches through the verbatim SQL pass-through (dask_snowflake/core.py:143),
  * re-expressed as native Spark DataFrame plans so Catalyst/Tungsten (not a
  * remote warehouse) do pushdown, join selection, codegen and AQE.
  *
  * Determinism rules for the DuckDB oracle (SURVEY.md §5.2 / FIXTURES.md):
  * total ORDER BY on a unique key, BIGINT for derived ints on both sides,
  * DECIMAL(38,6) for money sums on both sides, explicit NULLS FIRST/LAST.
  */
object Relational {

  /** Typed row for the `q_typed_dataset` key (encoders need a stable
    * top-level or object-nested case class). */
  private[graft] case class CustRow(
    c_custkey: Long, c_nationkey: Long, c_acctbal: Double)

  private val D386 = DecimalType(38, 6)
  private val D380 = DecimalType(38, 0)

  /** ONE ANSI string for `q_agg_grouping_sets`, run verbatim by BOTH
    * Spark and the DuckDB oracle (the asofOracle sharing pattern). */
  private val groupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(1) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** ONE string for `q_sql_qualify`: Spark runs it through the
    * [[graft.SqlText]] QUALIFY rewrite, DuckDB runs it natively. */
  private val qualifySql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders
      |QUALIFY rn <= 3
      |ORDER BY o_orderstatus, rn""".stripMargin

  private val excludeSql =
    """SELECT * EXCLUDE (o_custkey, o_totalprice) FROM orders
      |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin

  private val groupByAllSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(1) AS BIGINT) AS n,
      |  CAST(min(o_orderkey) AS BIGINT) AS first_key
      |FROM orders GROUP BY ALL
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Generic equi-width histogram ([[graft.Graft.histogram]];
    * `q_profile_histogram`): ONE hash-agg pass over the scan, output
    * bounded by the bin count whatever the input size, partial
    * aggregation map-side so the shuffle carries bins not rows. Bin id
    * by `floor(x / width)` — pure IEEE double division + floor. */
  private[graft] def histogram(
      df: DataFrame, c: Column, width: Double): DataFrame = {
    // width = 0 collapses every row into bin Long.MaxValue (x/0 = Inf),
    // a negative width mirrors bin ids — both are silent garbage, not
    // profiles
    require(width > 0 && !width.isNaN,
      s"histogram width must be a positive number: $width")
    df.groupBy(floor(c / lit(width)).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(c).as("bin_min"), max(c).as("bin_max"))
      .orderBy("bin")
  }

  /** Exact interpolated quantiles (`quantile_cont` semantics) WITHOUT
    * the exact `percentile` aggregate. Spark's `Percentile` buffers
    * every value of the group's column inside ONE in-memory aggregation
    * buffer — the classic unbounded-state executor OOM at 100 TB. This
    * form is a TWO-LEVEL rank scan (the pack_sequences_chunked
    * decomposition applied to order statistics):
    *
    *  1. the fact collapses to its value-grain histogram
    *     (`groupBy(value).count()` — mergeable, map-side-combined, the
    *     shuffle carries distinct values not rows); each target rank
    *     `h = (n−1)·p` comes from a group-count-bounded totals frame
    *     broadcast back;
    *  2. each distinct value maps to one of `buckets` monotone coarse
    *     range buckets; the bucket summary (≤ `buckets` rows per group
    *     — the skew-collapse frame) takes ONE running-sum window to
    *     give every bucket its preceding-rows offset, and only the
    *     ≤ 2·|ps| buckets that actually CONTAIN a target rank are
    *     scanned in level 2 — a per-(group, bucket) running count over
    *     ~|distinct|/buckets values, partitioned, never one global
    *     sort task;
    *  3. the two bracketing order statistics interpolate
    *     `lo + d·(hi − lo)` exactly as `quantile_cont` / Spark
    *     `percentile` define.
    *
    * Rank arithmetic is exact integers end to end, so bucket boundaries
    * (IEEE division, monotone in the value) affect only execution
    * grouping, never the result. NULLs are ignored, as both percentile
    * functions do.
    *
    * Returns one row per group: groupCols ++ one `round(…, 6)` column
    * per (p, name) — the shared cross-engine boundary precision —
    * plus the group's non-null row count when `totalAs` is set.
    */
  private[graft] def histQuantiles(df: DataFrame, valueCol: String,
      groupCols: Seq[String], ps: Seq[(Double, String)],
      totalAs: Option[String] = None, buckets: Int = 1024,
      bucketDriverMaxRows: Int = BucketDriverMaxRows,
      histDriverMaxRows: Int = HistDriverMaxRows): DataFrame = {
    // the value-grain histogram is read THREE times (rank totals, the
    // bucket pass, the level-2 scan) — materialize + cut it once so the
    // corpus pass runs once, not three times (disk-backed partitions,
    // |distinct|-bounded; this makes the call eager, like the measured
    // dispatches elsewhere). The driver arm reads it once, but the
    // checkpoint stays: the over-cap fallback must not rescan the fact.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
    histQuantilesFromHist(hist, valueCol, groupCols, ps, totalAs, buckets,
      bucketDriverMaxRows, histDriverMaxRows)
  }

  /** Row cap for [[localized]] — far above every current caller (frames
    * are one row per group / per (group, probe); group cardinalities are
    * single digits) and far below driver-memory risk. Above it the frame
    * stays distributed, so a future high-cardinality caller degrades to
    * the plain broadcast-join path instead of OOMing the driver. */
  private[graft] val LocalizeMaxRows = 4096

  /** Transport a GROUP-COUNT-BOUNDED frame to the driver and back as a
    * LocalRelation: values are collected once (bit-identical — nothing is
    * recomputed) and every downstream broadcast of the frame builds from
    * an in-memory scan instead of re-running the producing pipeline as
    * its own serialized query-stage chain. Only for frames the caller
    * already treats as broadcast-safe (histQuantiles outputs: one row
    * per group / per (group, probe)); the collect is the same volume
    * the broadcast would pin on the driver anyway.
    *
    * MEASURED dispatch (r16 verdict item 5): the collect is capped by
    * probing `take(LocalizeMaxRows + 1)` — when the frame fits, those
    * rows ARE the full collect (one job, same partition-order rows);
    * when it does not, the frame is returned unchanged and downstream
    * joins keep their distributed plan. Both arms produce the same row
    * multiset (RelationalLocalizeSpec pins it). */
  private[graft] def localized(df: DataFrame): DataFrame = {
    val rows = df.take(LocalizeMaxRows + 1)
    if (rows.length <= LocalizeMaxRows)
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
    else df
  }

  /** [[histQuantiles]] starting from an ALREADY-COUNTED value-grain
    * histogram `(groupCols…, valueCol, __cnt)` — the entry point for
    * callers that can DERIVE one histogram from another instead of
    * rescanning the fact (r16 optimization round: `ordersMadByStatus`
    * maps the value histogram through `|x − med|` and re-aggregates, so
    * the MAD's second quantile pass never touches the orders table).
    * `hist` must already be materialized (it is read three times). */
  /** Driver-row cap for the bucket-count collect in
    * [[histQuantilesFromHist]]: ≤ |groups|·buckets rows of
    * (groupCols…, long, long) — 2²⁰ rows ≈ tens of MB, the bounded-
    * collect class of the measured dispatches elsewhere. Above it (or
    * when the rank frame itself did not localize) the needed-bucket
    * selection stays the distributed window + join arm. */
  private[graft] val BucketDriverMaxRows: Int = 1 << 20

  /** The driver arm of [[histQuantilesFromHist]]: exact replay of the
    * distributed rank arithmetic over the collected histogram. Every
    * step mirrors the SQL expressions in type and operation order —
    * rank formulas in double, (vhi − vlo) in the VALUE's own type
    * first (integral subtraction wraps like the engine's, decimal
    * subtraction exact) with only the result cast to double, and the
    * same BigDecimal.valueOf/HALF_UP round-6 Spark's `round` applies —
    * so the emitted rows are bit-identical to the distributed arm's
    * (HistQuantilesSpec pins the three arms against each other and
    * against Spark's own exact `percentile`). */
  private def driverQuantiles(hist: DataFrame,
      rows: Array[org.apache.spark.sql.Row], valueCol: String,
      groupCols: Seq[String], ps: Seq[(Double, String)],
      totalAs: Option[String]): DataFrame = {
    val sch = hist.schema
    val vIdx = sch.fieldIndex(valueCol)
    val cIdx = sch.fieldIndex("__cnt")
    val gIdx = groupCols.map(sch.fieldIndex)
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
      case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.compare(x, y)
      case (x: java.lang.Float, y: java.lang.Float) =>
        java.lang.Float.compare(x, y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
      case (x: java.lang.Short, y: java.lang.Short) => x.compareTo(y)
      case (x: java.lang.Byte, y: java.lang.Byte) => x.compareTo(y)
      case _ => sys.error(
        s"histQuantiles driver arm: unsupported value type ${a.getClass}")
    }
    def toD(v: Any): Double = v match {
      case l: java.lang.Long => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case b: java.math.BigDecimal => b.doubleValue
      case s: java.lang.Short => s.toDouble
      case b: java.lang.Byte => b.toDouble
      case other => sys.error(
        s"histQuantiles driver arm: unsupported value type ${other.getClass}")
    }
    def delta(hi: Any, lo: Any): Double = (hi, lo) match {
      case (x: java.lang.Long, y: java.lang.Long) =>
        (x.longValue - y.longValue).toDouble
      case (x: java.lang.Integer, y: java.lang.Integer) =>
        (x.intValue - y.intValue).toDouble
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
        x.subtract(y).doubleValue
      case (x: java.lang.Short, y: java.lang.Short) =>
        (x.shortValue - y.shortValue).toDouble
      case (x: java.lang.Byte, y: java.lang.Byte) =>
        (x.byteValue - y.byteValue).toDouble
      case _ => toD(hi) - toD(lo)
    }
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val out =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    rows.groupBy(r => gIdx.map(r.get(_))).foreach { case (gk, grows) =>
      val sorted = grows.sortWith((a, b) => cmp(a.get(vIdx), b.get(vIdx)) < 0)
      val tot = sorted.iterator.map(_.getLong(cIdx)).sum
      // same rank formulas as the SQL: h = (tot−1)·p in double,
      // rlo = ⌊h⌋+1, rhi = min(⌊h⌋+2, tot), frac = h − ⌊h⌋
      val rlo = new Array[Long](ps.length)
      val rhi = new Array[Long](ps.length)
      val frac = new Array[Double](ps.length)
      ps.zipWithIndex.foreach { case ((p, _), i) =>
        val h = (tot - 1).toDouble * p
        rlo(i) = math.floor(h).toLong + 1
        rhi(i) = math.min(math.floor(h).toLong + 2, tot)
        frac(i) = h - math.floor(h)
      }
      // value v covers rank r iff cum−cnt < r ≤ cum — one ascending walk
      val vlo = new Array[Any](ps.length)
      val vhi = new Array[Any](ps.length)
      var cum = 0L
      sorted.foreach { r =>
        val lo = cum
        cum += r.getLong(cIdx)
        var i = 0
        while (i < ps.length) {
          if (lo < rlo(i) && rlo(i) <= cum) vlo(i) = r.get(vIdx)
          if (lo < rhi(i) && rhi(i) <= cum) vhi(i) = r.get(vIdx)
          i += 1
        }
      }
      val qs = ps.indices.map { i =>
        if (vlo(i) == null || vhi(i) == null) null
        else java.lang.Double.valueOf(
          round6(toD(vlo(i)) + frac(i) * delta(vhi(i), vlo(i))))
      }
      out += org.apache.spark.sql.Row.fromSeq(
        gk ++ totalAs.map(_ => tot) ++ qs)
    }
    // empty-input contract of the distributed arm: the global (no-group)
    // path still returns one row — count 0, quantiles NULL
    if (groupCols.isEmpty && out.isEmpty)
      out += org.apache.spark.sql.Row.fromSeq(
        totalAs.map(_ => 0L).toSeq ++ ps.map(_ => null))
    val schema = StructType(
      gIdx.map(sch.fields(_)) ++
        totalAs.map(n => StructField(n, LongType)) ++
        ps.map { case (_, name) => StructField(name, DoubleType) })
    hist.sparkSession.createDataFrame(
      java.util.Arrays.asList(out.toSeq: _*), schema)
  }

  /** Histogram row count at or below which the WHOLE quantile
    * computation runs as driver arithmetic over one bounded collect
    * (2¹⁸ rows ≈ 10–20 MB — the bounded-collect class of
    * `connectedComponents`' driver union-find and the IVF list heads).
    * Above it the distributed rank/bucket machinery runs unchanged; the
    * driver arm replays the IDENTICAL arithmetic (same rank formulas,
    * same type-coercion order in the interpolation, same HALF_UP
    * round-6), pinned three-way by HistQuantilesSpec and by the oracle
    * hash on every consumer key. */
  private[graft] val HistDriverMaxRows: Int = 1 << 18

  private[graft] def histQuantilesFromHist(hist: DataFrame, valueCol: String,
      groupCols: Seq[String], ps: Seq[(Double, String)],
      totalAs: Option[String] = None, buckets: Int = 1024,
      bucketDriverMaxRows: Int = BucketDriverMaxRows,
      histDriverMaxRows: Int = HistDriverMaxRows): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    if (histDriverMaxRows > 0) {
      // measured dispatch on the histogram itself: |distinct values| is
      // the machinery's whole input — when it fits the driver cap, ONE
      // collect replaces the rank probe, the bucket pass and the
      // level-2 scan (≈7 sequential AQE stage-jobs per call at bench
      // scale, the dominant cost of every consumer key). The take is
      // incremental, so the over-cap fallback stops after ~cap rows.
      val rows = hist.take(histDriverMaxRows + 1)
      if (rows.length <= histDriverMaxRows)
        return driverQuantiles(hist, rows, valueCol, groupCols, ps, totalAs)
    }
    val gc = groupCols.map(col)
    val ranks0 = hist.groupBy(gc: _*).agg(sum(col("__cnt")).as("__tot"),
      min(col(valueCol)).as("__glo"), max(col(valueCol)).as("__ghi"))
    // group-count-sized, but consumed by TWO broadcast joins — without
    // the localize each broadcast BUILD re-runs this full-histogram
    // aggregation as its own serialized query-stage chain (r16
    // optimization round: measured ~0.5 s per rebuild per consumer at
    // sf0.1, the dominant cost of every histQuantiles call)
    val ranksDf =
      ps.zipWithIndex.foldLeft(ranks0) { case (r, ((p, _), i)) =>
        val h = (col("__tot") - 1).cast(DoubleType) * lit(p)
        r.withColumn(s"__rlo$i", floor(h).cast(LongType) + 1)
          // clamp: at d = 0 on the last rank, hi would fall past the
          // end; with rhi = rlo the interpolation degenerates to lo
          .withColumn(s"__rhi$i",
            least(floor(h).cast(LongType) + 2, col("__tot")))
          .withColumn(s"__frac$i", h - floor(h))
      }
    val ranksRows = ranksDf.take(LocalizeMaxRows + 1)
    val ranksLocal = ranksRows.length <= LocalizeMaxRows
    val ranks =
      if (ranksLocal)
        hist.sparkSession.createDataFrame(
          java.util.Arrays.asList(ranksRows: _*), ranksDf.schema)
      else ranksDf
    // group-key joins are NULL-SAFE (<=> per column): groupBy treats a
    // NULL key as a real group, so the rank attach must too — a plain
    // equi-join would silently drop every NULL-keyed group
    def bJoin(l: DataFrame, r: DataFrame): DataFrame =
      if (groupCols.isEmpty) l.join(broadcast(r))
      else {
        val rr = groupCols.foldLeft(r)(
          (d, c) => d.withColumnRenamed(c, s"__r_$c"))
        val cond = groupCols.map(c => col(c) <=> col(s"__r_$c"))
          .reduce(_ && _)
        l.join(broadcast(rr), cond)
          .drop(groupCols.map(c => s"__r_$c"): _*)
      }
    val joined = bJoin(hist, ranks)
    // monotone coarse bucket over the group's value range
    val span = col("__ghi") - col("__glo")
    val bCol = when(span === 0d, lit(0L)).otherwise(
      least(lit((buckets - 1).toLong), greatest(lit(0L),
        floor((col(valueCol) - col("__glo")) / span * buckets)
          .cast(LongType))))
    val hb = joined.withColumn("__b", bCol)
    val bsum = hb.groupBy((gc :+ col("__b")): _*)
      .agg(sum(col("__cnt")).as("__bc"))
    // a rank r lives in a bucket iff base < r ≤ base + count.
    // The rank-bearing-bucket selection dispatches on MEASURED volume
    // (r17 optimization round): the bucket-count frame is ≤
    // |groups|·buckets rows of (group, long, long) — when it fits the
    // driver cap, ONE collect replaces the running-sum window exchange,
    // its AQE stage round and the second driver round-trip the
    // distributed arm pays (guide §2.4; the per-call stage-job count is
    // the dominant cost of every histQuantiles consumer at bench
    // scale). The driver replay is the same exact integer arithmetic —
    // sort buckets by __b per group, running base, (base, base+bc]
    // containment — so both arms emit the identical needed-bucket set
    // (HistQuantilesSpec pins arm equality; the oracle hash-gates all
    // nine consumer keys).
    def distributedNeeded(): DataFrame = {
      val wB = Window.partitionBy(gc: _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boff = bJoin(
        bsum.withColumn("__base", sum(col("__bc")).over(wB) - col("__bc")),
        ranks)
      def inBucket(r: Column) =
        col("__base") < r && r <= col("__base") + col("__bc")
      val neededCond = ps.indices.map { i =>
        inBucket(col(s"__rlo$i")) || inBucket(col(s"__rhi$i"))
      }.reduce(_ || _)
      // ≤ 2·|ps| rows per group, but its broadcast build would
      // otherwise re-run the bucket aggregation + running-sum window
      // pipeline — localize so the level-2 scan's broadcast builds
      // from memory
      localized(boff.filter(neededCond)
        .select((gc :+ col("__b") :+ col("__base")): _*))
    }
    val needed: DataFrame = {
      val bsumRows =
        if (ranksLocal) bsum.take(bucketDriverMaxRows + 1) else Array.empty[org.apache.spark.sql.Row]
      if (ranksLocal && bsumRows.length <= bucketDriverMaxRows) {
        val nG = groupCols.length
        val rankByG = ranksRows
          .map(r => Seq.tabulate(nG)(r.get(_)) -> r).toMap
        val rloIdx = ps.indices.map(i => ranksDf.schema.fieldIndex(s"__rlo$i"))
        val rhiIdx = ps.indices.map(i => ranksDf.schema.fieldIndex(s"__rhi$i"))
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        bsumRows.groupBy(r => Seq.tabulate(nG)(r.get(_))).foreach {
          case (gk, rows) =>
            rankByG.get(gk).foreach { rk =>
              var base = 0L
              rows.sortBy(_.getLong(nG)).foreach { br =>
                val bc = br.getLong(nG + 1)
                def in(idx: Int): Boolean = !rk.isNullAt(idx) && {
                  val r = rk.getLong(idx); base < r && r <= base + bc
                }
                if (ps.indices.exists(i => in(rloIdx(i)) || in(rhiIdx(i))))
                  out += org.apache.spark.sql.Row.fromSeq(
                    Seq.tabulate[Any](nG)(br.get(_)) :+ br.getLong(nG) :+ base)
                base += bc
              }
            }
        }
        val schema = StructType(bsum.schema.fields.take(nG) ++ Seq(
          StructField("__b", LongType), StructField("__base", LongType)))
        hist.sparkSession.createDataFrame(
          java.util.Arrays.asList(out.toSeq: _*), schema)
      } else distributedNeeded()
    }
    // level-2 scan: only the rank-bearing buckets, partitioned per
    // (group, bucket) — ≤ 2·|ps| buckets per group ever sort; the
    // group-key part of the join is null-safe like bJoin
    val neededR = groupCols.foldLeft(needed)(
        (d, c) => d.withColumnRenamed(c, s"__r_$c"))
      .withColumnRenamed("__b", "__rb")
    val scanCond = (groupCols.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__b") === col("__rb"))).reduce(_ && _)
    val scan = hb.join(broadcast(neededR), scanCond)
      .drop("__rb").drop(groupCols.map(c => s"__r_$c"): _*)
    val wIn = Window.partitionBy((gc :+ col("__b")): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value v covers rank r iff cum−cnt < r ≤ cum — exactly one v per r
    val cum = scan.withColumn("__cum",
      col("__base") + sum(col("__cnt")).over(wIn))
    def covers(r: Column) =
      col("__cum") - col("__cnt") < r && r <= col("__cum")
    val aggs = ps.indices.flatMap { i =>
      Seq(
        min(when(covers(col(s"__rlo$i")), col(valueCol))).as(s"__vlo$i"),
        min(when(covers(col(s"__rhi$i")), col(valueCol))).as(s"__vhi$i"),
        min(col(s"__frac$i")).as(s"__f$i"))
    } ++ totalAs.map(n => min(col("__tot")).as(n))
    val byG = cum.groupBy(gc: _*).agg(aggs.head, aggs.tail: _*)
    // empty-input contract: the global (no-group) path still returns
    // one row — its count is 0 (matching count(*) semantics), its
    // quantile columns NULL; without the coalesce the min() partial
    // would surface NULL where an aggregate count reports 0
    val outCols = gc ++ totalAs.map(n => coalesce(col(n), lit(0L)).as(n)) ++
      ps.zipWithIndex.map { case ((_, name), i) =>
        round(col(s"__vlo$i") +
          col(s"__f$i") * (col(s"__vhi$i") - col(s"__vlo$i")), 6).as(name)
      }
    byG.select(outCols: _*)
  }

  /** Per-status (median, MAD) of o_totalprice — TWO [[histQuantiles]]
    * passes (median, then median-of-deviations, both round(…,6) on the
    * shared cross-engine lattice). Registry-cached: the frame is
    * group-count-sized (3 rows) and BOTH `q_agg_mad` and
    * `q_profile_outliers_robust` consume it — one computation per
    * (session, sf dir), not one per key. */
  private def ordersMadByStatus(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrPersist("orders_mad_by_status", d, {
      // ONE orders scan for both quantile passes (r16 optimization
      // round; was two): the deviation histogram is the value histogram
      // mapped through |x − med| — identical multiset of per-row dev
      // values, because every row of a (status, price) histogram cell
      // maps to the same dev — so the MAD pass re-aggregates the
      // |distinct|-bounded histogram instead of rescanning the fact.
      val hist0 = t(s, d, "orders")
        .filter(col("o_totalprice").isNotNull)
        .groupBy(col("o_orderstatus"), col("o_totalprice"))
        .agg(count(lit(1)).as("__cnt"))
        .localCheckpoint(true)
      // 3 rows, read by THREE consumers (dev mapping + two final joins)
      // — localize so each broadcast reads the result, not the pipeline
      val med = localized(histQuantilesFromHist(hist0,
          "o_totalprice", Seq("o_orderstatus"), Seq(0.5 -> "med"))
        .withColumnRenamed("o_orderstatus", "ms"))
      val devHist = hist0.join(broadcast(med),
          col("o_orderstatus") === col("ms"))
        .groupBy(col("o_orderstatus"),
          round(abs(col("o_totalprice") - col("med")), 6).as("dev"))
        .agg(sum(col("__cnt")).as("__cnt"))
        .localCheckpoint(true)
      histQuantilesFromHist(devHist, "dev", Seq("o_orderstatus"),
          Seq(0.5 -> "mad"))
        .join(med, col("o_orderstatus") === col("ms"))
        .select(col("o_orderstatus"), col("med"), col("mad"))
    })

  /** One-pass multi-column profile ([[graft.Graft.profileStats]];
    * `q_profile_stats`): per numeric column, (non-null count, null
    * count, min, max) — ALL columns through ONE global aggregate (4
    * aggregates per column fused in a single partial+final pass, the
    * shuffle carries one row), then an explode unpivot of that row into
    * the per-column report. Internal aliases are POSITIONAL (`__min0`)
    * and user column names enter the plan only as backtick-quoted
    * references and string literals — a dashed/dotted/quoted name
    * profiles fine and can't inject SQL. min/max aggregate in the
    * column's NATIVE type and only the final two values cast:
    * DECIMAL(38,6) (exact for longs and for decimals with scale ≤ 6)
    * unless a float/double column is present, in which case the report
    * is DOUBLE (exact for the float columns; an integral column
    * profiled ALONGSIDE doubles is exact up to 2^53). Non-numeric
    * columns and decimals EITHER report type would round or overflow
    * (scale > 6 / too wide for DECIMAL(38,6) on the exact path,
    * precision > 15 on the DOUBLE path) are rejected loudly, never
    * silently nulled. The profiling companion
    * to [[histogram]]: at 100 TB this is exactly one scan whatever the
    * column count. */
  private[graft] def profileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileStats needs at least one column")
    val fields = cols.map { c =>
      df.schema.fields.find(_.name == c)
        .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(c)))
        .getOrElse(throw new IllegalArgumentException(
          s"profileStats: no column '$c' in [${df.schema.fieldNames.mkString(", ")}]"))
    }
    fields.foreach { f =>
      if (!f.dataType.isInstanceOf[NumericType]) throw new IllegalArgumentException(
        s"profileStats: column '${f.name}' is ${f.dataType.simpleString}, not numeric " +
          "— cast it explicitly if a numeric profile is intended")
    }
    val outType: DataType =
      if (fields.exists(f => f.dataType == DoubleType || f.dataType == FloatType)) {
        // the DOUBLE report a float column forces must not silently
        // round a decimal column riding along (the loud-rejection
        // contract applies on BOTH paths); integral columns stay
        // admitted with the documented exact-to-2^53 caveat
        fields.foreach(f => f.dataType match {
          case dt: DecimalType if dt.precision > 15 =>
            throw new IllegalArgumentException(
              s"profileStats: column '${f.name}' (${dt.simpleString}) does not fit the " +
                "DOUBLE report a float column forces (> 15 significant digits would " +
                "round silently) — profile it separately or pre-cast it")
          case _ => ()
        })
        DoubleType
      } else {
        fields.foreach(f => f.dataType match {
          case dt: DecimalType if dt.scale > 6 || dt.precision - dt.scale > 32 =>
            throw new IllegalArgumentException(
              s"profileStats: column '${f.name}' (${dt.simpleString}) does not fit " +
                "the exact DECIMAL(38,6) report — pre-cast it to the precision you want")
          case _ => ()
        })
        D386
      }
    def in(f: StructField): Column = col(s"`${f.name.replace("`", "``")}`")
    val aggs = count(lit(1)).as("__total") +: fields.zipWithIndex.flatMap {
      case (f, i) => Seq(
        count(in(f)).as(s"__n$i"),
        min(in(f)).cast(outType).as(s"__min$i"),
        max(in(f)).cast(outType).as(s"__max$i"))
    }
    val entries = fields.zipWithIndex.map { case (f, i) =>
      struct(lit(f.name).as("column"), col(s"__n$i").as("n_non_null"),
        col(s"__min$i").as("min_val"), col(s"__max$i").as("max_val"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__total"), explode(array(entries: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.n_non_null").as("n_non_null"),
        (col("__total") - col("r.n_non_null")).as("n_nulls"),
        col("r.min_val").as("min_val"), col("r.max_val").as("max_val"))
      .orderBy("column")
  }

  /** Per-group z-score outlier flags ([[graft.Graft.outliers]];
    * `q_profile_outliers`): rows whose value sits ≥ `zmin` population
    * standard deviations from their group's mean. The scale design is
    * stats-JOIN-BACK, not a window: one map-side-combinable aggregate
    * reduces the corpus to a GROUP-COUNT-sized moment table (n, Σx,
    * Σx² — exact DECIMAL(38,6) sums, so partition order can't wiggle
    * the flags), which joins back onto the rows — no corpus-sized sort,
    * no unpartitioned window, and the join side is as small as the
    * number of groups (left to planner stats / AQE to broadcast; the
    * facade does not force a hint because group cardinality is the
    * caller's domain — cf. the simhashBuckets precondition lesson).
    * μ/σ/z derive from the exact moments through the SAME double
    * expression on both engines, so the oracle hash-matches. Three
    * degenerate cases are pinned closed: n counts NON-NULL values
    * (a null must not deflate μ; null-value rows themselves never
    * flag), the variance is clamped at 0 before the sqrt (the 6-dp
    * moment rounding can push a constant group's variance a hair
    * NEGATIVE, and sqrt(-ε) = NaN which Spark's NaN-is-greatest
    * comparison would then flag on EVERY row of the group), and the
    * square is taken in DOUBLE before the decimal cast (a decimal
    * value column would otherwise overflow the decimal multiply to
    * null and silently drop out of Σx²). Groups with n < 2 or σ = 0
    * produce no flags by definition. */
  private[graft] def zscoreOutliers(
      df: DataFrame, keys: Seq[String], value: Column, zmin: Double): DataFrame = {
    require(keys.nonEmpty, "zscoreOutliers needs at least one grouping column")
    require(zmin > 0 && !zmin.isNaN, s"zmin must be positive: $zmin")
    val vd = value.cast(DoubleType)
    val m = df.groupBy(keys.map(col): _*).agg(
      count(value).as("__n"),
      sum(value.cast(D386)).as("__s1"),
      sum((vd * vd).cast(D386)).as("__s2"))
    val mu = col("__s1").cast(DoubleType) / col("__n")
    df.join(m, keys)
      .withColumn("__mu", mu)
      .withColumn("__sig",
        sqrt(greatest(col("__s2").cast(DoubleType) / col("__n") - mu * mu,
          lit(0.0))))
      .withColumn("z", (value - col("__mu")) / col("__sig"))
      .filter(col("__n") >= 2 && col("__sig") > 0 && abs(col("z")) >= zmin)
      .drop("__n", "__s1", "__s2", "__mu", "__sig")
  }

  /** Deterministic per-group MODE ([[graft.Graft.modePerGroup]]): the
    * most frequent `value` per `group`, frequency ties resolved to the
    * SMALLEST value (natural ordering) — where built-in `mode()` picks
    * an arbitrary tied value. One map-side-combinable (group, value)
    * count — the only pass over the input — then two aggs over the
    * counts frame (bounded by |groups|×|distinct values|, never corpus-
    * sized). Output: (group columns..., mode_value, n). */
  private[graft] def modePerGroup(
      df: DataFrame, group: Seq[String], value: String): DataFrame = {
    val g = group.map(col)
    val counts = df.groupBy((g :+ col(value)): _*)
      .agg(count(lit(1)).as("n"))
    counts.groupBy(g: _*).agg(max(col("n")).as("top_n"))
      .join(counts, group)
      .filter(col("n") === col("top_n"))
      .groupBy(g: _*)
      .agg(min(col(value)).as("mode_value"), max(col("n")).as("n"))
  }

  /** Explicitly skew-salted equi-join ([[graft.Graft.saltedJoin]]): the
    * fact side tags salt = xxhash64(saltBy) % salts, the dim side
    * replicates `salts`× (bounded explode), the key widens to
    * (key, salt) — a hot key's rows spread over `salts` reducers.
    * Row-set identical to the plain join for any salts ≥ 1 (every fact
    * row meets exactly one dim copy); `q_join_skew_salted`'s oracle IS
    * the plain join. Dim columns survive; the salt does not. */
  private[graft] def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltBy: String, salts: Int): DataFrame = {
    require(salts >= 1 && salts <= 1024, s"salts out of range: $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column — rename it first")
    val f = fact.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(salts)))
    val dd = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    f.join(dd, f(factKey) === dd(dimKey) && f("__salt") === dd("__salt"))
      .drop("__salt")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------- scans
    QueryDef("q_scan",
      (s, d) => t(s, d, "customer").orderBy("c_custkey"),
      Some("SELECT * FROM customer ORDER BY c_custkey")),

    QueryDef("q_projection",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic
        // lineitem (FIXTURES.md) — order over ALL output columns so the
        // sort is total and the oracle hash is deterministic.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin)),

    // parameterized query — the reference's execute_params
    // (dask_snowflake/core.py:143, tests/test_core.py:73-74) maps to Spark's
    // named-parameter SQL API; binding happens in the engine, not by string
    // interpolation.
    QueryDef("q_filter_param",
      (s, d) => {
        Tables.register(s, d)
        s.sql(
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            |WHERE o_totalprice > :target ORDER BY o_orderkey""".stripMargin,
          Map("target" -> 150000.0))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_totalprice > 150000.0 ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_predicates",
      (s, d) => t(s, d, "orders").filter(
          col("o_orderstatus").isin("F", "P") &&
          col("o_totalprice").between(50000.0, 200000.0) &&
          (col("o_orderpriority").like("1%") || col("o_orderpriority").like("5%")) &&
          col("o_custkey").isNotNull &&
          !(col("o_orderkey") < 0))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderstatus IN ('F','P')
             |  AND o_totalprice BETWEEN 50000.0 AND 200000.0
             |  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%')
             |  AND o_custkey IS NOT NULL
             |  AND NOT (o_orderkey < 0)
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_case_when",
      (s, d) => t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("large").as("bucket"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("returned"))
        .orderBy("l_orderkey", "l_linenumber", "bucket", "returned"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity < 10 THEN 'small'
             |       WHEN l_quantity < 30 THEN 'mid'
             |       ELSE 'large' END AS bucket,
             |  CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS returned
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, bucket, returned""".stripMargin)),

    // empty-result path (dask_snowflake/core.py:277-278): stays a valid,
    // schema-carrying empty DataFrame end-to-end.
    QueryDef("q_empty_result",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") < 0)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey < 0 ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------- joins
    QueryDef("q_join_inner",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "inner")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // explicit broadcast of the small dim side — at 100 TB the fact table
    // never shuffles for this join; the dim ships to every executor.
    QueryDef("q_join_broadcast",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") > 40)
        .select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "p_brand")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey"),
      Some("""SELECT l_orderkey, l_linenumber, p_partkey, p_size, p_brand
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size > 40
             |ORDER BY l_orderkey, l_linenumber, p_partkey""".stripMargin)),

    // large-large: force sort-merge (the 100 TB-safe strategy — both sides
    // shuffle-sort on the key, no single-executor hash table).
    QueryDef("q_join_sortmerge",
      (s, d) => t(s, d, "lineitem").hint("merge")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderdate", "o_orderstatus")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_orderdate, o_orderstatus
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef("q_join_outer",
      (s, d) => {
        val big = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
        t(s, d, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "full_outer")
          .select("c_custkey", "o_orderkey", "o_totalprice")
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM customer
             |FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin)),

    QueryDef("q_join_semi",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q_join_anti",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q_join_cross",
      (s, d) => t(s, d, "region")
        .crossJoin(t(s, d, "nation"))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    // equi + range (interval) join: the equi key keeps it a shuffled
    // hash/merge join at scale; the range predicate is applied post-match.
    QueryDef("q_join_range",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL '90' DAY"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
             |FROM lineitem JOIN orders
             |  ON l_orderkey = o_orderkey
             | AND l_shipdate >= o_orderdate
             | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
             |ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin)),

    // --------------------------------- interval-overlap join (bucketed)
    // pairs of a customer's orders whose FULFILLMENT intervals
    // [orderdate, last shipdate] overlap — the interval×interval join
    // (co-active sessions, overlapping reservations, concurrent spans).
    // The naive form is a per-key theta self-join: fine when entities
    // are small, quadratic on a hot entity. Engine form is the BUCKET
    // decomposition: each interval explodes to the YEAR buckets it
    // covers (bounded by span/width — ≤ 8 here; at scale pick width ≈
    // the median span so replication stays O(1)), pairs join on
    // (entity, bucket) with the exact overlap predicate re-checked,
    // and a distinct collapses pairs found in several shared buckets —
    // a hot entity's pairs spread over its buckets instead of one
    // reducer. The oracle is the PLAIN theta self-join: the rewrite
    // must be row-identical (the q_join_skew_salted proof pattern).
    QueryDef("q_join_interval",
      (s, d) => {
        val itv = t(s, d, "orders")
          .join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey", "o_orderkey", "o_orderdate")
          .agg(max(col("l_shipdate")).as("e"))
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").as("s"), col("e"))
        // the bucketed frame feeds BOTH self-join sides: materialize +
        // cut once (150k rows at sf0.1) so the orders⋈lineitem build
        // isn't executed twice and each side's plan is a one-node scan
        val buckets = itv.withColumn("yr",
          explode(sequence(year(col("s")), year(col("e")))))
          .localCheckpoint(true)
        val a = buckets.select(col("o_custkey"), col("yr"),
          col("o_orderkey").as("ok_a"), col("s").as("s_a"), col("e").as("e_a"))
        val b = buckets.select(col("o_custkey"), col("yr"),
          col("o_orderkey").as("ok_b"), col("s").as("s_b"), col("e").as("e_b"))
        a.join(b, Seq("o_custkey", "yr"))
          .filter(col("ok_a") < col("ok_b") &&
            col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
          .select("o_custkey", "ok_a", "ok_b").distinct()
          .orderBy("o_custkey", "ok_a", "ok_b")
      },
      Some("""WITH itv AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate AS s,
             |    max(l_shipdate) AS e
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2, 3
             |)
             |SELECT a.o_custkey AS o_custkey,
             |  a.o_orderkey AS ok_a, b.o_orderkey AS ok_b
             |FROM itv a JOIN itv b
             |  ON a.o_custkey = b.o_custkey
             | AND a.o_orderkey < b.o_orderkey
             | AND a.s <= b.e AND b.s <= a.e
             |ORDER BY o_custkey, ok_a, ok_b""".stripMargin)),

    // shuffle-hash hint: build a per-partition hash table instead of
    // sorting both sides — wins when one side is modest but above the
    // broadcast threshold
    QueryDef("q_join_shuffle_hash",
      (s, d) => t(s, d, "orders").hint("shuffle_hash")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_name
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // pure theta join (no equi key) → BroadcastNestedLoopJoin; only ever
    // sane when one side is tiny enough to broadcast
    QueryDef("q_join_theta",
      (s, d) => t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") < col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_regionkey")
        .orderBy("n_nationkey", "r_regionkey"),
      Some("""SELECT n_nationkey, n_name, r_regionkey
             |FROM nation JOIN region ON n_regionkey < r_regionkey
             |ORDER BY n_nationkey, r_regionkey""".stripMargin)),

    // ------------------------------------------- bloom-prefiltered join
    // the EXPLICIT runtime-filter pattern: before the fact-fact orderkey
    // shuffle, probe every lineitem against a bloom filter built from the
    // SELECTIVE side's keys — at 100 TB this drops ~4/5 of the fact rows
    // BEFORE they enter the exchange, which is the whole cost of a big
    // join. Spark's InjectRuntimeFilter plants exactly this pair of
    // expressions when its stats thresholds let it; `graft_bloom_agg` /
    // `graft_might_contain` (functions/BloomPrefilter.scala — Spark's own
    // BloomFilterAggregate/BloomFilterMightContain behind registry names)
    // make the plan explicit and threshold-independent. The bloom rides a
    // scalar subquery (the expression requires a CONSTANT filter: one
    // deserialize per task, never per row). False positives are removed
    // by the real join, so the oracle is the PLAIN join — the bloom can
    // only change the plan, never the answer. Sizing: 2^20 est items /
    // 2^23 bits ≈ 1 MB filter, <1% FP at the fixture's urgent-order
    // cardinality; at warehouse scale both dials grow with the creation
    // side, and the filter stays broadcast-sized long past 10^8 keys.
    QueryDef("q_join_bloom",
      (s, d) => {
        Tables.register(s, d)
        graft.functions.BloomPrefilter.register(s)
        s.sql("""SELECT l_returnflag, count(1) AS n_items,
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                |    AS DOUBLE) AS total_price
                |FROM lineitem
                |JOIN (SELECT o_orderkey FROM orders
                |      WHERE o_orderpriority = '1-URGENT') o
                |  ON l_orderkey = o_orderkey
                |WHERE graft_might_contain(
                |  (SELECT graft_bloom_agg(o_orderkey, 1048576L, 8388608L)
                |   FROM orders WHERE o_orderpriority = '1-URGENT'),
                |  l_orderkey)
                |GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_items,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
             |    AS VARCHAR) AS DOUBLE) AS total_price
             |FROM lineitem
             |JOIN (SELECT o_orderkey FROM orders
             |      WHERE o_orderpriority = '1-URGENT') o
             |  ON l_orderkey = o_orderkey
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // scalar subquery through the SQL pass-through surface
    QueryDef("q_subquery_scalar",
      (s, d) => {
        Tables.register(s, d)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // WITH/CTE through the SQL pass-through surface
    QueryDef("q_sql_cte",
      (s, d) => {
        Tables.register(s, d)
        s.sql("""WITH big AS (
                |  SELECT o_custkey, count(1) AS n FROM orders
                |  GROUP BY o_custkey HAVING count(1) >= 3
                |)
                |SELECT c_custkey, c_name, n FROM customer
                |JOIN big ON c_custkey = o_custkey
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH big AS (
             |  SELECT o_custkey, CAST(count(1) AS BIGINT) AS n FROM orders
             |  GROUP BY o_custkey HAVING count(1) >= 3
             |)
             |SELECT c_custkey, c_name, n FROM customer
             |JOIN big ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // PIVOT: wide conditional aggregation. The oracle uses portable
    // conditional aggregation — identical semantics, no dialect PIVOT.
    QueryDef("q_pivot",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(D386)).cast(DoubleType))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(CAST(sum(CASE WHEN l_linestatus = 'F'
             |    THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS VARCHAR)
             |    AS DOUBLE) AS qty_f,
             |  CAST(CAST(sum(CASE WHEN l_linestatus = 'O'
             |    THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS VARCHAR)
             |    AS DOUBLE) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------- aggregates
    // TPC-H Q1 shape. Money sums via DECIMAL(38,6) on BOTH sides so the
    // parallel (order-nondeterministic) summation is still exact.
    QueryDef("q_agg_groupby",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // decimal INSIDE the agg = order-independent exact parallel sum;
          // DOUBLE on the way out = identical representation in DuckDB's
          // pandas export (which turns DECIMAL into float64).
          sum(col("l_quantity").cast(D386)).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(D386)).cast(DoubleType).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D386))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .filter(col("count_order") > 0)
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             |  CAST(count(1) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |HAVING count(1) > 0
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q_agg_global",
      (s, d) => t(s, d, "orders").agg(
        max(col("o_totalprice")).as("max_price"),
        min(col("o_totalprice")).as("min_price"),
        count(lit(1)).as("n_orders")),
      Some("""SELECT max(o_totalprice) AS max_price,
             |       min(o_totalprice) AS min_price,
             |       CAST(count(1) AS BIGINT) AS n_orders
             |FROM orders""".stripMargin)),

    // ------------------------------------------ incremental aggregation
    // materialized-view maintenance: yesterday's ROLLUP merged with
    // today's DELTA must equal the full recompute — the invariant that
    // lets a 100 TB pipeline maintain its aggregates by touching only
    // the new partition. Works because the state is MERGEABLE (sums and
    // counts re-aggregate; avg is DERIVED from merged sums at read time
    // — never averaged averages). The key materializes both partials
    // (historical < cutoff, delta >= cutoff), merges them with a
    // group-sized union + re-agg, and the oracle is the direct full
    // aggregation: hash-equal means the merge law holds on real data.
    // Cost shape: two pushed-filter scans at fixture scale; in
    // production the historical side is the STORED rollup (group-sized,
    // no scan at all) and only the delta scan runs.
    QueryDef("q_agg_incremental",
      (s, d) => {
        val cutoff = lit("1997-01-01").cast("timestamp")
        def partial(f: org.apache.spark.sql.Column) =
          t(s, d, "lineitem").filter(f)
            .groupBy("l_returnflag")
            .agg(sum(col("l_quantity").cast(D386)).as("sum_qty"),
              count(lit(1)).as("n"))
        partial(col("l_shipdate") < cutoff)
          .unionAll(partial(col("l_shipdate") >= cutoff))
          .groupBy("l_returnflag")
          .agg(sum(col("sum_qty")).as("merged_qty"), sum(col("n")).as("n"))
          .select(col("l_returnflag"),
            col("merged_qty").cast(DoubleType).as("sum_qty"), col("n"),
            (col("merged_qty").cast(DoubleType) / col("n")).as("avg_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS sum_qty,
             |  CAST(count(1) AS BIGINT) AS n,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) / count(1) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------------------ trimmed mean
    // the outlier-robust location estimate: mean of the values strictly
    // inside [p10, p90] — what a spend/latency dashboard shows when the
    // tails are garbage. Same two-pass shape as q_profile_equidepth:
    // exact cutpoints from [[histQuantiles]] (value-grain histogram +
    // streaming-frame rank scan — no unbounded Percentile buffer;
    // round(…,6) — engine-identical boundaries), broadcast back, then
    // an exact-decimal mean over the survivors in a map-side-combined
    // pass. Never a sort of the fact.
    QueryDef("q_agg_trimmed_mean",
      (s, d) => {
        val cuts = histQuantiles(t(s, d, "orders").select("o_totalprice"),
          "o_totalprice", Nil, Seq(0.1 -> "lo", 0.9 -> "hi"))
        // micro-unit integer mean: per-row round(price·1e6) is the same
        // double→integer on both engines, the DECIMAL(38,0) sum is exact
        // (the 10× replica already puts a plain BIGINT sum at ~7.5e18 of
        // int64's 9.2e18 — the next rung would silently wrap under
        // Spark's non-ANSI sum, so the accumulator is 128-bit like
        // q_agg_weighted_avg's), and the floor division is exact — no
        // decimal→double conversion, which DOUBLE-ROUNDS
        // (int128→double→÷10^k) in DuckDB once the scaled sum passes
        // 2^53 (the 10×-scale run caught the last-ulp drift)
        t(s, d, "orders").select("o_totalprice").join(broadcast(cuts))
          .filter(col("o_totalprice") > col("lo") &&
            col("o_totalprice") < col("hi"))
          .agg(count(lit(1)).as("n_kept"),
            sum(expr("CAST(round(o_totalprice * 1e6) AS BIGINT)")
              .cast(D380)).as("s6"))
          .select(col("n_kept"),
            expr("CAST(s6 div n_kept AS BIGINT)").as("trimmed_mean_e6"))
      },
      Some("""WITH cuts AS (
             |  SELECT round(quantile_cont(o_totalprice, 0.1), 6) AS lo,
             |    round(quantile_cont(o_totalprice, 0.9), 6) AS hi
             |  FROM orders
             |)
             |SELECT n_kept, CAST(s6 // n_kept AS BIGINT) AS trimmed_mean_e6
             |FROM (
             |  SELECT CAST(count(1) AS BIGINT) AS n_kept,
             |    sum(CAST(round(o_totalprice * 1e6) AS HUGEINT)) AS s6
             |  FROM orders, cuts
             |  WHERE o_totalprice > lo AND o_totalprice < hi)""".stripMargin)),

    // ------------------------------- median absolute deviation (MAD)
    // the robust SCALE estimate next to the trimmed mean's location:
    // median(|x − median(x)|), per order status. Two [[histQuantiles]]
    // passes (each group's median broadcast back between them — no
    // unbounded Percentile buffer in either), both rounded to the
    // shared 6-decimal boundary so the second pass's deviations are
    // bit-identical inputs on both engines. Group count bounds every
    // intermediate; the fact never sorts globally. The (med, mad)
    // frame itself is the registry-cached [[ordersMadByStatus]],
    // shared with q_profile_outliers_robust.
    QueryDef("q_agg_mad",
      (s, d) => ordersMadByStatus(s, d)
        .select("o_orderstatus", "mad")
        .orderBy("o_orderstatus"),
      Some("""WITH med AS (
             |  SELECT o_orderstatus AS ms,
             |    round(quantile_cont(o_totalprice, 0.5), 6) AS med
             |  FROM orders GROUP BY 1
             |), dev AS (
             |  SELECT o_orderstatus,
             |    round(abs(o_totalprice - med), 6) AS dev
             |  FROM orders JOIN med ON o_orderstatus = ms
             |)
             |SELECT o_orderstatus, round(quantile_cont(dev, 0.5), 6) AS mad
             |FROM dev GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------ exact weighted average
    // Σ(w·v)/Σw per group — the unit-price / blended-rate report. Both
    // sums exact DECIMAL(38,6) (the per-row product is one IEEE double
    // multiply, identical text both engines), ONE map-side-combinable
    // agg, division once per output row in double. The naive
    // avg(v * w / total) forms would each smuggle in an order-dependent
    // float accumulation; this is the only shape that hashes across
    // engines.
    QueryDef("q_agg_weighted_avg",
      // micro-unit integer ratio: per-row round(v·1e6) is engine-exact,
      // the DECIMAL(38,0) sums are exact integers (the weighted value
      // sum passes int64 at 10× scale), and the final `div` is an exact
      // integer floor — no decimal→double conversion anywhere (DuckDB
      // double-rounds int128→double→÷10^k past 2^53; caught at 10×)
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(expr("CAST(round(l_quantity * l_extendedprice * 1e6) AS BIGINT)")
            .cast(D380)).as("wv6"),
          sum(expr("CAST(round(l_quantity * 1e6) AS BIGINT)")
            .cast(D380)).as("w6"))
        .select(col("l_returnflag"),
          expr("CAST((wv6 * 1000000) div w6 AS BIGINT)")
            .as("avg_price_per_unit_e6"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(round(l_quantity * l_extendedprice * 1e6)
             |        AS HUGEINT)) * 1000000
             |    // sum(CAST(round(l_quantity * 1e6) AS HUGEINT))
             |    AS BIGINT) AS avg_price_per_unit_e6
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------- period-over-period movers
    // "who moved the most" — each supplier's year-over-year revenue
    // delta, top 20 gainers: the trend-report shape (grouped rollup →
    // per-entity ordered lag → ranked deltas). Plan contract: the fact
    // reduces to (supplier, year) grain in ONE map-side-combined agg
    // BEFORE any window — the lag runs over the tiny rollup (suppliers
    // × years), never raw lineitems; suppliers with no prior year drop
    // (lag NULL). Deltas stay exact DECIMAL until the final cast, and
    // (supplier, year) is unique so the top-k order is total.
    QueryDef("q_trend_movers",
      (s, d) => {
        val w = Window.partitionBy("l_suppkey").orderBy("yr")
        t(s, d, "lineitem")
          .groupBy(col("l_suppkey"), year(col("l_shipdate")).as("yr"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(D386)).as("rev"))
          .withColumn("prev", lag(col("rev"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("l_suppkey"), col("yr"),
            col("rev").cast(DoubleType).as("revenue"),
            (col("rev") - col("prev")).cast(DoubleType).as("delta"))
          .orderBy(col("delta").desc, col("l_suppkey"), col("yr"))
          .limit(20)
      },
      Some("""WITH rollup_sy AS (
             |  SELECT l_suppkey, year(l_shipdate) AS yr,
             |    sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(38,6))) AS rev
             |  FROM lineitem GROUP BY 1, 2
             |), lagged AS (
             |  SELECT l_suppkey, yr, rev,
             |    lag(rev) OVER (PARTITION BY l_suppkey ORDER BY yr) AS prev
             |  FROM rollup_sy
             |)
             |SELECT l_suppkey, yr, CAST(rev AS DOUBLE) AS revenue,
             |  CAST(rev - prev AS DOUBLE) AS delta
             |FROM lagged WHERE prev IS NOT NULL
             |ORDER BY delta DESC, l_suppkey, yr
             |LIMIT 20""".stripMargin)),

    // -------------------------------------------- boolean aggregates
    // EVERY / ANY (bool_and / bool_or) — the assertion-over-a-group
    // family data-quality checks are written in ("did every order in
    // this bucket pass?"). Mergeable, order-free, exact — like the
    // bitwise family, zero cross-engine drift surface.
    QueryDef("q_agg_bool",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("every(o_totalprice > 0)").as("all_positive"),
          expr("any(o_orderpriority = '1-URGENT')").as("has_urgent"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  bool_and(o_totalprice > 0) AS all_positive,
             |  bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // --------------------------------------------- bitwise aggregates
    // BIT_OR / BIT_AND / BIT_XOR per group — the flag-accumulation /
    // bitmap-rollup aggregates (mergeable, order-free, exact integers:
    // the rare aggregate family with literally zero cross-engine drift
    // surface). Folded over the low byte of the order key so every
    // group exercises real bit mixing.
    QueryDef("q_agg_bitwise",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderstatus"), (col("o_orderkey") % 256).as("b"))
        .groupBy("o_orderstatus")
        .agg(expr("bit_or(b)").as("flags_or"),
          expr("bit_and(b)").as("flags_and"),
          expr("bit_xor(b)").as("flags_xor"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  bit_or(o_orderkey % 256) AS flags_or,
             |  bit_and(o_orderkey % 256) AS flags_and,
             |  bit_xor(o_orderkey % 256) AS flags_xor
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------- bitwise scalars
    // row-local shift/and/or/xor — the bit-packing primitives under
    // every sketch/fingerprint here (simhash, morton, codes); exact on
    // any engine. One narrow scan, pure codegen arithmetic, no shuffle
    // except the output sort.
    QueryDef("q_scalar_bitwise",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"),
          expr("shiftleft(c_custkey, 3)").as("shl"),
          expr("shiftright(c_custkey, 2)").as("shr"),
          expr("c_custkey & 255").as("band"),
          expr("c_custkey | 4096").as("bor"),
          expr("c_custkey ^ 1365").as("bxor"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  c_custkey << 3 AS shl,
             |  c_custkey >> 2 AS shr,
             |  c_custkey & 255 AS band,
             |  c_custkey | 4096 AS bor,
             |  xor(c_custkey, 1365) AS bxor
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------ incremental JOIN maintenance
    // the join companion of q_agg_incremental's merge law: with A/B
    // split into history + delta, (A ∪ ΔA) ⋈ (B ∪ ΔB) equals the union
    // of the four partial joins — the algebra an incremental pipeline
    // uses to join a new partition against a standing table WITHOUT
    // re-joining history⋈history (in production that term is the stored
    // join; only the two delta terms and the tiny ΔA⋈ΔB run). The key
    // computes the four-way union and aggregates it; the oracle is the
    // direct full join — hash-equal means the decomposition law holds
    // on real data, duplicates and all. Split on a hash of the key so
    // both deltas are non-trivial.
    QueryDef("q_join_incremental",
      (s, d) => {
        def ord(newSide: Boolean) = t(s, d, "orders")
          .filter((col("o_orderkey") % 10 >= 7) === newSide)
          .select("o_orderkey", "o_orderpriority")
        def li(newSide: Boolean) = t(s, d, "lineitem")
          .filter((col("l_orderkey") % 7 >= 5) === newSide)
          .select("l_orderkey", "l_quantity")
        val parts = for (a <- Seq(false, true); b <- Seq(false, true))
          yield ord(a).join(li(b), col("o_orderkey") === col("l_orderkey"))
        parts.reduce(_ unionAll _)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(D386)).cast(DoubleType).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n,
             |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS sum_qty
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    QueryDef("q_agg_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // HLL sketch VALUES differ between engines (different register
    // layouts), so the raw approx count has no cross-engine oracle. What
    // IS deterministic on both sides: each engine's own sketch vs the
    // exact count. Emitting (exact, own-sketch-within-5%) makes the row
    // hash-comparable — each engine attests its estimator's error bound
    // and the outputs agree iff both sketches are accurate. Spark's
    // default rsd is 0.05 (~2-3% typical); DuckDB measured ≤0.5% here.
    QueryDef("q_agg_approx_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          (abs(approx_count_distinct(col("l_partkey")) -
              countDistinct(col("l_partkey"))).cast(DoubleType) /
            countDistinct(col("l_partkey")).cast(DoubleType) <= 0.05)
            .as("approx_within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
             |      - CAST(count(DISTINCT l_partkey) AS DOUBLE))
             |    / CAST(count(DISTINCT l_partkey) AS DOUBLE) <= 0.05
             |    AS approx_within_5pct
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // approx percentile, same contract as q_agg_approx_distinct: each
    // engine runs ITS OWN sketch (Spark QuantileSummaries accuracy=1e4,
    // DuckDB t-digest) and emits the exact value plus a within-5%
    // boolean — the sketches need not agree with each other, only each
    // stay inside the documented bound (both are ≲1% on this data, so
    // the bound carries ~5× headroom). The mergeable sketch is the
    // 100 TB point: percentile state combines map-side like a sum.
    // The exact side comes from [[histQuantiles]] (value-grain
    // histogram + rank scan), so no unbounded Percentile buffer
    // appears in this plan either.
    QueryDef("q_agg_approx_percentile",
      (s, d) => {
        val ex = histQuantiles(
          t(s, d, "lineitem").select("l_returnflag", "l_extendedprice"),
          "l_extendedprice", Seq("l_returnflag"), Seq(0.5 -> "exact_p50"))
        val ap = t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)")
            .as("__ap50"))
        ex.join(ap, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_p50"),
            (abs(col("__ap50") - col("exact_p50")) / col("exact_p50")
              <= 0.05).as("approx_within_5pct"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
             |  abs(approx_quantile(l_extendedprice, 0.5)
             |      - quantile_cont(l_extendedprice, 0.5))
             |    / quantile_cont(l_extendedprice, 0.5) <= 0.05
             |    AS approx_within_5pct
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // --------------------------- mergeable HLL sketch union (partials)
    // the INCREMENTAL distinct-count law, sketch edition: per-slice
    // Datasketches HLL sketches (here: lineitem split at a shipdate
    // cutoff — yesterday's partition and today's) UNION to the same
    // estimate as sketching the whole corpus, so a 100 TB pipeline
    // counts distincts by merging per-partition sketches instead of
    // re-scanning history — the q_agg_incremental law carried to
    // approximate aggregates. Oracle contract is the attestation
    // pattern (q_agg_approx_distinct): both engines emit the exact
    // distinct count plus a within-2% boolean for their own sketch
    // machinery (Spark: the UNIONED partials; DuckDB: its one-shot
    // approx_count_distinct) — the sketches need not agree with each
    // other, only each stay inside the bound, and the Spark side
    // additionally proves union-of-partials ≡ whole-corpus sketch
    // EXACTLY (same binary merge law the sketch guarantees).
    QueryDef("q_agg_sketch_union",
      (s, d) => {
        val cutoff = lit("1997-01-01").cast("timestamp")
        val li = t(s, d, "lineitem")
        def sk(f: org.apache.spark.sql.Column) = li.filter(f)
          .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
        val merged = sk(col("l_shipdate") < cutoff)
          .unionAll(sk(col("l_shipdate") >= cutoff))
          .agg(expr("hll_union_agg(sk, true)").as("sku"))
          .select(expr("hll_sketch_estimate(sku)").as("union_est"))
        val whole = li.agg(
          expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))")
            .as("whole_est"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        whole.crossJoin(broadcast(merged))
          .select(col("exact_parts"),
            (abs(col("union_est") - col("exact_parts").cast(DoubleType)) /
              col("exact_parts").cast(DoubleType) <= 0.05)
              .as("union_within_5pct"),
            (abs(col("union_est") - col("whole_est")) /
              col("whole_est") <= 0.02).as("union_tracks_whole"))
      },
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
             |    AS exact_parts,
             |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
             |      - CAST(count(DISTINCT l_partkey) AS DOUBLE))
             |    / CAST(count(DISTINCT l_partkey) AS DOUBLE) <= 0.05
             |    AS union_within_5pct,
             |  true AS union_tracks_whole
             |FROM lineitem""".stripMargin)),

    // ------------------------- theta sketch set ops (overlap/diff)
    // the approximate SET-OVERLAP primitive: how many distinct parts
    // traded in BOTH halves of the time range, and in the first half
    // only — via Datasketches THETA sketches, whose intersection /
    // difference are sketch-sized operations where the exact answer
    // needs a distinct-distinct join. At 100 TB this is how source
    // overlap (q_source_overlap's exact form) is estimated across
    // hundreds of slice pairs without N² joins: one sketch per slice,
    // set algebra on the sketches. Attestation oracle (the
    // q_agg_approx_distinct contract): exact set-op counts computed
    // identically on both engines, Spark attests its sketch estimates
    // within 5%, DuckDB (no theta sketches) attests true.
    QueryDef("q_agg_sketch_intersect",
      (s, d) => {
        val cutoff = lit("1997-01-01").cast("timestamp")
        val li = t(s, d, "lineitem")
        val ea = li.filter(col("l_shipdate") < cutoff).select("l_partkey")
        val eb = li.filter(col("l_shipdate") >= cutoff).select("l_partkey")
        val ests = ea.agg(expr("theta_sketch_agg(l_partkey)").as("ska"))
          .crossJoin(eb.agg(expr("theta_sketch_agg(l_partkey)").as("skb")))
          .select(
            expr("theta_sketch_estimate(theta_intersection(ska, skb))")
              .as("est_both"),
            expr("theta_sketch_estimate(theta_difference(ska, skb))")
              .as("est_only_a"))
        val exact = ea.intersect(eb).agg(count(lit(1)).as("n_both"))
          .crossJoin(ea.distinct().exceptAll(eb.distinct())
            .agg(count(lit(1)).as("n_only_a")))
        exact.crossJoin(broadcast(ests))
          .select(col("n_both"), col("n_only_a"),
            (abs(col("est_both") - col("n_both").cast(DoubleType)) /
              col("n_both").cast(DoubleType) <= 0.05)
              .as("inter_within_5pct"),
            (abs(col("est_only_a") - col("n_only_a").cast(DoubleType)) /
              greatest(col("n_only_a").cast(DoubleType), lit(1.0)) <= 0.05)
              .as("diff_within_5pct"))
      },
      Some("""WITH a AS (
             |  SELECT DISTINCT l_partkey FROM lineitem
             |  WHERE l_shipdate < TIMESTAMP '1997-01-01'
             |), b AS (
             |  SELECT DISTINCT l_partkey FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |)
             |SELECT
             |  CAST((SELECT count(1) FROM a WHERE l_partkey IN
             |    (SELECT l_partkey FROM b)) AS BIGINT) AS n_both,
             |  CAST((SELECT count(1) FROM a WHERE l_partkey NOT IN
             |    (SELECT l_partkey FROM b)) AS BIGINT) AS n_only_a,
             |  true AS inter_within_5pct,
             |  true AS diff_within_5pct""".stripMargin)),

    // ----------------------- mergeable KLL quantile partials (sketch)
    // the incremental QUANTILE law, completing the sketch family next
    // to q_agg_sketch_union (distincts) and q_agg_sketch_intersect
    // (set ops): per-slice Datasketches KLL sketches merge
    // (`kll_merge_agg_double`) to a whole-corpus quantile estimate —
    // how a 100 TB pipeline keeps a running p50 by merging
    // per-partition sketches instead of re-scanning history, and the
    // mergeable complement to [[histQuantiles]]' exact path (which the
    // exact column here rides). Attestation contract: exact p50
    // identical on both engines; Spark attests its MERGED sketch
    // within 5% (k=800 ⇒ ~0.4% rank error), DuckDB its own t-digest.
    QueryDef("q_agg_sketch_quantile",
      (s, d) => {
        val li = t(s, d, "lineitem")
        // both partition sketches from ONE fact scan (r17 optimization
        // round; was two filtered scans): the KLL aggregate ignores
        // NULLs, so the CASE-gated columns feed each sketch exactly the
        // rows its filter selected, in the same scan order — the merged
        // sketch is built from the identical two inputs.
        def sk(cmp: String) = expr(
          s"kll_sketch_agg_double(CASE WHEN l_shipdate $cmp " +
            "TIMESTAMP '1997-01-01' THEN l_extendedprice END, 800)")
        val merged = li.agg(sk("<").as("ska"), sk(">=").as("skb"))
          .select(explode(array(col("ska"), col("skb"))).as("sk"))
          .agg(expr("kll_merge_agg_double(sk, 800)").as("skm"))
          .select(expr("kll_sketch_get_quantile_double(skm, 0.5)")
            .as("est_p50"))
        val exact = histQuantiles(li.select("l_extendedprice"),
          "l_extendedprice", Nil, Seq(0.5 -> "exact_p50"))
        exact.crossJoin(broadcast(merged))
          .select(col("exact_p50"),
            (abs(col("est_p50") - col("exact_p50")) / col("exact_p50")
              <= 0.05).as("merged_within_5pct"))
      },
      Some("""SELECT round(quantile_cont(l_extendedprice, 0.5), 6)
             |    AS exact_p50,
             |  abs(approx_quantile(l_extendedprice, 0.5)
             |      - quantile_cont(l_extendedprice, 0.5))
             |    / quantile_cont(l_extendedprice, 0.5) <= 0.05
             |    AS merged_within_5pct
             |FROM lineitem""".stripMargin)),

    QueryDef("q_agg_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(D386)).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    QueryDef("q_agg_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(D386)).cast(DoubleType).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(count(1) AS BIGINT) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // GROUPING SETS — the general form rollup/cube specialize; arbitrary
    // grouping combinations in ONE pass (Spark expands to a single
    // aggregate with a grouping-id column, not N scans). The SAME ANSI
    // string runs verbatim on both engines — one definition, so the two
    // sides can never drift; nulls-first total order like the rollup key.
    QueryDef("q_agg_grouping_sets",
      (s, d) => {
        Tables.register(s, d)
        s.sql(groupingSetsSql)
      },
      Some(groupingSetsSql)),

    // distribution windows: percent_rank / cume_dist — both are pure
    // integer-ratio doubles ((rank-1)/(n-1), rank/n) so the engines
    // divide the same exact integers → identical doubles before rounding
    QueryDef("q_window_percentile_rank",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders").select(
            col("o_orderkey"), col("o_orderstatus"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // avg/stddev: explicit sum/count arithmetic so both engines divide the
    // same exact decimal sum — engine avg() scale/rounding semantics differ
    QueryDef("q_agg_stats",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (sum(col("l_quantity").cast(D386)).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_discount")), 6).as("var_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(1) AS avg_qty,
             |  round(stddev_samp(l_discount), 6) AS sd_disc,
             |  round(var_samp(l_discount), 6) AS var_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // correlation WITHOUT the order-dependent streaming estimator:
    // Spark's corr() merges Welford-style partials in task-completion
    // order, so its low bits wiggle run to run — instead the five
    // moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT decimals
    // (map-side-combinable, order-free) and the one float expression on
    // top is written identically in both engines. The moment-sum shape
    // is also the 100 TB design: five decimal columns through one
    // hash-agg, mergeable across any partitioning.
    QueryDef("q_agg_corr",
      (s, d) => {
        val x = col("l_quantity"); val y = col("l_extendedprice")
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(x.cast(D386)).as("sx"),
            sum(y.cast(D386)).as("sy"),
            sum((x * y).cast(D386)).as("sxy"),
            sum((x * x).cast(D386)).as("sxx"),
            sum((y * y).cast(D386)).as("syy"))
          .select(col("l_returnflag"), col("n"),
            expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  |   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  |""".stripMargin).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, count(1) AS n,
             |    sum(CAST(l_quantity AS DECIMAL(38,6))) AS sx,
             |    sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS sy,
             |    sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS sxy,
             |    sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS sxx,
             |    sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS syy
             |  FROM lineitem GROUP BY l_returnflag
             |)
             |SELECT l_returnflag, n,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             |    AS corr_qty_price
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // the skew pattern, semantics-preserving: two-phase salted aggregation
    // (partial by (key, salt), final by key). At 100 TB a hot key's rows
    // spread over `salts` reducers in phase 1; phase 2 merges `salts` tiny
    // partials. Equality with the plain GROUP BY is the oracle.
    QueryDef("q_agg_salted",
      (s, d) => {
        val salts = 8
        t(s, d, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(salts)))
          .groupBy("l_returnflag", "salt")
          .agg(sum(col("l_quantity").cast(D386)).as("part_qty"),
            count(lit(1)).as("part_n"))
          .groupBy("l_returnflag")
          .agg(sum(col("part_qty")).cast(DoubleType).as("sum_qty"),
            sum(col("part_n")).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------- one-pass profiling histogram
    // equi-width histogram over a fact column — the data-profiling shape
    // (understand a 100 TB table before querying it): ONE hash-agg pass,
    // output bounded by the bin count (~22 rows) whatever the input size,
    // partial aggregation map-side so the shuffle carries bins not rows.
    // Bin id by floor(x / width) — pure double division + floor, identical
    // IEEE ops both engines, no rounding caveat. Per-bin min/max double
    // back the bin edges for a profiler UI.
    QueryDef("q_profile_histogram",
      (s, d) => histogram(t(s, d, "lineitem"), col("l_extendedprice"), 5000.0),
      Some("""SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
             |  count(1) AS n_rows,
             |  min(l_extendedprice) AS bin_min,
             |  max(l_extendedprice) AS bin_max
             |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin)),

    // -------------------------------------- one-pass multi-column profile
    // the other profiling shape: every column's (counts, min, max) from
    // ONE scan — 4 aggregates per column fused in a single global agg
    // whose shuffle carries one row, then an explode unpivot. The double
    // columns put this key on the DOUBLE report path (exact here:
    // l_orderkey stays far below 2^53); the all-integral case takes the
    // exact DECIMAL(38,6) path, spec'd in GraftSpec. The oracle replays
    // as a UNION ALL of per-column selects.
    QueryDef("q_profile_stats",
      (s, d) => profileStats(t(s, d, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")),
      Some("""WITH b AS (SELECT * FROM lineitem)
             |SELECT 'l_discount' AS "column", count(l_discount) AS n_non_null,
             |  count(1) - count(l_discount) AS n_nulls,
             |  CAST(min(l_discount) AS DOUBLE) AS min_val,
             |  CAST(max(l_discount) AS DOUBLE) AS max_val FROM b
             |UNION ALL
             |SELECT 'l_extendedprice', count(l_extendedprice),
             |  count(1) - count(l_extendedprice),
             |  CAST(min(l_extendedprice) AS DOUBLE),
             |  CAST(max(l_extendedprice) AS DOUBLE) FROM b
             |UNION ALL
             |SELECT 'l_orderkey', count(l_orderkey),
             |  count(1) - count(l_orderkey),
             |  CAST(min(l_orderkey) AS DOUBLE),
             |  CAST(max(l_orderkey) AS DOUBLE) FROM b
             |UNION ALL
             |SELECT 'l_quantity', count(l_quantity),
             |  count(1) - count(l_quantity),
             |  CAST(min(l_quantity) AS DOUBLE),
             |  CAST(max(l_quantity) AS DOUBLE) FROM b
             |ORDER BY "column"""".stripMargin)),

    // ------------------------------------------- per-group outlier flags
    // the third profiling shape (histogram = distribution, stats =
    // bounds, THIS = anomalies): events whose value sits ≥ 3 population
    // σ from their event_type's mean. Moments exact in DECIMAL(38,6),
    // the z expression written identically on both engines (see
    // zscoreOutliers scaladoc); events.value is exponential-ish in the
    // fixture, so ~190 rows flag at sf0.01 — a real report, not an
    // empty-result degenerate.
    // ----------------------------------- robust (MAD) outlier flags
    // the z-score report's ROBUST sibling: modified z-score
    // 0.6745·|x − median| / MAD — immune to the outliers' own pull on
    // mean/σ, the estimator a curation pipeline actually wants on
    // heavy-tailed spend/latency columns. The (median, MAD) frame is
    // the registry-cached [[ordersMadByStatus]] (shared with
    // q_agg_mad — the two histQuantiles passes run once per session),
    // broadcast back for a row-local filter: the fact shuffles ZERO
    // times beyond the quantile histograms. Threshold 1.25 (not the
    // textbook 3.5) because the
    // synthetic uniform-ish totalprice has thin tails — max modz ≈
    // 1.35; the expression is identical double text on both engines so
    // the cut is deterministic. Deviations round(…,6) before BOTH the
    // MAD histogram and the z numerator — one shared lattice.
    QueryDef("q_profile_outliers_robust",
      (s, d) => {
        val mm = ordersMadByStatus(s, d)
        t(s, d, "orders")
          .join(broadcast(mm), Seq("o_orderstatus"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("mad"),
            round(abs(col("o_totalprice") - col("med")), 6).as("dev"))
          .filter(expr("0.6745 * dev / mad > 1.25"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"),
            round(expr("0.6745 * dev / mad"), 6).as("mod_z"))
          .orderBy("o_orderkey")
      },
      Some("""WITH med AS (
             |  SELECT o_orderstatus AS ms,
             |    round(quantile_cont(o_totalprice, 0.5), 6) AS med
             |  FROM orders GROUP BY 1
             |), dev AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice,
             |    round(abs(o_totalprice - med), 6) AS dev
             |  FROM orders JOIN med ON o_orderstatus = ms
             |), mad AS (
             |  SELECT o_orderstatus AS ms,
             |    round(quantile_cont(dev, 0.5), 6) AS mad
             |  FROM dev GROUP BY 1
             |)
             |SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  round(0.6745 * dev / mad, 6) AS mod_z
             |FROM dev JOIN mad ON o_orderstatus = ms
             |WHERE 0.6745 * dev / mad > 1.25
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_profile_outliers",
      (s, d) => zscoreOutliers(
          t(s, d, "events").select("event_id", "event_type", "value"),
          Seq("event_type"), col("value"), 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 6).as("z"))
        .orderBy("event_id"),
      Some("""WITH m AS (
             |  SELECT event_type, count(value) AS n,
             |    sum(CAST(value AS DECIMAL(38,6))) AS s1,
             |    sum(CAST(value * value AS DECIMAL(38,6))) AS s2
             |  FROM events GROUP BY event_type
             |), j AS (
             |  SELECT event_id, event_type, value,
             |    (value - CAST(s1 AS DOUBLE) / n)
             |      / sqrt(greatest(CAST(s2 AS DOUBLE) / n
             |          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) AS z,
             |    n,
             |    sqrt(greatest(CAST(s2 AS DOUBLE) / n
             |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) AS sig
             |  FROM events JOIN m USING (event_type)
             |)
             |SELECT event_id, event_type, value, round(z, 6) AS z
             |FROM j
             |WHERE n >= 2 AND sig > 0 AND abs(z) >= 3.0
             |ORDER BY event_id""".stripMargin)),

    // ----------------------------------------------------------- unpivot
    // the native melt operator (Dataset.unpivot — Spark's UNPIVOT):
    // wide → long over the four money/measure columns of a lineitem
    // slice, the reshape every metrics pipeline runs before a
    // per-metric aggregation. Row-local and shuffle-free — the only
    // cost is the ×4 row inflation the semantics demand; column
    // pruning still reaches the scan (only the id + 4 value columns
    // are read). The oracle replays the exact same reshape as a
    // UNION ALL of one SELECT per measure — engine-portable and
    // byte-identical since no arithmetic happens at all. The output
    // sorts by ALL columns ((l_orderkey, l_linenumber) is NOT unique
    // in the fixture — FIXTURES.md).
    QueryDef("q_unpivot",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value"),
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
             |  SELECT l_orderkey, l_linenumber,
             |    'l_quantity' AS metric, l_quantity AS value
             |  FROM lineitem WHERE l_orderkey % 100 = 0
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber,
             |    'l_extendedprice', l_extendedprice
             |  FROM lineitem WHERE l_orderkey % 100 = 0
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |  FROM lineitem WHERE l_orderkey % 100 = 0
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
             |  FROM lineitem WHERE l_orderkey % 100 = 0
             |)
             |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin)),

    // ------------------------------------------------------------ upsert
    // MERGE INTO semantics as a plain join ([[graft.Graft.upsert]]):
    // a changed-rows batch (updates + inserts) merged into the corpus
    // by key — matched rows take the batch version, unmatched corpus
    // rows survive, unmatched batch rows insert. The maintenance op a
    // continuously-refreshed warehouse stage runs every cycle; Spark
    // has no MERGE without a table format, so the engine expresses it
    // as ONE full-outer join + per-column coalesce — a single
    // key-shuffle of each side at any scale (both sides fact-sized:
    // no broadcast assumption). The batch here is derived
    // deterministically from the corpus (quality-bumped updates for
    // doc_id%10=0, re-keyed inserts for doc_id%7=3) so the oracle
    // rebuilds it exactly.
    QueryDef("q_upsert",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select("doc_id", "lang", "n_chars")
        val updates = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
        val inserts = docs.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            col("n_chars"))
        graft.Graft.upsert(docs, updates.unionAll(inserts), Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN b.doc_id IS NOT NULL THEN b.lang ELSE c.lang END
             |    AS lang,
             |  CASE WHEN b.doc_id IS NOT NULL THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------- MERGE INTO (SQL text)
    // the same upsert through the SQL-TEXT front door
    // ([[graft.SqlText.sql]]): the statement a warehouse user actually
    // types (reference UX: query-string-first, core.py:143) parsed and
    // rewritten onto [[graft.Graft.upsert]] — one full-outer key
    // shuffle, identical plan and identical oracle as q_upsert: two
    // entry paths, one truth.
    QueryDef("q_sql_merge",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("merge_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("merge_batch")
        graft.SqlText.sql(s,
            """MERGE INTO merge_corpus AS c USING merge_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN b.doc_id IS NOT NULL THEN b.lang ELSE c.lang END
             |    AS lang,
             |  CASE WHEN b.doc_id IS NOT NULL THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------- partial-update MERGE (SQL text)
    // `WHEN MATCHED THEN UPDATE SET col = s.col` with an explicit
    // assignment list ([[graft.Graft.upsertPartial]] via
    // [[graft.SqlText.sql]]): matched rows take the batch value ONLY
    // for the SET columns and keep everything else; inserts are still
    // full-row. The batch deliberately carries a poison lang ('zz') on
    // its update rows — the oracle proves the unlisted column is NOT
    // overwritten on matches while inserts keep their own lang. Same
    // single full-outer key shuffle as q_upsert/q_sql_merge.
    QueryDef("q_sql_merge_partial",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("mergep_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), lit("zz").as("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("mergep_batch")
        graft.SqlText.sql(s,
            """MERGE INTO mergep_corpus AS c USING mergep_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED THEN UPDATE SET n_chars = b.n_chars
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, 'zz' AS lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN b.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
             |         THEN c.lang
             |       WHEN b.doc_id IS NOT NULL THEN b.lang
             |       ELSE c.lang END AS lang,
             |  CASE WHEN b.doc_id IS NOT NULL THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------- DELETE-action MERGE (SQL text)
    // `WHEN MATCHED AND <pred> THEN DELETE` + `WHEN NOT MATCHED THEN
    // INSERT *` — the most common warehouse CDC verb pair
    // ([[graft.Graft.mergeDelete]] via [[graft.SqlText.sql]]). The
    // batch carries three populations: matched rows with LARGER
    // n_chars (gate true → the corpus row is deleted), matched rows
    // with SMALLER n_chars (gate false → the corpus row survives
    // untouched), and unmatched rows (inserted whole). Engine form is
    // two anti key joins — one key shuffle per side, no fan-out even
    // on duplicate batch keys; the oracle replays the same semantics
    // as NOT EXISTS anti joins.
    QueryDef("q_sql_merge_delete",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("merged_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id"), col("lang"),
              (col("n_chars") - 1000L).as("n_chars")))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("merged_batch")
        graft.SqlText.sql(s,
            """MERGE INTO merged_corpus AS c USING merged_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED AND b.n_chars > c.n_chars THEN DELETE
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id, lang, n_chars - 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT doc_id, lang, n_chars FROM corpus c
             |WHERE NOT EXISTS (SELECT 1 FROM batch b
             |  WHERE b.doc_id = c.doc_id AND b.n_chars > c.n_chars)
             |UNION ALL
             |SELECT doc_id, lang, n_chars FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c
             |  WHERE c.doc_id = b.doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------- multi-branch MERGE (SQL text)
    // MULTIPLE `WHEN MATCHED` branches evaluated FIRST-MATCH-WINS —
    // Snowflake's branch-order semantics through the front door
    // ([[graft.Graft.merge]] via [[graft.SqlText.sql]]). Three matched
    // populations pin the ordering: batch rows with LARGER n_chars hit
    // branch 1 (DELETE), SMALLER n_chars hit branch 2 (UPDATE SET
    // n_chars only — the poison 'zz' lang proves the later ungated
    // lang-branch does NOT also fire), EQUAL n_chars fall through to
    // the ungated branch 3 (UPDATE SET lang); unmatched batch rows
    // insert whole. Engine form: still ONE full-outer key shuffle —
    // the branch choice is a cascaded `when` chain, DELETE a post-join
    // filter. The oracle replays the cascade as CASE expressions over
    // the same full outer join.
    QueryDef("q_sql_merge_branches",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("mb_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id"), lit("zz").as("lang"),
              (col("n_chars") - 1000L).as("n_chars")))
          .unionAll(docs.filter(col("doc_id") % 10 === 2)
            .select(col("doc_id"), lit("yy").as("lang"), col("n_chars")))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("mb_batch")
        graft.SqlText.sql(s,
            """MERGE INTO mb_corpus AS c USING mb_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED AND b.n_chars > c.n_chars THEN DELETE
              |WHEN MATCHED AND b.n_chars < c.n_chars
              |  THEN UPDATE SET n_chars = b.n_chars
              |WHEN MATCHED THEN UPDATE SET lang = b.lang
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id, 'zz' AS lang, n_chars - 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 1
             |  UNION ALL
             |  SELECT doc_id, 'yy' AS lang, n_chars
             |  FROM corpus WHERE doc_id % 10 = 2
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(c.doc_id, b.doc_id) AS doc_id,
             |  CASE WHEN c.doc_id IS NULL THEN b.lang
             |       WHEN b.doc_id IS NULL THEN c.lang
             |       WHEN b.n_chars < c.n_chars THEN c.lang
             |       ELSE b.lang END AS lang,
             |  CASE WHEN c.doc_id IS NULL THEN b.n_chars
             |       WHEN b.doc_id IS NULL THEN c.n_chars
             |       WHEN b.n_chars < c.n_chars THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |WHERE NOT (c.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
             |  AND b.n_chars > c.n_chars)
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------- explicit-insert-list MERGE (SQL text)
    // `WHEN NOT MATCHED THEN INSERT (cols) VALUES (s.cols)` — the most
    // common MERGE insert form in the wild (round-13 verdict item 3),
    // previously loud-failed. Unlisted target columns become typed
    // NULLs (here: inserted docs carry NO lang), and the gated matched
    // update rides the same statement, so the whole verb pair routes
    // through the generalized [[graft.Graft.merge]] — one full-outer
    // key shuffle. Expression RHS in VALUES still fails loudly (only
    // bare `s.col` references). The oracle replays insert-list NULLs
    // with an explicit CAST(NULL AS VARCHAR).
    QueryDef("q_sql_merge_insert_list",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("mi_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id"), col("lang"),
              (col("n_chars") - 1000L).as("n_chars")))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("mi_batch")
        graft.SqlText.sql(s,
            """MERGE INTO mi_corpus AS c USING mi_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED AND b.n_chars > c.n_chars
              |  THEN UPDATE SET n_chars = b.n_chars
              |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars)
              |  VALUES (b.doc_id, b.n_chars)""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, lang, n_chars + 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id, lang, n_chars - 1000 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(c.doc_id, b.doc_id) AS doc_id,
             |  CASE WHEN c.doc_id IS NULL THEN CAST(NULL AS VARCHAR)
             |       ELSE c.lang END AS lang,
             |  CASE WHEN c.doc_id IS NULL THEN b.n_chars
             |       WHEN b.doc_id IS NOT NULL AND b.n_chars > c.n_chars
             |         THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // --------------------------------------------- QUALIFY (SQL text)
    // Snowflake's window-filter clause through the SQL-text front door
    // ([[graft.SqlText.sql]]): the `rn <= k` top-k-per-group idiom a
    // warehouse user types, rewritten onto a wrapped-subquery filter
    // (Spark 4.1's parser has no QUALIFY token; DuckDB runs the SAME
    // text natively — one string, two engines, the groupingSetsSql
    // sharing pattern). Scale note: the per-group window is the demo
    // shape; the engine's salted two-level rank (topNPerGroup,
    // q_sample_quota) is the hot-group path and computes identical
    // rows.
    QueryDef("q_sql_qualify",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s, qualifySql)
      },
      Some(qualifySql)),

    // ----------------------------- EXCLUDE sugar / GROUP BY ALL
    // two warehouse-SQL conveniences, each ONE string for BOTH
    // engines (the qualifySql sharing pattern): EXCLUDE rewrites to
    // the explicit projection complement in SqlText (DuckDB runs the
    // same text natively); GROUP BY ALL is native in Spark 4.1 AND
    // DuckDB — the key proves the pass-through works end-to-end.
    QueryDef("q_sql_exclude",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s, excludeSql)
      },
      Some(excludeSql)),

    QueryDef("q_sql_groupby_all",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s, groupByAllSql)
      },
      Some(groupByAllSql)),

    // --------------------------------------------- feature scaling
    // the pre-training normalization pass: per event type, z-score
    // ((x − μ)/σ, population σ) and min-max ((x − min)/(max − min))
    // of the value column. Determinism without decimal→double drift:
    // moments accumulate as EXACT integer micro-unit sums
    // (Σx, Σx² in DECIMAL(38,0) — 2^53-safe at any scale), and the
    // float part is the IDENTICAL expression on both engines over
    // those exact integers (÷, sqrt are IEEE correctly-rounded),
    // rounded to 6. ONE stats agg broadcast back over the stream —
    // row-local scaling, the only shuffle is the type-grain agg.
    QueryDef("q_feature_scale",
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("xm", round(col("value") * 1e6).cast(LongType))
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("xm").cast(D380)).as("s1"),
          sum((col("xm") * col("xm")).cast(D380)).as("s2"),
          min("xm").as("lo"), max("xm").as("hi"))
        val mu = col("s1").cast(DoubleType) / col("n")
        val sd = sqrt((col("s2").cast(DoubleType)
          - col("s1").cast(DoubleType) * col("s1").cast(DoubleType)
            / col("n")) / col("n"))
        ev.join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"),
            round((col("xm") - mu) / sd, 6).as("zscore"),
            round((col("xm") - col("lo")).cast(DoubleType)
              / (col("hi") - col("lo")), 6).as("minmax"))
          .orderBy("event_id")
      },
      Some("""WITH m AS (
             |  SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             |    sum(CAST(CAST(round(value * 1000000) AS BIGINT)
             |      AS HUGEINT)) AS s1,
             |    sum(CAST(CAST(round(value * 1000000) AS BIGINT)
             |      AS HUGEINT) * CAST(round(value * 1000000) AS BIGINT))
             |      AS s2,
             |    min(CAST(round(value * 1000000) AS BIGINT)) AS lo,
             |    max(CAST(round(value * 1000000) AS BIGINT)) AS hi
             |  FROM events GROUP BY 1
             |)
             |SELECT event_id, e.event_type,
             |  round((CAST(round(value * 1000000) AS BIGINT)
             |      - CAST(s1 AS DOUBLE) / n)
             |    / sqrt((CAST(s2 AS DOUBLE)
             |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n),
             |    6) AS zscore,
             |  round(CAST(CAST(round(value * 1000000) AS BIGINT) - lo
             |      AS DOUBLE) / (hi - lo), 6) AS minmax
             |FROM events e JOIN m ON e.event_type = m.event_type
             |ORDER BY event_id""".stripMargin)),

    // --------------------------------------- right-to-be-forgotten
    // GDPR/CCPA delete propagation: a forget-list of customers
    // cascades along the FK chain (customer → orders → lineitem), and
    // the report is the per-table (kept, removed) audit a compliance
    // run must produce. Shape: the forget-list and the affected
    // orderkey set are key-only frames (broadcast-sized per deletion
    // batch in production); each table pays ONE semi/anti scan — no
    // row data moves, only keys. Deterministic forget-list (custkey %
    // 97) stands in for the request queue.
    QueryDef("q_privacy_forget",
      (s, d) => {
        val forget = t(s, d, "customer")
          .filter(col("c_custkey") % 97 === 0).select("c_custkey")
        val orders = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        val custGone = t(s, d, "customer")
          .join(forget, Seq("c_custkey"), "left_semi")
        val ordGone = orders.join(
          forget.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "left_semi")
        val liGone = li.join(
          ordGone.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi")
        def audit(name: String, total: DataFrame, gone: DataFrame) = {
          val t0 = total.agg(count(lit(1)).as("rows")).withColumn("g", lit(1))
          val g0 = gone.agg(count(lit(1)).as("removed")).withColumn("g", lit(1))
          t0.join(g0, "g").select(lit(name).as("table_name"),
            (col("rows") - col("removed")).as("kept"), col("removed"))
        }
        audit("customer", t(s, d, "customer"), custGone)
          .unionAll(audit("orders", orders, ordGone))
          .unionAll(audit("lineitem", li, liGone))
          .orderBy("table_name")
      },
      Some("""WITH forget AS (
             |  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
             |), og AS (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_custkey IN (SELECT c_custkey FROM forget)
             |)
             |SELECT 'customer' AS table_name,
             |  CAST((SELECT count(1) FROM customer)
             |    - (SELECT count(1) FROM forget) AS BIGINT) AS kept,
             |  CAST((SELECT count(1) FROM forget) AS BIGINT) AS removed
             |UNION ALL
             |SELECT 'lineitem',
             |  CAST((SELECT count(1) FROM lineitem)
             |    - (SELECT count(1) FROM lineitem
             |       WHERE l_orderkey IN (SELECT o_orderkey FROM og))
             |    AS BIGINT),
             |  CAST((SELECT count(1) FROM lineitem
             |    WHERE l_orderkey IN (SELECT o_orderkey FROM og))
             |    AS BIGINT)
             |UNION ALL
             |SELECT 'orders',
             |  CAST((SELECT count(1) FROM orders)
             |    - (SELECT count(1) FROM og) AS BIGINT),
             |  CAST((SELECT count(1) FROM og) AS BIGINT)
             |ORDER BY table_name""".stripMargin)),

    // ----------------------------------------- Benford digit audit
    // fraud/fabrication screening: the lead-digit distribution of
    // money amounts vs Benford's law, ALL-INTEGER — observed ppm is
    // an exact integer div, the expected ppm are literal constants
    // (⌊log10(1+1/d)·10^6⌉ precomputed, identical text both engines),
    // so no transcendental evaluates at query time and the key is
    // bit-deterministic at any scale. One digit-grain agg.
    QueryDef("q_audit_benford",
      (s, d) => {
        val cents = round(col("o_totalprice") * 100).cast(LongType)
        val digits = t(s, d, "orders")
          .select(substring(cents.cast(StringType), 1, 1)
            .cast(LongType).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val expected = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)
        val expCol = element_at(
          array(expected.map(lit): _*), col("digit").cast("int"))
        digits.join(broadcast(digits.agg(sum("n").as("total"))))
          .select(col("digit"), col("n"),
            expr("CAST((n * 1000000) div total AS BIGINT)").as("obs_ppm"),
            expCol.as("expected_ppm"))
          .withColumn("diff_ppm", col("obs_ppm") - col("expected_ppm"))
          .orderBy("digit")
      },
      Some("""WITH digits AS (
             |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    CAST(count(1) AS BIGINT) AS n
             |  FROM orders GROUP BY 1
             |), tot AS (SELECT sum(n) AS total FROM digits)
             |SELECT digit, n,
             |  CAST((n * 1000000) // total AS BIGINT) AS obs_ppm,
             |  ([301030, 176091, 124939, 96910, 79181, 66947, 57992,
             |    51153, 45757])[CAST(digit AS INT)] AS expected_ppm,
             |  CAST((n * 1000000) // total AS BIGINT)
             |    - ([301030, 176091, 124939, 96910, 79181, 66947, 57992,
             |       51153, 45757])[CAST(digit AS INT)] AS diff_ppm
             |FROM digits, tot ORDER BY digit""".stripMargin)),

    // --------------------------------------- UPDATE / DELETE verbs
    // the front door's remaining DML: single-table UPDATE and DELETE
    // rewrite onto one projection / one filter (SqlText) — row-local,
    // zero shuffle, the 100 TB shape of any columnar rewrite. ANSI
    // three-valued WHERE on both verbs; all SET expressions read the
    // ORIGINAL row. The oracle states the SELECT spelling of the same
    // mutation.
    QueryDef("q_sql_update",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """UPDATE orders SET
            |  o_totalprice = o_totalprice * 1.1,
            |  o_orderpriority = '0-BUMPED'
            |WHERE o_orderpriority = '1-URGENT' AND o_totalprice < 100000
            |""".stripMargin)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
             |  CASE WHEN o_orderpriority = '1-URGENT'
             |         AND o_totalprice < 100000
             |    THEN o_totalprice * 1.1 ELSE o_totalprice END
             |    AS o_totalprice,
             |  o_orderdate,
             |  CASE WHEN o_orderpriority = '1-URGENT'
             |         AND o_totalprice < 100000
             |    THEN '0-BUMPED' ELSE o_orderpriority END
             |    AS o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_sql_delete",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          "DELETE FROM orders WHERE o_orderstatus = 'F' " +
            "AND o_totalprice < 150000")
          .orderBy("o_orderkey")
      },
      Some("""SELECT * FROM orders
             |WHERE NOT coalesce(o_orderstatus = 'F'
             |  AND o_totalprice < 150000, false)
             |ORDER BY o_orderkey""".stripMargin)),

    // --------------------------- literal-aware DML grammar (SQL text)
    // round-14 ADVICE closed: [[graft.SqlText]] matches its statement
    // grammar against a literal-masked shadow and slices the original
    // at the match offsets, so a string literal containing ` WHERE `
    // (or a comment-opening `--`) can no longer split UPDATE at the
    // wrong token. This key drives exactly the adversarial text — a
    // SET RHS literal carrying both poison sequences plus a trailing
    // real WHERE clause — through the front door; the oracle replays
    // the ANSI semantics with the literal intact. Same single
    // projection, no shuffle, as q_sql_update.
    QueryDef("q_sql_update_literal",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """UPDATE orders SET
            |  o_orderpriority = 'bumped WHERE priority -- high',
            |  o_totalprice = o_totalprice + 1
            |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
             |  CASE WHEN o_orderpriority = '1-URGENT'
             |    THEN o_totalprice + 1 ELSE o_totalprice END
             |    AS o_totalprice,
             |  o_orderdate,
             |  CASE WHEN o_orderpriority = '1-URGENT'
             |    THEN 'bumped WHERE priority -- high'
             |    ELSE o_orderpriority END AS o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ----------------- literal-aware MERGE gates + first-match-wins
    // the sibling key for MERGE: an AND-gate COMPARING AGAINST a
    // literal that contains both ` WHEN ` and ` THEN ` — the exact
    // text the clause splitter would previously have cut mid-gate —
    // routed through the generalized [[graft.Graft.merge]] (gated
    // DELETE before an ungated UPDATE, first-match-wins, plus the
    // insert arm), which also carries the front door's
    // nondeterministic-merge guard on a clean-keyed batch. One
    // full-outer key shuffle; the guard's count window reuses the
    // same key partitioning, so the plan stays single-shuffle.
    QueryDef("q_sql_merge_gate_literal",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        docs.createOrReplaceTempView("gatel_corpus")
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            lit("xx WHEN matched THEN deleted").as("lang"), col("n_chars"))
          .unionAll(docs.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id"), col("lang"),
              (col("n_chars") + 500L).as("n_chars")))
          .unionAll(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
              col("n_chars")))
          .createOrReplaceTempView("gatel_batch")
        graft.SqlText.sql(s,
            """MERGE INTO gatel_corpus AS c USING gatel_batch AS b
              |ON c.doc_id = b.doc_id
              |WHEN MATCHED AND b.lang = 'xx WHEN matched THEN deleted'
              |  THEN DELETE
              |WHEN MATCHED THEN UPDATE SET n_chars = b.n_chars
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), batch AS (
             |  SELECT doc_id, 'xx WHEN matched THEN deleted' AS lang,
             |    n_chars FROM corpus WHERE doc_id % 10 = 0
             |  UNION ALL
             |  SELECT doc_id, lang, n_chars + 500 AS n_chars
             |  FROM corpus WHERE doc_id % 10 = 1
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM corpus WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN c.doc_id IS NULL THEN b.lang ELSE c.lang END
             |    AS lang,
             |  CASE WHEN c.doc_id IS NULL THEN b.n_chars
             |       WHEN b.doc_id IS NOT NULL THEN b.n_chars
             |       ELSE c.n_chars END AS n_chars
             |FROM corpus c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
             |WHERE NOT (b.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
             |  AND b.lang = 'xx WHEN matched THEN deleted')
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------- Snowflake scalar dialect
    // the round-13 verdict's last "missing" item: Snowflake-isms a
    // migrating user types through the pass-through front door.
    // SqlDialect rewrites what Spark 4.1 lacks (IFF/SQUARE/CHARINDEX/
    // TO_VARCHAR/EDITDISTANCE/DIV0 here); the oracle is the ANSI
    // spelling of the SAME semantics. Floats ride explicit DOUBLE
    // casts + round-6 on both engines (the chi2 determinism pattern).
    // (l_orderkey, l_linenumber) is NOT unique in the fixture (830
    // duplicate pairs at sf0.1 — caught by the 10× replica run, where
    // Spark's parallel sort broke the ties differently), so the ORDER
    // BY spans every output column: remaining ties are identical
    // tuples, interchangeable under the hash compare.
    QueryDef("q_sql_dialect_scalar",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT l_orderkey, l_linenumber,
            |  IFF(l_quantity > 25, 'big', 'small') AS size_tag,
            |  SQUARE(CAST(l_quantity AS DOUBLE)) AS qty_sq,
            |  CAST(CHARINDEX('R', l_returnflag) AS BIGINT) AS r_pos,
            |  TO_VARCHAR(l_linenumber) AS ln_txt,
            |  CAST(EDITDISTANCE(l_returnflag, l_linestatus) AS BIGINT)
            |    AS flag_dist,
            |  ROUND(DIV0(CAST(l_extendedprice AS DOUBLE),
            |             CAST(l_quantity - 24 AS DOUBLE)), 6)
            |    AS price_per_extra
            |FROM lineitem WHERE l_orderkey < 1000
            |ORDER BY l_orderkey, l_linenumber, size_tag, qty_sq, r_pos,
            |  ln_txt, flag_dist, price_per_extra""".stripMargin)
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END
             |    AS size_tag,
             |  power(CAST(l_quantity AS DOUBLE), 2) AS qty_sq,
             |  CAST(position('R' IN l_returnflag) AS BIGINT) AS r_pos,
             |  CAST(l_linenumber AS VARCHAR) AS ln_txt,
             |  CAST(levenshtein(l_returnflag, l_linestatus) AS BIGINT)
             |    AS flag_dist,
             |  ROUND(CASE WHEN CAST(l_quantity - 24 AS DOUBLE) = 0 THEN 0
             |    ELSE CAST(l_extendedprice AS DOUBLE)
             |         / CAST(l_quantity - 24 AS DOUBLE) END, 6)
             |    AS price_per_extra
             |FROM lineitem WHERE l_orderkey < 1000
             |ORDER BY l_orderkey, l_linenumber, size_tag, qty_sq, r_pos,
             |  ln_txt, flag_dist, price_per_extra""".stripMargin)),

    // BIT* family → operator spellings; the nested call
    // (BITSHIFTLEFT over BITAND) pins the rewriter's recursion.
    QueryDef("q_sql_dialect_bitwise",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT o_orderkey,
            |  CAST(BITAND(o_orderkey, 255) AS BIGINT) AS b_and,
            |  CAST(BITOR(o_orderkey, 4096) AS BIGINT) AS b_or,
            |  CAST(BITXOR(o_orderkey, 85) AS BIGINT) AS b_xor,
            |  CAST(BITNOT(o_orderkey) AS BIGINT) AS b_not,
            |  CAST(BITSHIFTLEFT(BITAND(o_orderkey, 15), 3) AS BIGINT)
            |    AS b_shl,
            |  CAST(BITSHIFTRIGHT(o_orderkey, 2) AS BIGINT) AS b_shr
            |FROM orders WHERE o_orderkey < 2000
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  CAST(o_orderkey & 255 AS BIGINT) AS b_and,
             |  CAST(o_orderkey | 4096 AS BIGINT) AS b_or,
             |  CAST(xor(o_orderkey, 85) AS BIGINT) AS b_xor,
             |  CAST(~o_orderkey AS BIGINT) AS b_not,
             |  CAST((o_orderkey & 15) << 3 AS BIGINT) AS b_shl,
             |  CAST(o_orderkey >> 2 AS BIGINT) AS b_shr
             |FROM orders WHERE o_orderkey < 2000
             |ORDER BY o_orderkey""".stripMargin)),

    // the natively-supported Snowflake surface, verified end-to-end:
    // NVL/DECODE/3-arg DATEADD+DATEDIFF/DAYNAME pass through the shim
    // UNTOUCHED and still hash-match the ANSI oracle. (TPC-H dates are
    // midnight timestamps, so boundary-crossing vs whole-day DATEDIFF
    // semantics coincide by construction.)
    QueryDef("q_sql_dialect_passthrough",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT o_orderkey,
            |  NVL(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
            |  CAST(DECODE(o_orderpriority, '1-URGENT', 1, '2-HIGH', 2, 9)
            |    AS BIGINT) AS prio_rank,
            |  DATEADD(DAY, 30, o_orderdate) AS due_date,
            |  CAST(DATEDIFF(DAY, DATE'1995-01-01', o_orderdate) AS BIGINT)
            |    AS d_since_95,
            |  DAYNAME(o_orderdate) AS dow
            |FROM orders WHERE o_orderkey < 1000
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  coalesce(NULLIF(o_orderstatus, 'O'), 'open')
             |    AS status_or_open,
             |  CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 1
             |    WHEN '2-HIGH' THEN 2 ELSE 9 END AS BIGINT) AS prio_rank,
             |  o_orderdate + INTERVAL 30 DAY AS due_date,
             |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
             |    AS BIGINT) AS d_since_95,
             |  strftime(o_orderdate, '%a') AS dow
             |FROM orders WHERE o_orderkey < 1000
             |ORDER BY o_orderkey""".stripMargin)),

    // LISTAGG … WITHIN GROUP — Snowflake's ordered string agg, native
    // in Spark 4.1 (SPARK-42746); DuckDB spells it string_agg(… ORDER
    // BY …). Keys CSV per priority over a bounded slice: deterministic
    // because the within-group order is a unique key.
    QueryDef("q_sql_dialect_listagg",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT o_orderpriority,
            |  LISTAGG(CAST(o_orderkey AS STRING), ',')
            |    WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv,
            |  CAST(count(1) AS BIGINT) AS n
            |FROM orders WHERE o_orderkey < 300
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority,
             |  string_agg(CAST(o_orderkey AS VARCHAR), ','
             |    ORDER BY o_orderkey) AS keys_csv,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM orders WHERE o_orderkey < 300
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // 2-arg TO_VARCHAR — the round-14 verdict's most-hit residual:
    // literal date formats translate token-wise to date_format
    // patterns, numeric formats (9 0 , . $) char-wise to DecimalFormat
    // via format_number. Numeric probes ride integers / quarter-exact
    // doubles so formatting is FP-exact on both engines; exotic tokens
    // (MON/DY, "…" sections) still loud-fail — SqlDialectSpec pins that.
    QueryDef("q_sql_dialect_to_varchar",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT o_orderkey,
            |  TO_VARCHAR(o_orderdate, 'YYYY-MM-DD') AS d_iso,
            |  TO_VARCHAR(o_orderdate, 'DD/MM/YYYY HH24:MI:SS') AS d_euro,
            |  TO_VARCHAR(o_orderdate, 'HH12:MI AM') AS d_ampm,
            |  TO_VARCHAR(o_orderkey, '0000000') AS k_pad,
            |  TO_VARCHAR(CAST(o_orderkey AS DOUBLE) * 1000 + 0.25,
            |    '9,999,990.00') AS k_grouped,
            |  TO_VARCHAR(CAST(o_orderkey AS DOUBLE) * 100, '$9,999,990.00')
            |    AS k_dollars,
            |  TO_VARCHAR(o_orderdate, 'MON DD, YYYY') AS d_mon_upper,
            |  TO_VARCHAR(o_orderdate, 'Dy Mon DD') AS d_name_cap,
            |  TO_VARCHAR(o_orderdate, 'dy') AS d_dy_lower
            |FROM orders WHERE o_orderkey < 1000
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
             |  strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS d_euro,
             |  strftime(o_orderdate, '%I:%M %p') AS d_ampm,
             |  lpad(CAST(o_orderkey AS VARCHAR), 7, '0') AS k_pad,
             |  format('{:,}', o_orderkey * 1000) || '.25' AS k_grouped,
             |  '$' || format('{:,}', o_orderkey * 100) || '.00'
             |    AS k_dollars,
             |  upper(strftime(o_orderdate, '%b'))
             |    || strftime(o_orderdate, ' %d, %Y') AS d_mon_upper,
             |  strftime(o_orderdate, '%a %b %d') AS d_name_cap,
             |  lower(strftime(o_orderdate, '%a')) AS d_dy_lower
             |FROM orders WHERE o_orderkey < 1000
             |ORDER BY o_orderkey""".stripMargin)),

    // 3-arg EDITDISTANCE — Snowflake clamps to max where Spark's 3-arg
    // levenshtein returns -1: the shim's CASE wrapper is an exact twin
    // (and keeps Spark's early-exit past the threshold — at corpus
    // scale the O(len·max) band beats the full O(len²) matrix). The
    // oracle spells the SAME clamp as LEAST over DuckDB's levenshtein.
    QueryDef("q_sql_dialect_editdistance",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT c_custkey,
            |  CAST(EDITDISTANCE(c_mktsegment, 'MACHINERY', 3) AS BIGINT)
            |    AS d_clamped,
            |  CAST(EDITDISTANCE(c_mktsegment, 'HOUSEHOLD', 20) AS BIGINT)
            |    AS d_free,
            |  CAST(EDITDISTANCE(c_name, c_mktsegment) AS BIGINT) AS d_two
            |FROM customer WHERE c_custkey < 500
            |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  CAST(LEAST(levenshtein(c_mktsegment, 'MACHINERY'), 3)
             |    AS BIGINT) AS d_clamped,
             |  CAST(LEAST(levenshtein(c_mktsegment, 'HOUSEHOLD'), 20)
             |    AS BIGINT) AS d_free,
             |  CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS d_two
             |FROM customer WHERE c_custkey < 500
             |ORDER BY c_custkey""".stripMargin)),

    // single-char STRTOK — split + empty-token filter + try_element_at:
    // exact Snowflake semantics including consecutive-delimiter
    // collapse (the constant 'a  b   c' probe: double/triple spaces
    // yield NO empty tokens, so part 3 is 'c') and NULL past the last
    // token (prio_third), where split_part would return '' for both.
    // The '-' delimiter exercises the regex-escape path.
    QueryDef("q_sql_dialect_strtok",
      (s, d) => {
        Tables.register(s, d)
        graft.SqlText.sql(s,
          """SELECT o_orderkey,
            |  STRTOK(o_orderpriority, '-', 1) AS prio_rank,
            |  STRTOK(o_orderpriority, '-', 2) AS prio_word,
            |  STRTOK(o_orderpriority, '-', 3) AS prio_third,
            |  STRTOK(o_orderpriority) AS prio_first_ws,
            |  STRTOK('a  b   c', ' ', 3) AS collapse_probe,
            |  STRTOK(o_orderpriority, '-E', 2) AS set_probe,
            |  STRTOK('a.b,c-d', '.,-', 3) AS set_literal
            |FROM orders WHERE o_orderkey < 1000
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  list_extract(list_filter(string_split(o_orderpriority, '-'),
             |    t -> t <> ''), 1) AS prio_rank,
             |  list_extract(list_filter(string_split(o_orderpriority, '-'),
             |    t -> t <> ''), 2) AS prio_word,
             |  list_extract(list_filter(string_split(o_orderpriority, '-'),
             |    t -> t <> ''), 3) AS prio_third,
             |  list_extract(list_filter(string_split(o_orderpriority, ' '),
             |    t -> t <> ''), 1) AS prio_first_ws,
             |  list_extract(list_filter(string_split('a  b   c', ' '),
             |    t -> t <> ''), 3) AS collapse_probe,
             |  list_extract(list_filter(
             |    string_split_regex(o_orderpriority, '[\-E]'),
             |    t -> t <> ''), 2) AS set_probe,
             |  list_extract(list_filter(
             |    string_split_regex('a.b,c-d', '[\.,\-]'),
             |    t -> t <> ''), 3) AS set_literal
             |FROM orders WHERE o_orderkey < 1000
             |ORDER BY o_orderkey""".stripMargin)),

    // --------------------------------------------- table checksum
    // the replication/migration validator: an ORDER-INDEPENDENT content
    // fingerprint per table slice — sum over rows of a portable row
    // hash. Because + is commutative/associative and the decimal sum is
    // exact, the checksum is identical on any engine, any partitioning,
    // any row order — precisely what a 100 TB copy-validation needs
    // (compare per-slice checksums, re-ship only slices that disagree;
    // this is q_audit_integrity's content-level sibling). Row hash =
    // md5 over an explicit '|'-joined canonical text of every column
    // (each CAST written out, so engine-default formatting never
    // enters); the sum rides DECIMAL(38,0) — 10^12 rows × 2^32 max hash
    // still has 25 digits of headroom — and ships as a digit string
    // (decimal output columns are banned by the driver contract).
    QueryDef("q_table_checksum",
      (s, d) => {
        val rowTxt = "concat_ws('|', CAST(o_orderkey AS STRING), " +
          "CAST(o_custkey AS STRING), o_orderstatus, " +
          "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING), " +
          "CAST(CAST(o_orderdate AS DATE) AS STRING), o_orderpriority)"
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_rows"),
            sum(expr(s"CAST(${graft.ops.Text.md5i(rowTxt)} AS DECIMAL(38,0))"))
              .cast("string").as("checksum"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n_rows,
              |  CAST(sum(CAST(${graft.ops.Text.md5iDuck(
                  "concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
                  "CAST(o_custkey AS VARCHAR), o_orderstatus, " +
                  "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), " +
                  "CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)")}
              |    AS DECIMAL(38,0))) AS VARCHAR) AS checksum
              |FROM orders
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)),

    // --------------------------------------------- contingency / chi²
    // categorical-independence profiling (segment × priority): observed
    // counts vs independence-expected counts and the per-cell χ²
    // contribution — the drift/bias check run over label columns before
    // training. ONE fact join + ONE cell agg — the cell table is
    // registry-persisted so the three marginal re-aggregations read the
    // cached cells (segments×priorities rows), never re-running the
    // fact join; two broadcast joins attach them. Cross-engine determinism:
    // every input to the float math is an exact integer count; exp =
    // rowTot·colTot/N and the χ² term are the IDENTICAL double
    // expressions on both engines, rounded to 6.
    QueryDef("q_crosstab_chi2",
      (s, d) => {
        val cells = graft.CacheRegistry.getOrPersist("crosstab_cells", d,
          t(s, d, "orders")
            .join(t(s, d, "customer").select("c_custkey", "c_mktsegment"),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment", "o_orderpriority")
            .agg(count(lit(1)).as("n")))
        val rowTot = cells.groupBy("c_mktsegment")
          .agg(sum("n").as("seg_total"))
        val colTot = cells.groupBy("o_orderpriority")
          .agg(sum("n").as("prio_total"))
        val grand = cells.agg(sum("n").as("grand_total"))
        val exp = (col("seg_total") * col("prio_total"))
          .cast(DoubleType) / col("grand_total")
        cells.join(broadcast(rowTot), Seq("c_mktsegment"))
          .join(broadcast(colTot), Seq("o_orderpriority"))
          .join(broadcast(grand))
          .select(col("c_mktsegment"), col("o_orderpriority"), col("n"),
            round(exp, 6).as("expected"),
            round(pow(col("n").cast(DoubleType) - exp, 2) / exp, 6)
              .as("chi2_term"))
          .orderBy("c_mktsegment", "o_orderpriority")
      },
      Some("""WITH cells AS (
             |  SELECT c_mktsegment, o_orderpriority, count(1) AS n
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2
             |), rt AS (
             |  SELECT c_mktsegment, sum(n) AS seg_total FROM cells GROUP BY 1
             |), ct AS (
             |  SELECT o_orderpriority, sum(n) AS prio_total FROM cells GROUP BY 1
             |), g AS (SELECT sum(n) AS grand_total FROM cells)
             |SELECT c_mktsegment, o_orderpriority, CAST(n AS BIGINT) AS n,
             |  round(CAST(seg_total * prio_total AS DOUBLE) / grand_total, 6)
             |    AS expected,
             |  round(pow(CAST(n AS DOUBLE)
             |      - CAST(seg_total * prio_total AS DOUBLE) / grand_total, 2)
             |    / (CAST(seg_total * prio_total AS DOUBLE) / grand_total), 6)
             |    AS chi2_term
             |FROM cells
             |JOIN rt USING (c_mktsegment)
             |JOIN ct USING (o_orderpriority)
             |CROSS JOIN g
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    // --------------------------------------------------- snapshot diff
    // the CDC question a daily 100 TB ingest answers before publishing:
    // WHAT changed between yesterday's snapshot and today's? Built on
    // the same synthetic batch as q_upsert (updates doc_id%10=0,
    // inserts %7=3, plus deletes %13=5) so the two keys cross-check:
    // diff(v1, upsert-result-minus-deletes) must classify exactly the
    // touched keys. Engine form: Graft.snapshotDiff — one full-outer
    // key join, null-safe per-column equality, no window/collect; the
    // full classification (incl. 'unchanged') returns so audit totals
    // are one groupBy away. Plan: single doc_id shuffle of each side.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val v1 = t(s, d, "documents").select("doc_id", "lang", "n_chars")
        val updated = v1.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("lang"),
            (col("n_chars") + 1000L).as("n_chars"))
        val inserted = v1.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            col("n_chars"))
        val v2 = v1.filter(col("doc_id") % 13 =!= 5)
          .filter(col("doc_id") % 10 =!= 0)
          .unionAll(updated.filter(col("doc_id") % 13 =!= 5))
          .unionAll(inserted)
        graft.Graft.snapshotDiff(v1, v2, Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |), v2 AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
             |         ELSE n_chars END AS n_chars
             |  FROM v1 WHERE doc_id % 13 <> 5
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, n_chars
             |  FROM v1 WHERE doc_id % 7 = 3
             |)
             |SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
             |  o.lang AS old_lang, n.lang AS new_lang,
             |  o.n_chars AS old_n_chars, n.n_chars AS new_n_chars,
             |  CASE WHEN o.doc_id IS NULL THEN 'added'
             |       WHEN n.doc_id IS NULL THEN 'removed'
             |       WHEN o.lang IS DISTINCT FROM n.lang
             |         OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'changed'
             |       ELSE 'unchanged' END AS diff_status
             |FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // --------------------------------------------------- integrity audit
    // the referential-integrity audit a 100 TB ingest runs before
    // trusting a snapshot: orphan counts across the key relationships,
    // one row per check. Each check is ONE left-anti join on its key —
    // at scale each is a single key shuffle (or a broadcast when the
    // parent side is dim-sized, left to planner stats) — and the audit
    // unions three tiny 1-row aggregates, so the report costs exactly
    // the three anti joins and nothing else. A healthy snapshot returns
    // all zeros; the key pins the SHAPE (the counts are data-derived,
    // whatever they are).
    QueryDef("q_audit_integrity",
      (s, d) => {
        def orphans(child: org.apache.spark.sql.DataFrame, childKey: String,
            parent: org.apache.spark.sql.DataFrame, parentKey: String,
            label: String) =
          child.join(parent, col(childKey) === col(parentKey), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(label).as("check"), col("n_orphans"))
        orphans(t(s, d, "orders").select("o_custkey"), "o_custkey",
            t(s, d, "customer").select("c_custkey"), "c_custkey",
            "orders_without_customer")
          .unionAll(orphans(t(s, d, "lineitem").select("l_orderkey"), "l_orderkey",
            t(s, d, "orders").select("o_orderkey"), "o_orderkey",
            "lineitem_without_order"))
          .unionAll(orphans(t(s, d, "lineitem").select("l_partkey"), "l_partkey",
            t(s, d, "part").select("p_partkey"), "p_partkey",
            "lineitem_without_part"))
          .orderBy("check")
      },
      Some("""SELECT 'orders_without_customer' AS "check",
             |  CAST(count(1) AS BIGINT) AS n_orphans
             |FROM orders WHERE NOT EXISTS
             |  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
             |UNION ALL
             |SELECT 'lineitem_without_order',
             |  CAST(count(1) AS BIGINT)
             |FROM lineitem WHERE NOT EXISTS
             |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
             |UNION ALL
             |SELECT 'lineitem_without_part',
             |  CAST(count(1) AS BIGINT)
             |FROM lineitem WHERE NOT EXISTS
             |  (SELECT 1 FROM part WHERE p_partkey = l_partkey)
             |ORDER BY "check"""".stripMargin)),

    // ------------------------------------------- k-anonymity audit
    // training-data governance: list the quasi-identifier equivalence
    // classes smaller than k — the re-identification risk report run
    // before a release (each listed row = a QI combination whose
    // members are distinguishable). QI = (nation, segment, account
    // band); the band is floor(acctbal/1000) — a row-local exact
    // double op (inputs are 2-decimal values; band edges are exact
    // binary doubles), NOT a data-dependent quantile, so the class
    // definition is scale-invariant. Shape: ONE map-side-combinable
    // hash agg to the |QI-combinations|-bounded class table, then a
    // row-local filter — the 100 TB cost is the one fact scan.
    QueryDef("q_privacy_kanon",
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_nationkey").cast(LongType).as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .filter(col("class_size") < 5)
        .orderBy("nation", "segment", "bal_band"),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |  c_mktsegment AS segment,
             |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             |  CAST(count(1) AS BIGINT) AS class_size
             |FROM customer
             |GROUP BY 1, 2, 3 HAVING count(1) < 5
             |ORDER BY nation, segment, bal_band""".stripMargin)),

    // DISTINCT on a column subset with a deterministic survivor
    QueryDef("q_distinct_subset",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(min("o_orderkey").as("first_orderkey"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  min(o_orderkey) AS first_orderkey
             |FROM orders GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // exact interpolated percentiles, quantile_cont-identical, via
    // [[histQuantiles]] — the histogram + rank-scan form, so the plan
    // carries mergeable hash-agg state instead of the `percentile`
    // aggregate's whole-column buffer
    QueryDef("q_agg_percentile",
      (s, d) => histQuantiles(
          t(s, d, "orders").select("o_orderstatus", "o_totalprice"),
          "o_totalprice", Seq("o_orderstatus"),
          Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
             |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // deterministic train/val/test assignment — the held-out-split
    // primitive of a training-data pipeline. Hash-based (not rand()):
    // reproducible across runs, engines, and cluster sizes, and stable
    // under repartitioning — the only split semantics that survive 100 TB.
    QueryDef("q_sample_split",
      (s, d) => t(s, d, "documents")
        .withColumn("bucket",
          expr(s"${graft.ops.Text.md5i("CAST(doc_id AS STRING)")} % 10"))
        .select(col("doc_id"),
          when(col("bucket") === 0, "test")
            .when(col("bucket") === 1, "validation")
            .otherwise("train").as("split"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CASE ${graft.ops.Text.md5iDuck("CAST(doc_id AS VARCHAR)")} % 10
              |    WHEN 0 THEN 'test' WHEN 1 THEN 'validation'
              |    ELSE 'train' END AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------------------- windows
    QueryDef("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer").select(
            col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).cast(LongType).as("rn"),
            rank().over(w).cast(LongType).as("rnk"),
            dense_rank().over(w).cast(LongType).as("drnk"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
             |  CAST(row_number() OVER w AS BIGINT) AS rn,
             |  CAST(rank() OVER w AS BIGINT) AS rnk,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment
             |             ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_mktsegment, rn""".stripMargin)),

    QueryDef("q_window_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            first(col("o_orderkey")).over(w).as("first_ok"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price,
             |  first_value(o_orderkey) OVER w AS first_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef("q_window_running_sum",
      (s, d) => {
        // lineitem has no unique key (FIXTURES.md): include l_quantity in
        // the frame ordering so tied rows are value-identical, and include
        // running_qty in the final sort so the output order is total.
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem").select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast(D386)).over(w).cast(DoubleType).as("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER w AS DOUBLE) AS running_qty
             |FROM lineitem
             |WINDOW w AS (PARTITION BY l_suppkey
             |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin)),

    // RANGE frame (vs the ROWS frame in q_window_running_sum): peers by
    // VALUE distance on the ordering key
    QueryDef("q_window_range_frame",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_orderkey"))
          .rangeBetween(-100L, 0L)
        t(s, d, "orders").select(
            col("o_orderstatus"), col("o_orderkey"),
            count(lit(1)).over(w).as("n_in_range"),
            sum(col("o_totalprice").cast(D386)).over(w).cast(DoubleType)
              .as("sum_in_range"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |  CAST(count(1) OVER w AS BIGINT) AS n_in_range,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_in_range
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
             |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    // quantile-bucketing + tie-stable ranking in one pass: ntile is only
    // deterministic when the window order is TOTAL (ties straddling a
    // bucket boundary land arbitrarily), so the order carries the unique
    // o_orderkey tiebreak; dense_rank on the price alone shows the
    // tie-collapsing rank beside it. Same shuffle as any partitioned
    // window — one exchange on the partition key.
    QueryDef("q_window_ntile",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wd = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"))
        t(s, d, "orders").select(
            col("o_orderstatus"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            dense_rank().over(wd).as("price_dense_rank"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus
             |    ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
             |  CAST(dense_rank() OVER (PARTITION BY o_orderstatus
             |    ORDER BY o_totalprice) AS INT) AS price_dense_rank
             |FROM orders
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    // ---------------------------------------------------------- sort / limit
    QueryDef("q_sort",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    QueryDef("q_limit",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    // orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    // top-k then a k-row merge on the driver; never a full sort at scale.
    QueryDef("q_topk",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---------------------------------------------------------- set ops
    QueryDef("q_union_all",
      (s, d) => {
        val c = t(s, d, "customer")
        c.filter(col("c_nationkey") === 1).select("c_custkey", "c_name")
          .unionByName(
            c.filter(col("c_nationkey") === 2).select("c_custkey", "c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 1
             |UNION ALL
             |SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 2
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q_union_distinct",
      (s, d) => {
        val c = t(s, d, "customer")
        c.filter(col("c_nationkey") <= 5).select("c_mktsegment")
          .union(c.filter(col("c_nationkey") > 5).select("c_mktsegment"))
          .distinct()
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment FROM customer WHERE c_nationkey <= 5
             |UNION
             |SELECT c_mktsegment FROM customer WHERE c_nationkey > 5
             |ORDER BY c_mktsegment""".stripMargin)),

    QueryDef("q_intersect",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(col("l_returnflag") === "A").select("l_suppkey")
          .intersect(l.filter(col("l_returnflag") === "R").select("l_suppkey"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
             |INTERSECT
             |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
             |ORDER BY l_suppkey""".stripMargin)),

    QueryDef("q_except",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(col("l_returnflag") === "A").select("l_partkey")
          .except(l.filter(col("l_returnflag") === "R").select("l_partkey"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
             |EXCEPT
             |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |ORDER BY l_partkey""".stripMargin)),

    // ---------------------------------------------------------- scalar fns
    QueryDef("q_scalar_string",
      (s, d) => t(s, d, "customer").select(
          col("c_custkey"),
          upper(col("c_name")).as("u"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("pre"),
          trim(col("c_name")).as("tr"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
          size(split(col("c_name"), "#")).cast(LongType).as("nparts"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  upper(c_name) AS u,
             |  lower(c_mktsegment) AS lo,
             |  substring(c_name, 1, 8) AS pre,
             |  trim(c_name) AS tr,
             |  concat_ws('-', c_mktsegment, c_name) AS cw,
             |  CAST(len(string_split(c_name, '#')) AS BIGINT) AS nparts,
             |  regexp_extract(c_name, '([0-9]+)', 1) AS digits
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef("q_scalar_date",
      (s, d) => t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          date_trunc("month", col("l_shipdate")).as("ship_month"),
          year(col("l_shipdate")).cast(LongType).as("y"),
          month(col("l_shipdate")).cast(LongType).as("m"),
          dayofmonth(col("l_shipdate")).cast(LongType).as("dom"),
          datediff(col("l_shipdate").cast(DateType),
            lit("1995-01-01").cast(DateType)).cast(LongType).as("days_since"),
          (col("l_shipdate") + expr("INTERVAL '30' DAY")).as("ship_plus_30"))
        // days_since is injective in l_shipdate → total order despite
        // duplicate (l_orderkey, l_linenumber) pairs
        .orderBy("l_orderkey", "l_linenumber", "days_since"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  date_trunc('month', l_shipdate) AS ship_month,
             |  CAST(year(l_shipdate) AS BIGINT) AS y,
             |  CAST(month(l_shipdate) AS BIGINT) AS m,
             |  CAST(day(l_shipdate) AS BIGINT) AS dom,
             |  CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS days_since,
             |  l_shipdate + INTERVAL 30 DAY AS ship_plus_30
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, days_since""".stripMargin)),

    QueryDef("q_scalar_math",
      (s, d) => t(s, d, "orders").select(
          col("o_orderkey"),
          abs(col("o_totalprice") - 100000.0).as("a"),
          floor(col("o_totalprice")).cast(LongType).as("f"),
          ceil(col("o_totalprice")).cast(LongType).as("c"),
          sqrt(col("o_totalprice")).as("sq"),
          round(log(col("o_totalprice")), 4).as("ln4"),
          (col("o_orderkey") % 7).cast(LongType).as("m7"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  abs(o_totalprice - 100000.0) AS a,
             |  CAST(floor(o_totalprice) AS BIGINT) AS f,
             |  CAST(ceil(o_totalprice) AS BIGINT) AS c,
             |  sqrt(o_totalprice) AS sq,
             |  round(ln(o_totalprice), 4) AS ln4,
             |  CAST(o_orderkey % 7 AS BIGINT) AS m7
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_scalar_array",
      (s, d) => {
        val toks = split(col("text"), " ")
        t(s, d, "documents").select(
            col("doc_id"),
            size(toks).cast(LongType).as("n_tokens"),
            array_contains(toks, "spark").as("has_spark"),
            element_at(toks, 1).as("first_tok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  string_split(text, ' ')[1] AS first_tok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -------------------------------------------- typed Dataset surface
    // the Dataset[T]/Encoder path (SURVEY §1.2: "Dataset[T] with
    // case-class Encoders where type safety helps"): typed filter +
    // groupByKey + typed count over a case-class view of customer.
    // Typed lambdas deserialize rows (like UDFs, they are opaque to
    // Catalyst — the scan still prunes to the 3 mapped columns via the
    // explicit select, but the FILTER cannot push: the documented tax),
    // so the frame surface stays the default everywhere else; this key
    // keeps the typed path proven for the places type safety earns it
    // (Streams' Event/Session state machines).
    QueryDef("q_typed_dataset",
      (s, d) => {
        import s.implicits._
        t(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
          .as[CustRow]
          .filter(_.c_acctbal > 1000.0)
          .groupByKey(_.c_nationkey)
          .count()
          .toDF("c_nationkey", "n_rich")
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, CAST(count(1) AS BIGINT) AS n_rich
             |FROM customer WHERE c_acctbal > 1000.0
             |GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // -------------------------------------------- scalar UDF surface
    // the DOCUMENTED escape hatch (SURVEY §2 Tier B: per-row arbitrary
    // logic when no built-in composes), keyed once so the registration
    // path stays proven — and deliberately LAST RESORT: a Scala UDF is
    // an opaque box to Catalyst (no pushdown through it, no codegen
    // fusion, boxing at the boundary), which is why all 200+ other keys
    // are built-ins/HOFs/native expressions. Digit sum is pure integer
    // (engine-drift-free) and the DuckDB twin replays it as closed-form
    // arithmetic — also a demonstration that the oracle need not mirror
    // the mechanism, only the semantics.
    QueryDef("q_scalar_udf",
      (s, d) => {
        val digitSum = udf((n: Long) => {
          var x = n; var acc = 0L
          while (x > 0) { acc += x % 10; x /= 10 }
          acc
        })
        t(s, d, "customer")
          .select(col("c_custkey"), digitSum(col("c_custkey")).as("digit_sum"))
          .orderBy("c_custkey")
      },
      // 12 digit terms cover c_custkey < 10^12 — custkey ≈ 150k·sf, so
      // the closed form is exact past sf 10^6 (the UDF handles any Long)
      Some("""SELECT c_custkey,
             |  (c_custkey % 10) + (c_custkey // 10 % 10)
             |  + (c_custkey // 100 % 10) + (c_custkey // 1000 % 10)
             |  + (c_custkey // 10000 % 10) + (c_custkey // 100000 % 10)
             |  + (c_custkey // 1000000 % 10)
             |  + (c_custkey // 10000000 % 10)
             |  + (c_custkey // 100000000 % 10)
             |  + (c_custkey // 1000000000 % 10)
             |  + (c_custkey // 10000000000 % 10)
             |  + (c_custkey // 100000000000 % 10) AS digit_sum
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ------------------------------- higher-order array lambdas (HOFs)
    // the lambda quartet — filter / transform / zip_with / aggregate —
    // over the embedding vectors: the codegen-friendly no-UDF idiom
    // every vector op here is built from, keyed in isolation.
    // Determinism contract: counts are exact; the two float reductions
    // are ORDERED left folds (Spark `aggregate` from 0.0 — 0+x₁ ≡ x₁
    // exactly, so it matches DuckDB's first-element-seeded list_reduce)
    // with float→double promotion pinned by explicit CASTs, and the
    // outputs floor-scale to e6 integers (boundary-robust). The oracle
    // replays zip_with(v, v, a·b) as transform(x²) — same arithmetic,
    // DuckDB's zip emits unnamed structs its lambdas can't address.
    QueryDef("q_scalar_hof",
      (s, d) => t(s, d, "embeddings").select(
          col("vec_id"),
          expr("CAST(size(filter(embedding, x -> x > 0)) AS BIGINT)")
            .as("n_pos"),
          expr("CAST(size(filter(transform(embedding, x -> abs(x)), " +
            "v -> v > 0.2)) AS BIGINT)").as("n_big"),
          expr("CAST(floor(1e6 * aggregate(transform(embedding, " +
            "x -> CAST(abs(x) AS DOUBLE)), 0D, (a, x) -> a + x)) AS BIGINT)")
            .as("l1_e6"),
          expr("CAST(floor(1e6 * aggregate(zip_with(embedding, embedding, " +
            "(a, b) -> CAST(a AS DOUBLE) * b), 0D, (a, x) -> a + x)) " +
            "AS BIGINT)").as("dot_e6"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
             |    AS n_pos,
             |  CAST(len(list_filter(list_transform(embedding,
             |    x -> abs(x)), v -> v > 0.2)) AS BIGINT) AS n_big,
             |  CAST(floor(1e6 * list_reduce(list_transform(embedding,
             |    x -> CAST(abs(x) AS DOUBLE)), (a, b) -> a + b)) AS BIGINT)
             |    AS l1_e6,
             |  CAST(floor(1e6 * list_reduce(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * x), (a, b) -> a + b)) AS BIGINT)
             |    AS dot_e6
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // map construct + lookup; oracle checks the looked-up values (map
    // key-order is engine-dependent, so the map itself is never output).
    QueryDef("q_scalar_map",
      (s, d) => {
        val m = map(lit("lang"), col("lang"), lit("source"), col("source"))
        t(s, d, "documents").select(
            col("doc_id"),
            element_at(m, "lang").as("m_lang"),
            element_at(m, "source").as("m_source"),
            map_keys(m)(0).as("first_key"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang AS m_lang, source AS m_source,
             |  'lang' AS first_key
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // null-handling scalar family
    QueryDef("q_scalar_null",
      (s, d) => {
        val filtered = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
        t(s, d, "customer")
          .join(filtered, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("o_totalprice"), lit(0.0)).as("price_or_zero"),
            col("o_orderkey").isNull.as("no_big_order"),
            nullif(col("c_nationkey"), lit(1)).cast(LongType).as("nk_nullif"),
            nvl2(col("o_orderkey"), lit("buyer"), lit("quiet")).as("segment"))
          .orderBy("c_custkey", "price_or_zero")
      },
      Some("""SELECT c_custkey,
             |  coalesce(o_totalprice, 0.0) AS price_or_zero,
             |  o_orderkey IS NULL AS no_big_order,
             |  CAST(nullif(c_nationkey, 1) AS BIGINT) AS nk_nullif,
             |  CASE WHEN o_orderkey IS NOT NULL THEN 'buyer' ELSE 'quiet' END AS segment
             |FROM customer
             |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey, price_or_zero""".stripMargin)),

    // ---------------------------------------------- z-order layout key
    // the Morton-interleave layout primitive ([[graft.functions.ZOrder2]]):
    // sort/range-partition by zorder2(a, b) and file/row-group footer
    // stats become TILES in (a, b) space — predicates on EITHER dimension
    // prune, where a lexicographic sort prunes only the leading key.
    // ZOrderSpec demonstrates the pruning win against the footer-stat
    // model; this key pins the bit math itself (a native codegen'd
    // expression on the Spark side, the identical magic-number spread in
    // plain SQL on the DuckDB side).
    QueryDef("q_layout_zorder",
      (s, d) => {
        graft.functions.ZOrder2.register(s)
        t(s, d, "part")
          .select(col("p_partkey"),
            expr("zorder2(CAST(p_size AS BIGINT), p_partkey)").as("z"))
          .orderBy("p_partkey")
      },
      Some(s"""SELECT p_partkey,
              |  ${graft.functions.ZOrder2.computeDuck(
                   "CAST(p_size AS BIGINT)", "p_partkey")} AS z
              |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef("q_cast",
      (s, d) => t(s, d, "customer").select(
          col("c_custkey"),
          // decimal cast demonstrated, then to double for engine-neutral
          // output representation (DuckDB pandas export: DECIMAL → float64)
          col("c_acctbal").cast(DecimalType(12, 2)).cast(DoubleType).as("bal_dec"),
          col("c_nationkey").cast(LongType).as("nk"),
          col("c_custkey").cast(StringType).as("ck_str"),
          col("c_acctbal").cast(FloatType).as("bal_f32"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
             |  CAST(c_nationkey AS BIGINT) AS nk,
             |  CAST(c_custkey AS VARCHAR) AS ck_str,
             |  CAST(c_acctbal AS REAL) AS bal_f32
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------ per-group mode
    // the most frequent value per group (each nation's dominant market
    // segment) with a DETERMINISTIC tie-break — Spark's built-in
    // `mode()` (and DuckDB's) returns an ARBITRARY value on frequency
    // ties, which can never hash-match across engines; the engine form
    // is the counts-then-argmax rewrite (modePerGroup): one
    // (group, value) hash agg (map-side combinable — the only
    // fact-sized pass), per-group max(n) joined back onto the counts,
    // keep the rows at the max, then min(value) so frequency ties
    // break to the alphabetically-smallest segment — no window at all.
    // The counts frame is |groups|×|values| — tiny at any corpus
    // scale, so the join-back is a broadcast.
    QueryDef("q_agg_mode",
      (s, d) => modePerGroup(t(s, d, "customer"),
          Seq("c_nationkey"), "c_mktsegment")
        .withColumnRenamed("mode_value", "mode_segment")
        .orderBy("c_nationkey"),
      Some("""WITH counts AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(count(1) AS BIGINT) AS n
             |  FROM customer GROUP BY 1, 2
             |), top AS (
             |  SELECT c_nationkey, max(n) AS top_n FROM counts GROUP BY 1
             |)
             |SELECT counts.c_nationkey AS c_nationkey,
             |  min(c_mktsegment) AS mode_segment, max(n) AS n
             |FROM counts JOIN top ON counts.c_nationkey = top.c_nationkey
             |  AND n = top_n
             |GROUP BY counts.c_nationkey
             |ORDER BY counts.c_nationkey""".stripMargin)),

    // --------------------------------------- window navigation frames
    // the navigation-function family over ordered per-key frames:
    // first/last/nth event value per user — FIRST_VALUE, LAST_VALUE
    // (with the full-partition frame, not the default running frame —
    // the classic silent-wrong-answer), and NTH_VALUE(2). One user-
    // keyed window, (ts, event_id) total order so ties cannot flip
    // navigation targets, one row per user out via the rank-1 filter.
    QueryDef("q_window_navigation",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("first_v", first(col("value")).over(full))
          .withColumn("last_v", last(col("value")).over(full))
          .withColumn("second_v", nth_value(col("value"), 2).over(full))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "first_v", "last_v", "second_v")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, first_v, last_v, second_v FROM (
             |  SELECT user_id,
             |    first_value(value) OVER w AS first_v,
             |    last_value(value) OVER w AS last_v,
             |    nth_value(value, 2) OVER w AS second_v,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |)
             |WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    // --------------------------------- higher-moment profile (shape)
    // skewness + excess kurtosis per group — the distribution-SHAPE
    // profile next to q_agg_stats' location/spread. Both engines'
    // built-ins disagree on estimator convention (sample vs population
    // corrections), so the engine form computes POPULATION moments from
    // exact integer power sums: values scale to cents (exact — the
    // column carries 2 decimals), Σx/Σx²/Σx³/Σx⁴ accumulate as int128
    // (Spark DECIMAL(38,0) ≡ DuckDB HUGEINT — order-free, overflow-free
    // to 1e38), and only the FINAL ratio arithmetic runs in double with
    // the identical expression text on both sides (m2^1.5 written as
    // m2·sqrt(m2): IEEE sqrt and multiply are exactly rounded, so no
    // pow-library drift). Skew/kurtosis are scale-invariant, so the
    // cents scaling cancels. ONE map-side-combined agg, group-count
    // output. Scale bound: Σx⁴ < 1e38 holds to ~10M rows of 6e7-cent
    // values per group; past that, re-scale the unit (dollars: ×1e8
    // headroom) — the note a 100 TB deployment needs.
    QueryDef("q_profile_moments",
      (s, d) => {
        val xc = "CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"
        val mRaw = t(s, d, "orders").groupBy("o_orderstatus").agg(
          count(lit(1)).as("n"),
          expr(s"sum($xc)").as("s1"),
          expr(s"sum($xc * $xc)").as("s2"),
          expr(s"sum($xc * $xc * $xc)").as("s3"),
          expr(s"sum($xc * $xc * $xc * $xc)").as("s4"))
        mRaw.select(col("o_orderstatus"), col("n"),
            expr("CAST(s1 AS DOUBLE) / n").as("m"),
            expr("CAST(s2 AS DOUBLE) / n").as("r2"),
            expr("CAST(s3 AS DOUBLE) / n").as("r3"),
            expr("CAST(s4 AS DOUBLE) / n").as("r4"))
          .select(col("o_orderstatus"), col("n"), col("m"),
            expr("r2 - m * m").as("m2"),
            expr("r3 - 3 * m * r2 + 2 * m * m * m").as("m3"),
            expr("r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m")
              .as("m4"))
          .select(col("o_orderstatus"), col("n"),
            round(expr("m / 100.0"), 6).as("mean"),
            round(expr("m3 / (m2 * sqrt(m2))"), 6).as("skewness"),
            round(expr("m4 / (m2 * m2) - 3"), 6).as("kurtosis_excess"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH a AS (
             |  SELECT o_orderstatus, count(1) AS n,
             |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS s1,
             |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)) AS s2,
             |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)) AS s3,
             |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)
             |      * CAST(round(o_totalprice * 100) AS HUGEINT)) AS s4
             |  FROM orders GROUP BY 1
             |), r AS (
             |  SELECT o_orderstatus, n,
             |    CAST(s1 AS DOUBLE) / n AS m,
             |    CAST(s2 AS DOUBLE) / n AS r2,
             |    CAST(s3 AS DOUBLE) / n AS r3,
             |    CAST(s4 AS DOUBLE) / n AS r4
             |  FROM a
             |), c AS (
             |  SELECT o_orderstatus, n, m,
             |    r2 - m * m AS m2,
             |    r3 - 3 * m * r2 + 2 * m * m * m AS m3,
             |    r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
             |      AS m4
             |  FROM r
             |)
             |SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
             |  round(m / 100.0, 6) AS mean,
             |  round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
             |  round(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess
             |FROM c ORDER BY o_orderstatus""".stripMargin)),

    // -------------------------------------- equi-depth histogram
    // quartile-bucket profiling — the equi-DEPTH twin of
    // q_profile_histogram's equi-width bins. The naive form (ntile over
    // a global ORDER BY) is a corpus-wide single-task window — the
    // classic scale-killer; the engine form derives the three cutpoints
    // from [[histQuantiles]] (1 row — value-grain histogram + rank
    // scan, no whole-column Percentile buffer), broadcasts them back,
    // and bins row-locally in a second map-side-combined pass.
    // Cutpoints round(…, 6) so both engines bin against bit-identical
    // boundaries (q_agg_percentile precedent: histQuantiles ≡
    // quantile_cont). At 100 TB the cutpoint stage can further swap to
    // approx_percentile (mergeable t-digest, same 1-row broadcast
    // shape) — approximate boundaries move bin edges only by the
    // sketch error, which equi-depth profiling tolerates by design.
    QueryDef("q_profile_equidepth",
      (s, d) => {
        val cuts = histQuantiles(t(s, d, "orders").select("o_totalprice"),
          "o_totalprice", Nil,
          Seq(0.25 -> "c1", 0.5 -> "c2", 0.75 -> "c3"))
        t(s, d, "orders").select("o_totalprice").join(broadcast(cuts))
          .select(when(col("o_totalprice") <= col("c1"), 0)
            .when(col("o_totalprice") <= col("c2"), 1)
            .when(col("o_totalprice") <= col("c3"), 2)
            .otherwise(3).as("bin"), col("o_totalprice"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
          .orderBy("bin")
      },
      Some("""WITH cuts AS (
             |  SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS c1,
             |    round(quantile_cont(o_totalprice, 0.5), 6) AS c2,
             |    round(quantile_cont(o_totalprice, 0.75), 6) AS c3
             |  FROM orders
             |)
             |SELECT CASE WHEN o_totalprice <= c1 THEN 0
             |            WHEN o_totalprice <= c2 THEN 1
             |            WHEN o_totalprice <= c3 THEN 2
             |            ELSE 3 END AS bin,
             |  CAST(count(1) AS BIGINT) AS n,
             |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM orders, cuts
             |GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ------------------------------------- gaps-and-islands streaks
    // longest consecutive-DAY activity streak per user — the canonical
    // gaps-and-islands rewrite (login streaks, uptime runs): distinct
    // (user, day) reduction, island anchor = day − row_number (equal
    // for consecutive days, a new anchor at every gap), island grain
    // agg, then the deterministic argmax (longest streak, ties → the
    // EARLIEST start — the q_agg_mode counts-then-join-back pattern,
    // no arbitrary max_by tie). The only window is per-user over the
    // user's distinct DAYS (≤ calendar span rows — key-local and
    // span-bounded); everything else is mergeable hash aggs.
    QueryDef("q_window_islands",
      (s, d) => {
        val ud = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val islands = ud
          .withColumn("anchor",
            date_sub(col("day"), row_number().over(w)))
          .groupBy("user_id", "anchor")
          .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
        val best = islands.groupBy("user_id")
          .agg(max(col("len")).as("best_streak"))
        islands.join(best, Seq("user_id"))
          .filter(col("len") === col("best_streak"))
          .groupBy("user_id", "best_streak")
          .agg(min(col("start")).cast("timestamp").as("streak_start"))
          .select("user_id", "best_streak", "streak_start")
          .orderBy("user_id")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events
             |), isl AS (
             |  SELECT user_id,
             |    day - CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY day) AS INT) AS anchor,
             |    day
             |  FROM ud
             |), runs AS (
             |  SELECT user_id, anchor, CAST(count(1) AS BIGINT) AS len,
             |    min(day) AS start
             |  FROM isl GROUP BY 1, 2
             |), best AS (
             |  SELECT user_id, max(len) AS best_streak
             |  FROM runs GROUP BY 1
             |)
             |SELECT r.user_id AS user_id, best_streak,
             |  CAST(min(start) AS TIMESTAMP) AS streak_start
             |FROM runs r JOIN best b
             |  ON r.user_id = b.user_id AND r.len = b.best_streak
             |GROUP BY 1, 2
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------ deterministic argmax
    // "the row that holds the group's maximum" with a total tie order —
    // built-in max_by/arg_max return an ARBITRARY tied row on both
    // engines (the q_agg_mode problem at row grain). Engine form: ONE
    // mergeable aggregate over the orderable struct (acctbal,
    // -custkey) — highest balance wins, balance ties resolve to the
    // LOWEST custkey, map-side combinable. The oracle replays it as the
    // naive per-group window row_number — at 100 TB the mergeable agg
    // beats that window (no per-group sort, no single hot partition),
    // which is the point of the rewrite.
    QueryDef("q_agg_argmax",
      (s, d) => t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(max(struct(col("c_acctbal"), (-col("c_custkey")).as("negk")))
          .as("m"))
        .select(col("c_nationkey"), col("m.c_acctbal").as("best_bal"),
          (-col("m.negk")).as("best_custkey"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, c_acctbal AS best_bal,
             |  c_custkey AS best_custkey
             |FROM (
             |  SELECT c_nationkey, c_acctbal, c_custkey,
             |    row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer)
             |WHERE rn = 1
             |ORDER BY c_nationkey""".stripMargin)),

    // ----------------------------------------------- null-safe join
    // the NULL-matches-NULL join (`<=>` / IS NOT DISTINCT FROM) — plain
    // equality silently DROPS null-keyed rows (SQL three-valued logic),
    // which is the right default but the wrong behavior when NULL is a
    // legitimate category ("no priority" here, via NULLIF). The key
    // proves Spark plans EqualNullSafe as a real HASH join key (a
    // broadcast hash join below — never the nested-loop a non-equi
    // predicate would force) and that the NULL bucket survives with its
    // full count on both engines.
    QueryDef("q_join_null_safe",
      (s, d) => {
        val v = nullif(col("o_orderpriority"), lit("1-URGENT"))
        val l = t(s, d, "orders").select(v.as("v"))
        val dim = t(s, d, "orders").select(v.as("dv")).distinct()
          .withColumn("label", coalesce(col("dv"), lit("(none)")))
        l.join(broadcast(dim), col("v") <=> col("dv"))
          .groupBy("label").agg(count(lit(1)).as("n"))
          .orderBy("label")
      },
      Some("""WITH l AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS v FROM orders
             |), dim AS (
             |  SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS dv
             |  FROM orders
             |)
             |SELECT coalesce(dv, '(none)') AS label,
             |  CAST(count(1) AS BIGINT) AS n
             |FROM l JOIN dim ON v IS NOT DISTINCT FROM dv
             |GROUP BY 1 ORDER BY label""".stripMargin)),

    // ------------------------------------------- skew-salted fact join
    // the SKEWED-JOIN mitigation, made explicit (AQE's skew-join split
    // only fires on sort-merge joins past runtime thresholds; a pipeline
    // that KNOWS its hot keys salts deterministically): the fact side
    // tags every row with salt = hash(unique id) % R, the dim side
    // replicates R× (a bounded explode — R·|dim| rows), and the join key
    // becomes (custkey, salt), splitting any hot customer's rows across
    // R reducers instead of one straggler. CORRECTNESS is salt-invariant
    // — every fact row still meets exactly one dim copy — so the oracle
    // is the PLAIN join: the key proves the mitigation preserves
    // semantics, and the salt hash can stay Spark-native (xxhash64, no
    // cross-engine contract needed). The dim explode rides a broadcast
    // at bench scale; at 100 TB with a big dim you'd salt only the
    // measured-hot keys (the q_agg_salted hybrid), same algebra.
    QueryDef("q_join_skew_salted",
      (s, d) => {
        val fact = t(s, d, "orders").select("o_custkey", "o_totalprice",
          "o_orderkey")
        val dim = broadcast(t(s, d, "customer")
          .select("c_custkey", "c_nationkey"))
        saltedEquiJoin(fact, dim, "o_custkey", "c_custkey",
            saltBy = "o_orderkey", salts = 8)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(D386)).cast(DoubleType).as("turnover"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, CAST(count(1) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             |    AS turnover
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // ------------------------------------------- count-min sketch
    // the COUNT-MIN frequency sketch expressed as relational algebra —
    // d=4 hash rows × w=64 buckets of plain counters, built in ONE
    // map-side-combinable aggregation (the per-row explode emits d
    // fixed rows, so sketch construction is a single pass whatever the
    // fact size, and two sketches MERGE by adding counters — the
    // mergeability that makes it a 100 TB pre-aggregation primitive).
    // Point estimates then read min-over-d bucket counters: an upper
    // bound on the true count, over-counting only from bucket
    // collisions. The key emits (part, exact, est, overcount ≥ 0) for
    // the 10 hottest parts — overcount = 0 everywhere at this w/|keys|
    // ratio would be suspicious; the report shows the bound and its
    // slack. Hashing is pure INTEGER multiplicative hashing — one
    // multiply + two mods per (row, i), all inside whole-stage codegen
    // and bit-identical on any engine (the first cut hashed md5 strings:
    // 4 digest+parse calls per row, measured 2.6 s at sf0.1; the
    // integer form is arithmetic only). Row i's multiplier is an odd
    // 32-bit constant; products stay < 2^63 for any 31-bit key.
    QueryDef("q_sketch_countmin",
      (s, d) => {
        val W = 64
        val A = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
        def bucket(i: Int) =
          s"CAST(((l_partkey * ${A(i)}L + ${i + 1}) % 2147483647) % $W AS INT)"
        val hashes = (0 until 4).map(i => struct(lit(i).as("h"),
          expr(bucket(i)).as("b")))
        val sketch = t(s, d, "lineitem").select(col("l_partkey"),
            explode(array(hashes: _*)).as("hb"))
          .groupBy(col("hb.h").as("h"), col("hb.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
        val exact = t(s, d, "lineitem").groupBy("l_partkey")
          .agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("l_partkey")).limit(10)
        val probes = exact.select(col("l_partkey"), col("exact_n"),
          explode(array(hashes: _*)).as("hb"))
        probes.join(broadcast(sketch),
            col("hb.h") === col("h") && col("hb.b") === col("b"))
          .groupBy("l_partkey", "exact_n")
          .agg(min(col("cnt")).as("est_n"))
          .select(col("l_partkey"), col("exact_n"), col("est_n"),
            (col("est_n") - col("exact_n")).as("overcount"))
          .orderBy("l_partkey")
      },
      Some("""WITH sketch AS (
             |  SELECT h,
             |    CAST(((l_partkey * a + h + 1) % 2147483647) % 64 AS INT)
             |      AS b,
             |    CAST(count(1) AS BIGINT) AS cnt
             |  FROM lineitem, (SELECT unnest(ARRAY[0,1,2,3]) AS h,
             |    unnest(ARRAY[2654435761, 2246822519, 3266489917,
             |                 668265263]) AS a)
             |  GROUP BY 1, 2
             |), exact AS (
             |  SELECT l_partkey, CAST(count(1) AS BIGINT) AS exact_n
             |  FROM lineitem GROUP BY 1
             |  ORDER BY exact_n DESC, l_partkey LIMIT 10
             |)
             |SELECT l_partkey, exact_n, min(cnt) AS est_n,
             |  min(cnt) - exact_n AS overcount
             |FROM exact, sketch
             |WHERE CAST(((l_partkey * (CASE h WHEN 0 THEN 2654435761
             |    WHEN 1 THEN 2246822519 WHEN 2 THEN 3266489917
             |    ELSE 668265263 END) + h + 1) % 2147483647) % 64 AS INT) = b
             |GROUP BY 1, 2
             |ORDER BY l_partkey""".stripMargin))
  )
}
