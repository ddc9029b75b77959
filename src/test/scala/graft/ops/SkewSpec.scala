package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime half of the skew story (the
  * compile-time half is the salted aggregation in q_agg_salted): a hot
  * key's oversized shuffle partition is split into multiple tasks by
  * adaptive execution, which is what keeps one straggler from serializing
  * a 100 TB join. */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, ~95% on one key → one shuffle partition dwarfs the rest
      val skewed = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 16).as("key"),
        concat(lit("payload_payload_payload_"), col("id")).as("payload"))
      val dim = spark.range(16).select(col("id").as("key"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = skewed.join(dim, "key")
      // collect() on THIS df so ITS adaptive plan finalizes
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("salted aggregation stays exact under a 95%-hot-key skew") {
    // 300k rows, 95% on one key — the compile-time skew pattern
    // (q_agg_salted's two-phase shape) must agree with the naive GROUP BY
    // to the last decimal digit
    val skewed = spark.range(300000).select(
      col("id"),
      when(col("id") % 20 =!= 0, lit("HOT"))
        .otherwise(concat(lit("k"), col("id") % 16)).as("key"),
      (col("id") % 97).cast("double").as("x"))
    val (naive, tNaive) = timed {
      skewed.groupBy("key")
        .agg(sum(col("x").cast("decimal(38,6)")).cast("double").as("sum_x"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    }
    val (salted, tSalted) = timed {
      skewed.withColumn("salt", pmod(col("id"), lit(8)))
        .groupBy("key", "salt")
        .agg(sum(col("x").cast("decimal(38,6)")).as("px"), count(lit(1)).as("pn"))
        .groupBy("key")
        .agg(sum("px").cast("double").as("sum_x"), sum("pn").as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    }
    info(f"SKEWBENCH agg: naive $tNaive%.2f s, salted $tSalted%.2f s (300k rows, 95%% hot)")
    assert(salted == naive, "salting must be semantics-preserving under skew")
    // HOT + the four cold keys multiples of 20 reach mod 16 ({0,4,8,12})
    assert(naive.size == 5)
  }

  test("simhash bucket sizing stays parallel under a one-signature corpus") {
    import spark.implicits._
    // 200k docs where 99% share ONE signature (boilerplate corpus): the
    // old count(*)-over-window form sorts all 198k rows of that signature
    // in a single task; the groupBy+broadcast-join form keeps every
    // shuffle partition bounded and must produce identical rows
    val n = 200000
    val sigs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 100 =!= 0, lit(42L)).otherwise(col("id") % 16).as("simhash"))
    val got = Dedup.simhashBuckets(sigs)
    val rows = got.collect()
    assert(rows.length == n)
    val bySig = rows.groupBy(_.getLong(1)).map { case (s, rs) =>
      s -> rs.map(_.getLong(2)).distinct.toSeq
    }
    assert(bySig(42L) == Seq(n - n / 100),
      s"hot signature must count all its members: ${bySig(42L)}")
    // cold ids (multiples of 100) land on {0,4,8,12} — 4 cold signatures
    assert(bySig.size == 5 && bySig.forall(_._2.length == 1),
      s"expected the hot signature plus 4 cold ones: ${bySig.keySet}")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"degenerate signature must not serialize into one Window task:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-count side must broadcast:\n$p")
  }

  test("asofJoin stays tractable and exact under a 100k-event hot key") {
    import spark.implicits._
    // The as-of window partitions by key, so one hyperactive user — the
    // documented honest limit (Temporal.scala scale note) — sorts all
    // its events in ONE task. That's O(n log n) with a one-struct carry,
    // no pair blowup: this fixture pins the bound at 100k events on one
    // key (vs the broadcast-max_by plan, which pays |left|×|right| pairs
    // per key and would need ~2.5G comparisons here). Exactness is
    // checked against the closed form: left t matches right floor(t/10)*10.
    val n = 100000
    val left = spark.range(n).select(lit(7L).as("k"), col("id").as("t"))
    val right = spark.range(n / 10).select(
      lit(7L).as("k"), (col("id") * 10).as("rt"),
      (col("id") * 10).as("payload"))
    val (rows, secs) = timed {
      graft.Graft.asofJoin(left, right, Seq("k"), "t", "rt").collect()
    }
    info(f"SKEWBENCH asof: $n%d-event hot key in $secs%.2f s")
    assert(rows.length == n)
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) / 10 * 10),
      "every left row must match the most recent right row at or before it")
    // the epochWidth scale dial: identical rows, but the heavy work
    // partitions by (k, __epoch) — the hot key spreads over n/w epoch
    // tasks instead of one
    val chunkedDf = graft.Graft.asofJoin(left, right, Seq("k"), "t", "rt",
      epochWidth = Some(1000L))
    val (chunked, secsC) = timed(chunkedDf.collect())
    info(f"SKEWBENCH asof chunked(w=1000): same hot key in $secsC%.2f s")
    assert(chunked.length == n)
    assert(chunked.forall(r => r.getLong(2) == r.getLong(1) / 10 * 10),
      "chunked as-of must produce the identical match for every row")
    val p = chunkedDf.queryExecution.executedPlan.toString
    assert(p.contains("__epoch"),
      s"the in-epoch pass must partition by the time chunk:\n$p")
    // the carry side is epoch-summary-sized (n/w = 100 rows here), so
    // AQE must resolve the fix-up join to a broadcast. A positive
    // BroadcastHashJoin check could be satisfied by the tiny
    // axis⋈lastPerEpoch join alone — assert the absence of any
    // sort-merge join in the FINAL plan instead: if the fix-up join
    // ever re-shuffled the raw rows (the pathology under test), it
    // would surface as a SortMergeJoin here
    assert(!p.split("== Initial Plan ==").head.contains("SortMergeJoin"),
      s"no join in the chunked as-of may shuffle the raw rows:\n$p")
  }

  test("asofJoin auto-dispatch: the measured hot key routes to the chunked arm by itself") {
    import spark.implicits._
    // The measured dispatch (Temporal.asofAutoWidth) behind the facade's
    // epochWidth=None default: below the gate → windowed (None), above
    // it → an auto-chosen width — no human editing a constant per
    // corpus. The fixture straddles epoch boundaries (matches at t%10=0
    // can precede the left row's epoch), so arm equality exercises the
    // carry level, not just in-epoch matches.
    val n = 20000
    val left = spark.range(n).select(lit(7L).as("k"), col("id").as("t"))
    val right = spark.range(n / 10).select(
      lit(7L).as("k"), (col("id") * 10).as("rt"),
      (col("id") * 10).as("payload"))
    // decision pin: under the gate stays windowed; over it picks a width
    assert(graft.ops.Temporal.asofAutoWidth(
      left, right, Seq("k"), "t", "rt").isEmpty,
      "a 22k-row key is far below the production gate — must stay windowed")
    val w = graft.ops.Temporal.asofAutoWidth(
      left, right, Seq("k"), "t", "rt", hotKeyMax = 1000L)
    assert(w.exists(_ >= 1L),
      s"a key over the (lowered) gate must dispatch to a chunked width: $w")
    // non-integral time columns can never chunk, whatever the volume
    assert(graft.ops.Temporal.asofAutoWidth(
      left.withColumn("t", col("t").cast("double")), right,
      Seq("k"), "t", "rt", hotKeyMax = 1000L).isEmpty,
      "non-integral time columns must always take the windowed arm")
    // arm equality: the auto-chunked result is row-for-row the windowed one
    val windowed = graft.ops.Temporal.asofJoin(
      left, right, Seq("k"), "t", "rt").orderBy("t").collect()
    val auto = graft.ops.Temporal.asofJoinAuto(
      left, right, Seq("k"), "t", "rt", hotKeyMax = 1000L)
      .orderBy("t").collect()
    assert(auto.toSeq == windowed.toSeq,
      "auto-dispatched chunked arm must equal the windowed arm row for row")
    // forward direction shares the dispatch through the same entry
    val fwdWindowed = graft.Graft.asofJoin(
      left, right, Seq("k"), "t", "rt", forward = true)
      .orderBy("t").collect()
    val fwdAuto = graft.ops.Temporal.asofJoinAuto(
      left, right, Seq("k"), "t", "rt", forward = true, hotKeyMax = 1000L)
      .orderBy("t").collect()
    assert(fwdAuto.toSeq == fwdWindowed.toSeq,
      "forward auto-dispatch must equal the forward windowed arm")
  }

  test("stream interval join: hot-user pairs are the answer; chunking spreads them exactly") {
    import spark.implicits._
    // ONE user owns every event: C clicks × P purchases all inside the
    // join window. The pairs ARE the query result (unlike a candidate
    // generator, no guard may drop them), so the honest bound is C·P
    // OUTPUT rows — what this fixture pins is (a) that bound exactly and
    // (b) that the chunked variant produces the IDENTICAL pair set while
    // keying the join on (user, time-chunk), so the hot user's state and
    // pair work spread over many partitions instead of one.
    val c = 400
    val p = 400
    // clicks at t=0..399s, purchases at t=300..699s, window 30 min →
    // every (click, purchase) pair matches: 160k pairs from one user
    val clicks = spark.range(c).select(col("id").as("click_id"),
      lit(7L).as("user_id"),
      expr("timestamp_micros(id * 1000000)").as("click_ts"))
    val purchases = spark.range(p).select(col("id").as("purchase_id"),
      lit(7L).as("p_user_id"),
      expr("timestamp_micros((id + 300) * 1000000)").as("p_ts"),
      lit(1.0).as("value"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (plain, secs) = timed(
      pairs(graft.streaming.Streams.intervalJoin(clicks, purchases)))
    info(f"SKEWBENCH interval: $c x $p hot user -> ${plain.size}%d pairs in $secs%.2f s")
    // every pair within the window matches: p_ts - click_ts ∈ [−99, 699]s
    // intersected with [0, 1800]s → exactly the pairs with p_ts >= click_ts
    val expected = (for {
      ci <- 0L until c; pi <- 0L until p
      if pi + 300 >= ci // p_ts >= click_ts; upper bound never binds here
    } yield (ci, pi)).toSet
    assert(plain == expected, "the interval join must emit every in-window pair")
    // chunked: same rows, bit-for-bit, with the join keyed on
    // (user_id, time-chunk) — chunk width 30 min = the window, the
    // tightest legal width
    val chunkedDf = graft.streaming.Streams.intervalJoinChunked(
      clicks, purchases, windowSeconds = 1800L, chunkSeconds = 1800L)
    val (chunked, secsC) = timed(pairs(chunkedDf))
    info(f"SKEWBENCH interval chunked: same fixture in $secsC%.2f s")
    assert(chunked == plain,
      "chunking must not add or lose a single pair (exact decomposition)")
    val plan = chunkedDf.queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"),
      s"the chunked join must key on the time chunk:\n$plan")
    // a chunk narrower than the window would drop cross-chunk pairs —
    // the require is the guard rail
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streams.intervalJoinChunked(
        clicks, purchases, windowSeconds = 1800L, chunkSeconds = 60L)
    }
    assert(e.getMessage.contains("chunkSeconds"), e.getMessage)
  }

  test("hot-bucket guard beats the naive self-join on an adversarial bucket") {
    import spark.implicits._
    // 5k docs sharing ONE band value: naive candidate generation emits
    // n(n-1)/2 = 12,497,500 pairs from a single bucket; the sub-salted
    // guard (cap=16) emits ~n·cap/2 — three orders of magnitude fewer —
    // and must also be measurably faster, since the naive twin pays two
    // shuffles of the quadratic pair list
    val n = 5000
    val bands = (0 until n).map(i => (i.toLong, 0, 1L))
      .toDF("doc_id", "band_idx", "band_val").cache()
    bands.count()
    try {
      val (guarded, tGuarded) = timed(Dedup.candidatesFromBands(bands, cap = 16).count())
      val (naive, tNaive) = timed {
        val l = bands.toDF("doc_a", "band_idx", "band_val")
        val r = bands.toDF("doc_b", "band_idx", "band_val")
        l.join(r, Seq("band_idx", "band_val"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().count()
      }
      info(f"SKEWBENCH candidates: naive $naive%d pairs in $tNaive%.2f s, " +
        f"guarded $guarded%d pairs in $tGuarded%.2f s (n=$n, cap=16)")
      assert(naive == n.toLong * (n - 1) / 2)
      assert(guarded < naive / 100,
        s"guard must cut pair output by orders of magnitude: $guarded vs $naive")
      // the real invariant is the pair-count bound above; the wall-clock
      // check keeps 2× slack so load spikes / JIT noise can't flake it,
      // while a guard slower than HALF the quadratic twin still fails
      // loudly (timing narrative lives in info() + BASELINE.md)
      assert(tGuarded < tNaive * 2,
        f"guarded generation ($tGuarded%.2f s) should not approach the " +
          f"quadratic naive twin ($tNaive%.2f s)")
    } finally bands.unpersist()
  }
}
