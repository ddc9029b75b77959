package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Cluster-resolution consistency: the keep-list must be a fixpoint of the
  * label propagation (an early-stopped iteration would break every one of
  * these invariants). */
class DedupSpec extends SparkSpec {

  private lazy val resolved =
    SparkEntry.queries("q_dedup_resolve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  private lazy val pairs =
    SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("every doc's survivor is itself or a smaller doc, and survivors self-map") {
    assert(resolved.nonEmpty)
    resolved.foreach { case (doc, keep, isSurvivor) =>
      assert(keep <= doc, s"survivor $keep > doc $doc")
      assert(isSurvivor == (keep == doc))
    }
    val keepSet = resolved.map(_._2).toSet
    val survivorDocs = resolved.filter(_._3).map(_._1).toSet
    assert(keepSet == survivorDocs,
      "every referenced survivor must itself resolve as a survivor")
  }

  test("both endpoints of every candidate pair land in the same component") {
    val keepOf = resolved.map(r => r._1 -> r._2).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(keepOf(a) == keepOf(b),
        s"pair ($a, $b) split across components ${keepOf(a)} / ${keepOf(b)}")
    }
  }

  test("components are genuine: at least one multi-doc cluster resolves") {
    val sizes = resolved.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.max >= 2, "expected at least one near-dup cluster")
  }

  test("pointer jumping: a deep chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // worst case for plain HashMin: one long chain 0-1-2-…-64
    // (diameter 64, far past the mandated ≥8). Plain HashMin needs ~64
    // rounds; path doubling must stay within log₂(64)+c.
    val diameter = 64
    val edges = (0 until diameter).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_a", "doc_b")
    // driverMax = 0 forces the DISTRIBUTED path (the default would take
    // the small-graph union-find shortcut and skip the BSP loop entirely)
    val (labels, rounds) = Dedup.connectedComponents(edges, driverMax = 0)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == diameter + 1)
    got.foreach { case (doc, keep) =>
      assert(keep == 0L, s"doc $doc resolved to $keep, expected component min 0")
    }
    val bound = math.ceil(math.log(diameter) / math.log(2)).toInt + 3
    assert(rounds <= bound,
      s"chain of diameter $diameter took $rounds rounds, expected ≤ $bound")
  }

  test("forest of components resolves each to its own min label — both paths agree") {
    import spark.implicits._
    // two chains + a triangle + an isolated edge, interleaved ids
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),          // chain A → min 10
      (20L, 25L), (25L, 22L),                      // chain B → min 20
      (30L, 31L), (31L, 32L), (30L, 32L),          // triangle → min 30
      (40L, 41L)                                   // pair → min 40
    ).toDF("doc_a", "doc_b")
    val expected = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 25L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L,
      40L -> 40L, 41L -> 40L)
    // small-graph driver union-find (the default path for this size)
    val (fast, fastRounds) = Dedup.connectedComponents(edges)
    assert(fastRounds == 0, "small graphs must take the zero-round fast path")
    assert(fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    // distributed BSP path — identical labels
    val (bsp, _) = Dedup.connectedComponents(edges, driverMax = 0)
    assert(bsp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
  }

  test("multi-probe embedding near-dup recovers boundary pairs single-probe misses") {
    def pairsAt(nprobe: Int) =
      Dedup.embeddingMultiprobePairs(spark, sfDir, nprobe, minCosine = 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairsAt(1)
    val multi = pairsAt(2)
    assert(single.subsetOf(multi),
      "widening the probe set must never lose a pair")
    val recovered = multi -- single
    assert(recovered.nonEmpty,
      "expected ≥1 true near-dup pair straddling a cell boundary " +
        "(both vectors above the cosine threshold but in different primary cells)")
  }

  test("quantized candidate stage: full recall vs the exact sibling, identical cosines") {
    // the int8 candidate path may only lose a pair if quantization error
    // exceeds the margin (0.05 default — an order of magnitude above the
    // affine dot's error bound on this fixture); precision is structural
    // (stage 2 applies the exact cosine at the real threshold). Equality
    // of the full (pair, cosine) sets proves both directions at once.
    val exact = Dedup.embeddingMultiprobePairs(spark, sfDir,
        nprobe = 2, minCosine = 0.45)
      .select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ONE materialization of the quantized pipeline serves both checks
    val quantRows = Dedup.embeddingNearDupsQuantized(spark, sfDir,
        nprobe = 2, minCosine = 0.45)
      .select("vec_a", "vec_b", "cosine", "approx_cos").collect()
    val quant = quantRows
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(quant == exact,
      s"quantized candidates must keep full recall at margin 0.05: " +
        s"lost=${(exact -- quant).take(5)} gained=${(quant -- exact).take(5)}")
    // margin headroom, measured: the affine code dot's error on real
    // embeddings is ~0.0016 max here — the 0.05 margin carries >5×
    // slack even against this 0.01 ceiling, so "full recall in
    // practice" is arithmetic, not luck (quantRows is non-empty: quant
    // == exact and exact was asserted non-empty above)
    val maxErr = quantRows
      .map(r => math.abs(r.getDouble(2) - r.getDouble(3))).max
    assert(maxErr < 0.01,
      f"int8 approximation error $maxErr%.4f exceeds the headroom ceiling")
  }

  test("simhash64 codegen expression ≡ the oracle's SQL arithmetic, doc for doc") {
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val viaExpr = Dedup.simhash64(spark, sfDir).collect().map(key).toMap
    val viaSql = Dedup.simhash64ViaSql(spark, sfDir).collect().map(key).toMap
    assert(viaExpr.nonEmpty && viaExpr == viaSql,
      s"fused expression diverged from the SQL formulation on " +
        s"${(viaExpr.keySet | viaSql.keySet).count(k => viaExpr.get(k) != viaSql.get(k))} docs")
  }

  test("simhash hamming: block join recovers EVERY Hamming-≤3 pair (pigeonhole recall)") {
    val sigs = Dedup.simhash64(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    // the exact-recall contract is two-regime: it holds while no
    // (block_idx, block_val) bucket exceeds the hot-bucket cap (past
    // the cap the subSalt guard trades bounded recall loss for the
    // O(cap·n) pair bound). Pin that this fixture sits in the exact
    // regime, so the brute-force equality below tests what it claims.
    val maxBucket = sigs.flatMap { case (_, bs) => bs.zipWithIndex }
      .groupBy(identity).values.map(_.length).max
    assert(maxBucket <= Dedup.MaxBand,
      s"fixture has a hot block ($maxBucket docs > cap ${Dedup.MaxBand}) — " +
        "the exact-recall regime no longer applies and this test is vacuous")
    val brute = (for {
      (da, sa) <- sigs; (db, sb) <- sigs if da < db
      h = (0 until 4).map(k => java.lang.Long.bitCount(sa(k) ^ sb(k))).sum
      if h <= 3
    } yield (da, db, h.toLong)).toSet
    val got = SparkEntry.queries("q_dedup_simhash_hamming")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"block join ≠ brute force: missing ${brute -- got}, extra ${got -- brute}")
  }

  test("hot-bucket guard: adversarial single-band bucket emits O(K·n), not O(n²), pairs") {
    import spark.implicits._
    // 5k docs all sharing ONE band value — the boilerplate-band nightmare.
    // Unguarded self-join output: n(n-1)/2 ≈ 12.5M pairs from one bucket.
    val n = 5000
    val cap = 16
    val bands = (0 until n).map(i => (i.toLong, 0, 1L))
      .toDF("doc_id", "band_idx", "band_val")
    val got = Dedup.candidatesFromBands(bands, cap).count()
    assert(got > 0, "sub-salting must still compare docs inside sub-buckets")
    // uniform-hash sub-buckets of ~cap docs → ~n·cap/2 pairs; assert the
    // linear bound with slack for hash unevenness, and strict sub-quadratic
    assert(got <= 2L * n * cap,
      s"guard failed: $got pairs from one hot bucket (linear bound ${2L * n * cap})")
    assert(got < n.toLong * (n - 1) / 8,
      s"guard failed: $got pairs is still quadratic-scale")
  }

  test("hot-bucket guard is a provable no-op for buckets at or under the cap") {
    import spark.implicits._
    // buckets of size 5, 3, 2 (≤ cap) → ceil(n/cap)=1 → salt ≡ 0 → output
    // must equal the UNGUARDED self-join exactly
    val rows =
      (0 until 5).map(i => (i.toLong, 0, 10L)) ++
      (10 until 13).map(i => (i.toLong, 0, 20L)) ++
      (20 until 22).map(i => (i.toLong, 1, 10L))
    val bands = rows.toDF("doc_id", "band_idx", "band_val")
    val naive = {
      val l = bands.toDF("doc_a", "band_idx", "band_val")
      val r = bands.toDF("doc_b", "band_idx", "band_val")
      l.join(r, Seq("band_idx", "band_val"))
        .filter($"doc_a" < $"doc_b").select("doc_a", "doc_b").distinct()
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val guarded = Dedup.candidatesFromBands(bands, cap = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guarded == naive,
      "guard altered candidates although no bucket exceeds the cap")
    assert(naive.size == 10 + 3 + 1, "fixture sanity: C(5,2)+C(3,2)+C(2,2)")
  }

  test("sub-salt splits an oversized bucket into ceil(n/cap) sub-buckets deterministically") {
    import spark.implicits._
    val bands = (0 until 100).map(i => (i.toLong, 0, 1L))
      .toDF("doc_id", "band_idx", "band_val")
    val salted = Dedup.subSalt(bands, Seq("band_idx", "band_val"), "doc_id", cap = 10)
    val salts = salted.select("__salt").collect().map(_.getLong(0))
    assert(salts.forall(s0 => s0 >= 0 && s0 < 10), "salt must be in [0, ceil(n/cap))")
    assert(salts.distinct.length > 1, "an oversized bucket must actually split")
    // determinism: same input → same salts
    val again = Dedup.subSalt(bands, Seq("band_idx", "band_val"), "doc_id", cap = 10)
      .select("doc_id", "__salt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = salted.select("doc_id", "__salt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("a finite maxCell cap emits a strict subset of the unguarded candidate pairs") {
    // minCosine = -1 exposes the raw candidate level (thresholding would
    // hide the cap's effect when all near-dups survive the split anyway)
    def pairsAt(cap: Int) =
      Dedup.embeddingMultiprobePairs(spark, sfDir, nprobe = 2,
        minCosine = -1.0, maxCell = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairsAt(Int.MaxValue)
    val capped = pairsAt(2)
    assert(capped.subsetOf(full),
      "a sub-cell pair shares its cell — the cap can only remove pairs")
    assert(capped.size < full.size,
      s"cap=2 must split cells and drop cross-sub-cell pairs " +
        s"(${capped.size} vs ${full.size})")
    assert(capped.nonEmpty, "sub-cells still compare their members")
  }

  test("guarded candidate generation is repartition-stable") {
    import spark.implicits._
    // salts derive from content (md5 of doc_id) and bucket counts, never
    // from partition layout — so physical repartitioning must not change
    // the candidate set (greedy/per-partition schemes fail exactly here)
    val rnd = new scala.util.Random(11)
    val bands = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(2), rnd.nextInt(5).toLong)
    }.toDF("doc_id", "band_idx", "band_val")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.candidatesFromBands(df, cap = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs(bands)
    assert(base.nonEmpty)
    assert(pairs(bands.repartition(7)) == base)
    assert(pairs(bands.repartition(1)) == base)
  }

  test("incremental verdicts: coverage, precedence, and pair consistency") {
    import org.apache.spark.sql.functions._
    val v = SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3)))
    // exactly the doc_id % 7 == 0 slice, each doc once
    val expectedIds = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(v.map(_._1).toSet == expectedIds && v.length == expectedIds.size)
    // verdict is a pure function of the two signals, exact first
    v.foreach { case (id, ex, nb, verdict) =>
      val want = if (ex) "drop_exact" else if (nb >= 1) "drop_near" else "keep"
      assert(verdict == want, s"doc $id: ($ex, $nb) -> $verdict")
      assert(nb >= 0 && nb <= 4)
    }
    // the salted full-corpus pairs are a SUBSET of unsalted bucket
    // sharing: any minhash pair straddling the batch boundary must have
    // given its new endpoint n_bands_old >= 1
    val nbOf = v.map(r => r._1 -> r._3).toMap
    val isNew = (id: Long) => id % 7 == 0
    pairs.foreach { case (a, b) =>
      for ((nw, old) <- Seq((a, b), (b, a)) if isNew(nw) && !isNew(old))
        assert(nbOf(nw) >= 1,
          s"pair ($a,$b): new doc $nw saw no old bucket")
    }
    // at least one of each verdict fires on the fixture corpus
    val verdicts = v.map(_._4).toSet
    assert(verdicts.contains("keep"))
    assert(verdicts.contains("drop_near") || verdicts.contains("drop_exact"))
  }

  test("containment dominates Jaccard on every shared pair and exposes asymmetry") {
    val cont = graft.SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val jac = graft.SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.nonEmpty, "the fixture corpus must surface containment pairs")
    cont.values.foreach { case (ca, cb) =>
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0,
        s"containment out of range: ($ca, $cb)")
    }
    // |∩|/|a| ≥ |∩|/|a ∪ b| always, so every Jaccard-reported pair must
    // appear here (threshold 0.4 > 0.3 is covered by the dominance) with
    // BOTH directions at or above its Jaccard (rounding gives 1e-6 slack)
    jac.foreach { case (pair, j) =>
      if (j >= 0.4) {
        val (ca, cb) = cont.getOrElse(pair,
          fail(s"pair $pair has jaccard $j but no containment row"))
        assert(ca >= j - 1e-6 && cb >= j - 1e-6,
          s"containment ($ca, $cb) below jaccard $j for $pair")
      }
    }
    // the measure must actually be asymmetric somewhere: a pair whose two
    // directions differ (a short side contained more fully than the long)
    assert(cont.values.exists { case (ca, cb) => math.abs(ca - cb) > 1e-6 },
      "no asymmetric pair found — containment degenerated to Jaccard")
  }

  test("segment scrub deletes exactly the corpus-repeated segments and reassembles in order") {
    import spark.implicits._
    // 3 identical boilerplate docs (every segment repeats 3×), one clean
    // doc, one doc quoting the boilerplate at a segment-aligned offset,
    // and a 4-token doc exercising the short tail segment
    val boiler = "aa bb cc dd ee ff"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "uu vv ww xx yy zz"),
      (5L, "xx yy zz aa bb cc"), // segment 2 = "aa bb cc" → 4th occurrence
      (6L, "k1 k2 k3 k4")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedSegments(docs, segTokens = 3, minRepeat = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // all-boilerplate docs collapse to empty, both segments dropped
    for (id <- Seq(1L, 2L, 3L)) assert(got(id) == (("", 2L, 2L)), got(id))
    // the clean doc reassembles byte-identically
    assert(got(4L) == (("uu vv ww xx yy zz", 2L, 0L)))
    // only the boilerplate-aligned segment is deleted; order preserved
    assert(got(5L) == (("xx yy zz", 2L, 1L)))
    // short tail: segments "k1 k2 k3" + "k4", both unique, both kept
    assert(got(6L) == (("k1 k2 k3 k4", 2L, 0L)))
  }

  test("segment scrub is repartition-stable and guards its thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(12)("w" + rnd.nextInt(6)).mkString(" ")
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      Dedup.scrubRepeatedSegments(docs.repartition(parts), 3, 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(5), "scrub output must not depend on partitioning")
    intercept[IllegalArgumentException] {
      Dedup.scrubRepeatedSegments(docs, segTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.scrubRepeatedSegments(docs, minRepeat = 1)
    }
  }

  test("keep-best representative: longest member wins, ties break to lowest id") {
    val reps = Dedup.clusterRepresentatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reps.nonEmpty, "fixture corpus should resolve some clusters")
    // replay the argmax per cluster from the shared membership + doc table
    val members = Dedup.resolveClusters(spark, sfDir)
      .select("doc_id", "keep_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = members.groupBy(_._2).map { case (keep, ms) =>
      val ids = ms.map(_._1)
      val best = ids.map(id => (chars(id), -id)).max
      (keep, -best._2, best._1, ids.length.toLong)
    }.toSet
    assert(reps.toSet == expect,
      s"representatives diverged from the driver replay")
  }

  test("BSP parallelism scales with measured candidate volume") {
    // tiny graph → 1 partition (single-task rounds, the sf0.1 shape)
    assert(Dedup.partitionsFor(rows = 40, rowsPerTask = 1L << 20, maxParts = 32) == 1)
    // 5M rows at 1M/task → 5 tasks
    assert(Dedup.partitionsFor(5000000L, 1L << 20, 32) == 5)
    // dirty-corpus blowup caps at the cluster's parallelism
    assert(Dedup.partitionsFor(1L << 40, 1L << 20, 32) == 32)
    // never zero
    assert(Dedup.partitionsFor(0L, 1L << 20, 32) == 1)
  }

  test("hot corpus-wide tokens never generate prefix candidates") {
    import spark.implicits._
    // 400 docs, EVERY doc shares 3 stopwords; each doc also carries 5
    // unique tokens. Naive any-shared-token candidates: 400·399/2 =
    // 79,800 pairs. Rarest-first prefixes (n=8, t=0.5 → prefix 5)
    // hold only the unique tokens (df=1 sorts before df=400), so the
    // prefix join generates ZERO candidates — and zero true pairs
    // exist (J = 3/13 < 0.5), so completeness holds trivially.
    val tok = (0L until 400L).flatMap { i =>
      Seq("the", "and", "of").map(i -> _) ++
        (0 until 5).map(k => i -> s"u${i}_$k")
    }.toDF("doc_id", "token")
    assert(Dedup.prefixCandidates(tok, 0.5).count() == 0,
      "hot-token pairs leaked into the candidate set")
    assert(Dedup.prefixJaccardJoin(tok, 0.5).count() == 0)
    // a planted near-dup pair IS still found through its rare tokens
    val tok2 = tok.unionAll(Seq(
      (1000L, "x1"), (1000L, "x2"), (1000L, "x3"), (1000L, "the"),
      (1001L, "x1"), (1001L, "x2"), (1001L, "x3"), (1001L, "and"))
      .toDF("doc_id", "token"))
    val found = Dedup.prefixJaccardJoin(tok2, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(found.toSeq == Seq((1000L, 1001L)),
      s"planted pair missing or extras present: ${found.toSeq}")
  }

  test("FP-boundary threshold keeps J-exactly-t pairs (t=0.55, n=20)") {
    import spark.implicits._
    // 20*0.55 = 11.000000000000002 in doubles: an unguarded ceil reads
    // 12, shrinking doc A's prefix to 9 tokens — exactly its 9 unique
    // (df=1, rarest-first) tokens — so the planted boundary pair with
    // J EXACTLY 0.55 loses its only shared prefix token and vanishes.
    // Doc A: 9 unique + 11 shared tokens (n=20); doc B: the same 11
    // shared tokens (n=11). J = 11 / (20 + 11 - 11) = 0.55 exactly.
    val shared = (0 until 11).map(k => f"s$k%02d")
    val tok = (shared.map(1L -> _) ++
      (0 until 9).map(k => 1L -> s"uniq_a_$k") ++
      shared.map(2L -> _)).toDF("doc_id", "token")
    val got = Dedup.prefixJaccardJoin(tok, 0.55).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.55)),
      s"boundary pair at J = t dropped by FP-inflated ceil: $got")
  }

  test("prefix-filtered Jaccard join is COMPLETE vs brute force at several thresholds") {
    import spark.implicits._
    // deterministic synthetic corpus: 40 docs over a 25-token
    // vocabulary with heavily skewed frequencies (token k appears in
    // docs whose id ≡ 0 mod (k % 7 + 1)) — many shared hot tokens, a
    // realistic worst case for candidate blowup and for misses
    val docTokens: Seq[(Long, Seq[String])] = (0L until 40L).map { i =>
      i -> (0 until 25).filter(k => i % (k % 7 + 1) == k % 3)
        .map(k => s"t$k")
    }
    def bruteForce(t: Double): Set[(Long, Long, Double)] = (for {
      (a, ta) <- docTokens; (b, tb) <- docTokens if a < b
      inter = ta.toSet.intersect(tb.toSet).size
      uni = ta.toSet.union(tb.toSet).size
      if uni > 0
      j = inter.toDouble / uni if j >= t
    } yield (a, b,
      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
    val tok = docTokens.flatMap { case (id, ts) => ts.map(id -> _) }
      .toDF("doc_id", "token")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.prefixJaccardJoin(tok, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == bruteForce(t),
        s"prefix filter at t=$t diverged from brute force: " +
          s"missing=${bruteForce(t) -- got}, extra=${got -- bruteForce(t)}")
    }
  }

  test("prefix resolve with exact-collapse equals direct join+components on a mixed corpus") {
    import spark.implicits._
    // the composed operator's collapse legality in one fixture: identical
    // token SETS under different doc_ids and orders/multiplicities
    // (docs 0,7,13 — a 3-group whose rep has external near-dup edges;
    // docs 20,21 — an identical pair whose rep has NO external edge and
    // must still form its own component), near-dup distinct texts
    // (8,9 vs 0's group at J≥0.5), a singleton with an edge (3-4) and a
    // true singleton (99) that must be absent from the output
    val docTokens: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("a", "b", "c", "d"),
      7L -> Seq("d", "c", "b", "a"),          // same set, reversed order
      13L -> Seq("a", "a", "b", "c", "d"),    // same set, dup multiplicity
      8L -> Seq("a", "b", "c", "e"),          // J=3/5=0.6 vs {a,b,c,d}
      9L -> Seq("a", "b", "c", "d", "e"),     // J=4/5=0.8 vs {a,b,c,d}
      20L -> Seq("x", "y", "z"),
      21L -> Seq("z", "y", "x"),              // isolated identical pair
      3L -> Seq("p", "q"),
      4L -> Seq("p", "q", "r"),               // J=2/3≈0.67 with 3
      99L -> Seq("solo", "tokens", "only"))
    val tok = docTokens
      .flatMap { case (id, ts) => ts.distinct.map(id -> _) }
      .toDF("doc_id", "token")
    val composed = Dedup.prefixJaccardResolve(tok, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val direct = {
      val edges = Dedup.prefixJaccardJoin(tok, 0.5).select("doc_a", "doc_b")
      Dedup.connectedComponents(edges)._1.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getLong(0) == r.getLong(1))).toSet
    }
    assert(composed == direct,
      s"collapse changed the resolution: missing=${direct -- composed}, " +
        s"extra=${composed -- direct}")
    // structure pins: one component {0,7,8,9,13} kept by 0, the isolated
    // identical pair {20,21} kept by 20, {3,4} kept by 3, 99 absent
    assert(composed == Set(
      (0L, 0L, true), (7L, 0L, false), (8L, 0L, false), (9L, 0L, false),
      (13L, 0L, false), (20L, 20L, true), (21L, 20L, false),
      (3L, 3L, true), (4L, 3L, false)))
  }
}
