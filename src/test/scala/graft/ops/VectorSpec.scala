package graft.ops

import graft.{SparkEntry, SparkSpec}

/** ANN quality checks beyond the SQL oracle: the frozen-quantizer
  * `q_similarity_ivf` key is hash-checked against DuckDB, but recall vs
  * brute force, the sample-trained production path, and the single-pass
  * fit property live here. */
class VectorSpec extends SparkSpec {

  private def rows(key: String) =
    SparkEntry.queries(key)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("sample-trained IVF path: valid shape and recall vs brute force") {
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val trained = Vector.ivfTopKTrained(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(trained.nonEmpty)
    trained.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.length <= 5)
      assert(hits.forall(h => h._4 >= -1.0 && h._4 <= 1.0))
      assert(hits.forall(_._3 != qid))
    }
    val byQ = trained.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.map { case (qid, b) =>
      byQ.getOrElse(qid, Set.empty).count(b).toDouble / b.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, f"trained IVF avg recall@5 = $avg%.2f, expected ≥ 0.5")
  }

  test("trained IVF fit is ONE bounded job — no corpus-sized count() pass") {
    val group = s"ivf-fit-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "ivf fit pin", false)
    try Vector.ivfTopKTrained(spark, sfDir) // builds (fit collects eagerly)
    finally spark.sparkContext.clearJobGroup()
    def jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    // the status store is fed asynchronously — wait for the job to appear,
    // then a short settle to catch a would-be second (count) job
    val deadline = System.currentTimeMillis() + 10000
    while (jobs < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    Thread.sleep(300)
    // CollectLimit's executeTake may legitimately launch a scale-up job
    // when the first scanned partition doesn't fill the limit — allow ≤2;
    // the old count()+sample shape ran a full-corpus job PLUS the sample
    // read, which this bound still rejects
    assert(jobs >= 1 && jobs <= 2,
      s"expected the bounded-limit fit (1-2 executeTake jobs), got $jobs")
  }

  test("IVF output shape: ≤5 hits per query, contiguous ranks, valid cosines") {
    // (bitwise run-to-run equality is NOT asserted: KMeans treeAggregate
    // merges partition float sums in task-completion order, so two fits
    // with the same seed may differ once the scan has >1 partition)
    val a = rows("q_similarity_ivf")
    assert(a.nonEmpty)
    a.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.length <= 5, s"query $qid returned ${hits.length} hits")
      assert(hits.map(_._2).sorted.toSeq == (1L to hits.length).toSeq,
        s"query $qid ranks not contiguous: ${hits.map(_._2).toSeq}")
      assert(hits.forall(h => h._4 >= -1.0 && h._4 <= 1.0))
      assert(hits.forall(_._3 != qid), "a query must not match itself")
    }
  }

  test("IVF cosines are bounded by the brute-force top-k (it's a subset search)") {
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val ivf = rows("q_similarity_ivf")
    ivf.groupBy(_._1).foreach { case (qid, hits) =>
      val best = hits.map(_._4).max
      assert(best <= brute(qid) + 1e-9,
        s"IVF found a better hit than brute force for query $qid — impossible")
    }
  }

  test("IVF recall@5 vs brute force clears the multi-probe bar") {
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ivf = rows("q_similarity_ivf")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.map { case (qid, b) =>
      ivf.getOrElse(qid, Set.empty).count(b).toDouble / b.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, f"IVF avg recall@5 = $avg%.2f, expected ≥ 0.5 with nprobe=3")
  }

  test("similaritySearch queryIds and k dials pick the query set and hit count") {
    val got = graft.Graft.similaritySearch(spark, sfDir,
      queryIds = Seq(7L, 11L), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet.subsetOf(Set(7L, 11L)),
      s"only the requested queries may appear: ${got.map(_._1).toSet}")
    got.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.length <= 3, s"query $qid returned ${hits.length} > k=3 hits")
      assert(hits.forall(_._3 != qid), "a query must not match itself")
    }
  }

  test("query-batch cap: oversized queryIds are rejected loudly, not broadcast") {
    val tooMany = 0L to graft.Graft.MaxQueryBatch.toLong // cap + 1 ids
    val e = intercept[IllegalArgumentException] {
      graft.Graft.similaritySearch(spark, sfDir, queryIds = tooMany)
    }
    assert(e.getMessage.contains("MaxQueryBatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.Graft.similaritySearchQuantized(spark, sfDir, queryIds = tooMany)
    }
    assert(e2.getMessage.contains("MaxQueryBatch"), e2.getMessage)
    // the quantized facade honors its dials like similaritySearch does
    val got = graft.Graft.similaritySearchQuantized(spark, sfDir,
      queryIds = Seq(7L, 11L), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet.subsetOf(Set(7L, 11L)))
    got.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.length <= 3, s"query $qid returned ${hits.length} > k=3 hits")
      assert(hits.forall(_._3 != qid))
    }
  }

  test("nprobe is a user-facing recall dial: wider probe never loses recall") {
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    def recallAt(np: Int): Double = {
      val got = graft.Graft.similaritySearch(spark, sfDir, nprobe = np).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (qid, b) =>
        got.getOrElse(qid, Set.empty).count(b).toDouble / b.size }
      rs.sum / rs.size
    }
    val narrow = recallAt(1)
    val wide = recallAt(4)
    // same deterministic fit (bounded sample, fixed seed) → candidates at
    // nprobe=1 are a subset of nprobe=4's, so recall is monotone
    assert(narrow <= wide + 1e-9,
      f"recall fell when widening the probe: $narrow%.2f -> $wide%.2f")
    assert(wide >= 0.5, f"nprobe=4 avg recall@5 = $wide%.2f, expected >= 0.5")
  }

  test("quantized two-stage search: high recall vs exact, codes not vectors in the candidate stage") {
    // recall: the int8 approximation ranks candidates for the exact
    // rerank; with Rerank=20 survivors the final top-5 should nearly
    // always contain the true top-5 (8-bit error ≪ neighbor gaps)
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val df = SparkEntry.queries("q_similarity_quantized")(spark, sfDir)
    val quant = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val byQ = quant.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.map { case (qid, b) =>
      byQ.getOrElse(qid, Set.empty).count(b).toDouble / b.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, f"quantized rerank avg recall@5 = $avg%.2f, expected ≥ 0.8")
    // exact cosines of reported hits match the brute-force scores for
    // the same pairs (stage 2 IS the exact measure)
    val bruteScores = rows("q_similarity_topk")
      .map(t => (t._1, t._3) -> t._4).toMap
    quant.foreach { case (qid, _, cid, cos, approx) =>
      bruteScores.get((qid, cid)).foreach(b =>
        assert(math.abs(b - cos) < 1e-9, s"exact rerank score drifted for ($qid,$cid)"))
      assert(math.abs(approx - cos) < 0.05,
        f"int8 approximation off by ${math.abs(approx - cos)}%.4f for ($qid,$cid)")
    }
    // the bandwidth claim, pinned in the plan: the stage-1 candidate
    // scoring runs the integer code_dot over the PACKED Dim-byte cells
    // (qcb/ccb — 8× narrower than the f64 vectors, which never feed
    // that expression; column pruning keeps `v` out of the stage-1 join
    // by construction), and the survivor cut (rk ≤ Rerank) gates the
    // single full-vector dot of stage 2
    df.collect() // finalize the adaptive plan
    // AQE prints "== Final Plan ==" and "== Initial Plan ==" sections —
    // count expression sites in the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("code_dot(qcb"),
      s"stage 1 must score with the packed code cells:\n$p")
    assert("rk#\\d+ <= 20".r.findFirstIn(p).isDefined,
      s"the exact rerank must be gated on the top-20 survivors:\n$p")
    // exactly one full-vector dot site (stage 2) — stage 1 never touches v
    assert("dot_product\\(qv".r.findAllIn(p).size == 1,
      s"the full-vector dot may appear only in the stage-2 rerank:\n$p")
  }

  test("projected two-stage search: pinned recall vs exact, projections not vectors in stage 1") {
    val brute = rows("q_similarity_topk")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val df = SparkEntry.queries("q_similarity_projected")(spark, sfDir)
    val proj = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = proj.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.map { case (qid, b) =>
      byQ.getOrElse(qid, Set.empty).count(b).toDouble / b.size }
    val avg = recalls.sum / recalls.size
    // deterministic, not statistical: same corpus + same md5-derived
    // matrix every run → exactly 0.84 on this fixture (near-uniform
    // vectors are the JL worst case; see RpSearchK scaladoc)
    assert(avg >= 0.8,
      f"projected rerank avg recall@5 = $avg%.2f, expected the measured 0.84")
    // reported hits carry the EXACT cosine (stage 2 is the exact measure)
    val bruteScores = rows("q_similarity_topk")
      .map(t => (t._1, t._3) -> t._4).toMap
    proj.foreach { case (qid, _, cid, cos) =>
      bruteScores.get((qid, cid)).foreach(b =>
        assert(math.abs(b - cos) < 1e-9,
          s"exact rerank score drifted for ($qid,$cid)"))
    }
    // the payload claim, pinned in the plan: stage-1 scans of the
    // projection cache read proj longs and never the f64 vector column;
    // only the stage-2 rerank scans (no proj columns) may read v
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val stage1Scans = p.linesIterator
      .filter(l => l.contains("InMemoryTableScan") && l.contains("proj_0#")).toSeq
    assert(stage1Scans.nonEmpty,
      s"stage 1 should read the cached projections:\n$p")
    assert(stage1Scans.forall(!_.contains("v#")),
      s"full vectors leaked into the stage-1 projection scan:\n${stage1Scans.mkString("\n")}")
    assert("dot_product\\(qv".r.findAllIn(p).size == 1,
      s"the full-vector dot may appear only in the stage-2 rerank:\n$p")
  }

  test("int8 quantization: codes bounded, error bounded by half a step, constant vector degrades to zero") {
    val got = SparkEntry.queries("q_embedding_quantize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, codeSum, errE6) =>
      // 64 codes in [0, 255] → sum in [0, 64*255]
      assert(codeSum >= 0 && codeSum <= 64L * 255,
        s"vec $id code_sum $codeSum outside [0, ${64 * 255}]")
      assert(errE6 >= 0, s"vec $id negative reconstruction error")
    }
    // reconstruction error ≤ scale/2 by construction; embeddings are
    // ~N(0, 0.06)-ish, so err_e6 stays far below 1e6 (sanity not proof)
    assert(got.map(_._3).max < 1000000L)
    // a constant vector: scale 0 → all codes 0, error exactly 0
    import spark.implicits._
    val const = Seq((1L, Array.fill(8)(0.25f), 0)).toDF("vec_id", "embedding", "label")
    const.createOrReplaceTempView("const_embeddings")
    val row = spark.sql(
      """SELECT aggregate(codes, 0L, (a, c) -> a + c) AS code_sum,
        |  aggregate(zip_with(v, codes, (x, c) -> abs(x - (mn + c * sc))),
        |    0D, (a, y) -> greatest(a, y)) AS max_err
        |FROM (
        |  SELECT v, array_min(v) AS mn,
        |    (array_max(v) - array_min(v)) / 255.0 AS sc,
        |    transform(v, x -> CASE WHEN (array_max(v) - array_min(v)) / 255.0 = 0D
        |      THEN 0L ELSE CAST(floor((x - array_min(v)) /
        |        ((array_max(v) - array_min(v)) / 255.0) + 0.5D) AS BIGINT) END) AS codes
        |  FROM (SELECT cast(embedding AS array<double>) AS v FROM const_embeddings)
        |)""".stripMargin).collect().head
    assert(row.getLong(0) == 0L && row.getDouble(1) == 0.0,
      "constant vector must quantize to all-zero codes with zero error")
  }

  test("distributed k-means ≡ driver-side Lloyd's with the same contract") {
    // replicate the exactness contract (lowest-vec_id init, rounded-6
    // centroids, integer-scaled sums, lower-cid ties) sequentially on
    // the collected corpus; the distributed plan must match bit-for-bit
    val raw = graft.warehouse.Tables.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val k = 3; val iters = 2
    val dim = raw.head._2.length
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cents = raw.take(k).map(_._2.map(r6))
    var ns = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      for ((_, v) <- raw) {
        var best = -1; var bestD = Double.PositiveInfinity
        for (c <- 0 until k) {
          var d2 = 0.0
          var j = 0
          while (j < dim) { val t = v(j) - cents(c)(j); d2 += t * t; j += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
        }
        var j = 0
        while (j < dim) { sums(best)(j) += math.floor(v(j) * 1e7).toLong; j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dim)(j => r6(sums(c)(j) / 1e7 / counts(c)))
      }
      ns = counts
    }
    val got = Vector.kmeansCentroids(spark, sfDir, k, iters)
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    assert(got.map(_._1).toSeq == (0 until k).map(_.toLong))
    assert(got.map(_._2).toSeq == ns.toSeq, "cluster sizes differ")
    assert(got.map(_._2).sum == raw.length, "every vector assigned once")
    for (c <- 0 until k)
      assert(got(c)._3.toSeq == cents(c).toSeq, s"centroid $c differs")
  }

  test("LSH top-1 agrees with brute force for most queries (banded recall)") {
    val brute = rows("q_similarity_topk").filter(_._2 == 1L)
      .map(r => r._1 -> r._3).toMap
    val lsh = rows("q_similarity_lsh").filter(_._2 == 1L)
      .map(r => r._1 -> r._3).toMap
    val agree = brute.keys.count(q => lsh.get(q).contains(brute(q)))
    assert(agree >= brute.size / 2,
      s"LSH top-1 agreed on only $agree/${brute.size} queries")
  }

  test("kNN join: replicate-salt split never changes the result; every query gets ranks 1..k") {
    def run(cap: Int) = Vector
      .knnJoin(spark, sfDir, graft.ops.IvfCentroids.values,
        nprobe = 2, k = 3, cellCap = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // cap=2 forces multi-salt splits of every cell (500 vectors over 8
    // cells); cap=1<<20 never splits — bit-identical output required
    val salted = run(2)
    assert(salted == run(1 << 20),
      "salting must rebalance tasks without touching the pair set")
    // structural: dense ranks from 1, no self-pairs, every query covered
    val byQ = salted.groupBy(_._1)
    assert(byQ.size == 500, s"expected all 500 queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.length).toSeq, s"ranks not dense for $q")
      assert(rs.forall(_._3 != q), s"self-pair returned for $q")
      assert(rs.length <= 3)
    }
    intercept[IllegalArgumentException] {
      Vector.knnJoin(spark, sfDir, graft.ops.IvfCentroids.values, cellCap = 0)
    }
  }

  test("adaptive quantizer: ~sqrt(n) strided data-point centers, facade default runs through it") {
    val n = graft.warehouse.Tables.table(spark, sfDir, "embeddings").count()
    val stride = math.ceil(math.sqrt(n.toDouble)).toLong
    val cents = Vector.adaptiveCenters(spark, sfDir)
    // sf0.001 ids are dense 0..n-1, so the count is exactly ceil(n/stride)
    assert(cents.length == ((n + stride - 1) / stride).toInt,
      s"expected ceil($n/$stride) centers, got ${cents.length}")
    // each center IS a corpus vector: center i = the vector at id i*stride
    val byId = graft.warehouse.Tables.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .filter(s"vec_id % $stride = 0").orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    assert(cents.zip(byId).forall { case (a, b) => a.sameElements(b) },
      "centers must be the strided corpus vectors in id order")
    // the facade's None-centroid default ≡ explicitly passing the fit
    val dflt = graft.Graft.knnJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val explicit = Vector.knnJoin(spark, sfDir, cents, nprobe = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(dflt == explicit, "facade default must run the adaptive fit")
    // structural completeness: every query back, dense ranks, no self-pairs
    val byQ = dflt.groupBy(_._1)
    assert(byQ.size == n, s"expected all $n queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.length).toSeq)
      assert(rs.forall(_._3 != q))
    }
  }

  test("NN-Descent refine: per-query top-k never degrades vs the IVF init, and strictly improves somewhere") {
    // The monotonicity is by construction: the init at workK has the
    // same top-3 prefix as the k=3 adaptive join, and every round's
    // candidate set CONTAINS the current edges, so the per-qid top-3
    // cosine sum is non-decreasing round over round. Pin it end-to-end
    // (init → 4 rounds), plus the structural contract and the facade.
    def top3sum(rs: Seq[(Long, Long, Long, Double)]): Map[Long, Double] =
      rs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val init = top3sum(rows("q_similarity_knn_join_adaptive").toSeq)
    val refined = graft.Graft.knnGraphRefined(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val ref3 = top3sum(refined)
    assert(ref3.keySet == init.keySet, "refine must cover every query")
    // each of the 3 emitted cosines is rounded to 1e-6 → 3e-6 slack
    init.foreach { case (q, s0) =>
      assert(ref3(q) >= s0 - 3e-6,
        s"refine DEGRADED query $q: $s0 -> ${ref3(q)}")
    }
    assert(init.count { case (q, s0) => ref3(q) > s0 + 1e-3 } > 0,
      "refine improved no query at all — rounds are not doing anything")
    // structural: dense ranks 1..k, no self-pairs, k=3 cut honored
    refined.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.length).toSeq)
      assert(rs.forall(_._3 != q))
      assert(rs.length <= 3)
    }
    // parameter guard: emit width above the working width is an error
    intercept[IllegalArgumentException] {
      Vector.knnRefine(spark, sfDir, rounds = 1, k = 5, workK = 3, cap = 3)
    }
  }

  test("NN-Descent rescore arms are bit-identical: pair_cosine " +
      "expression (small-corpus) vs shuffle joins (above-threshold)") {
    // r16 optimization round: the rescore dispatches on measured corpus
    // size — pair_cosine(qid, cid) against the broadcast table below
    // RefineBroadcastMaxVecs, dot_product/(qn·cn) shuffle joins above.
    // Forcing bcastMaxVecs = 0 exercises the join arm on the fixture;
    // both arms must emit the SAME rows (the arm rides the registry
    // cache key, so the second call cannot be served the first arm's
    // cached rounds).
    def run(maxVecs: Long) =
      Vector.knnRefine(spark, sfDir, rounds = 2, k = 3, workK = 5,
          cap = 10, bcastMaxVecs = maxVecs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(run(Long.MaxValue) == run(0L),
      "expression-rescore and join-rescore arms diverged")
  }

  test("two-level hierarchy: integer-exact strides, every coarse group owned, refine-over-hier never degrades") {
    // smallestRoot is the integer contract both engines replay: the
    // float estimate only positions the window
    assert(Vector.smallestRoot(2000, 3) == 13L)   // 12³=1728 < 2000 ≤ 13³
    assert(Vector.smallestRoot(1, 3) == 1L)
    assert(Vector.smallestRoot(27, 3) == 3L)      // exact cube boundary
    assert(Vector.smallestRoot(28, 3) == 4L)
    assert(Vector.smallestRoot(154, 2) == 13L)    // 12²=144 < 154 ≤ 13²
    val n = graft.warehouse.Tables.table(spark, sfDir, "embeddings").count()
    val (coarse, fine, owned) = Vector.hierCenters(spark, sfDir)
    // fine centers are the corpus vectors at the cube-root stride
    val strideF = Vector.smallestRoot(n, 3)
    assert(fine.length == graft.warehouse.Tables
      .table(spark, sfDir, "embeddings")
      .filter(s"vec_id % $strideF = 0").count().toInt)
    // the HierIvfCells non-empty-group invariant holds by construction
    assert(owned.length == coarse.length)
    assert(owned.forall(_.nonEmpty), "a zero-owned coarse group survived")
    assert(owned.flatten.sorted.toSeq == fine.indices.toSeq,
      "every fine center owned exactly once")
    // structural contract of the hier join + facade equality
    val hier = graft.Graft.knnJoinHier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = hier.groupBy(_._1)
    assert(byQ.size == n, s"expected all $n queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.forall(_._3 != q))
    }
    // refine over the hier init: same monotonicity as over the adaptive
    // one — candidate sets contain current edges, so per-query top-3
    // cosine sums never drop
    def top3sum(rs: Seq[(Long, Long, Long, Double)]): Map[Long, Double] =
      rs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val init = top3sum(hier.toSeq)
    val ref = top3sum(graft.Graft.knnGraphRefinedHier(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq)
    assert(ref.keySet == init.keySet)
    init.foreach { case (q, s0) =>
      assert(ref(q) >= s0 - 3e-6, s"hier refine DEGRADED query $q")
    }
  }

  test("recall floors: a quantizer/refine regression fails the suite, not just the published artifact") {
    // r15 verdict task 4: RECALL_r15.json publishes the ladder but
    // nothing FAILED if a change sank it. Floors = fixture-measured
    // values (refine 0.995 / refine_hier 0.997 / ivf 0.56 / lsh 0.36 /
    // quantized 1.0 / projected 0.84 at sf0.001) minus box/tie noise —
    // generous enough to survive legitimate parameter retunes, tight
    // enough that a broken quantizer fold, candidate-set regression, or
    // dropped refine round cannot pass. The refined keys carry the
    // contract floor the verdict named (≥ 0.9); the low-recall INITS
    // (adaptive/hier — their recall is the designed IVF trade, bought
    // back by the refine rungs) pin only against catastrophic collapse.
    val (search, join) = graft.tools.RecallProbe.measure(spark, sfDir)
    val floors = Map(
      "q_similarity_ivf" -> 0.50, "q_similarity_lsh" -> 0.25,
      "q_similarity_quantized" -> 0.95, "q_similarity_projected" -> 0.70,
      "q_similarity_knn_join" -> 0.35,
      "q_similarity_knn_join_adaptive" -> 0.25,
      "q_similarity_knn_refine" -> 0.90,
      "q_similarity_knn_join_hier" -> 0.15,
      "q_similarity_knn_refine_hier" -> 0.90)
    val measured = (search ++ join).toMap
    assert(measured.keySet == floors.keySet,
      s"probe keys drifted: ${measured.keySet} vs ${floors.keySet}")
    measured.foreach { case (k, r) =>
      assert(r >= floors(k),
        f"$k recall $r%.3f fell below its floor ${floors(k)}%.2f")
    }
  }

  test("hier fit dispatch: frame arm ≡ array arm bit-for-bit, driver-held fit state is O(n^(1/3))") {
    // r15 verdict task 1: above HierFitDriverMaxFine the fit must run as
    // joins with only the coarse matrix on the driver. Force the frame
    // arm (threshold 0) and pin (a) exact output equality against the
    // array arm — cosines included, so the distance fold, tie-breaks,
    // empty-group drop and re-index all replayed bit-for-bit — and
    // (b) the driver-collect budget: coarse raw + survivors ≤ 2·k_c,
    // strictly below the array arm's k_f fine-center collect.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val arr = rows(Vector.knnJoinHier(spark, sfDir))
    val arrDriverRows = Vector.lastHierFitDriverRows // = k_f (fine count)
    val frame = rows(Vector.knnJoinHier(spark, sfDir, fitDriverMaxFine = 0))
    val frameDriverRows = Vector.lastHierFitDriverRows
    assert(frame == arr,
      s"frame-arm assignment diverged from the array arm: " +
        s"${(frame diff arr).take(3)} / ${(arr diff frame).take(3)}")
    assert(arrDriverRows > 0 && frameDriverRows > 0)
    val kc = Vector.smallestRoot(arrDriverRows, 2) // k_c bound: √k_f
    assert(frameDriverRows <= 2 * kc,
      s"frame-arm driver state $frameDriverRows exceeds 2·k_c = ${2 * kc}")
    assert(frameDriverRows < arrDriverRows,
      s"frame arm collected $frameDriverRows rows — not below the array " +
        s"arm's k_f = $arrDriverRows")
  }

  test("mutual-kNN clusters: labels are component minima, sizes add up, edges are truly mutual") {
    val rows = graft.Graft.embeddingClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.warehouse.Tables.table(spark, sfDir, "embeddings").count()
    assert(rows.length == n, "every vector must be labeled")
    // cluster id IS the min member id; size column is the true group size
    rows.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c, s"cluster $c not labeled by its min id")
      assert(ms.forall(_._3 == ms.length), s"cluster $c size mismatch")
    }
    // driver replay of the mutual-edge definition from the refine graph
    val g = graft.Graft.knnGraphRefinedHier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .filter(_._3 >= 0.4).map(t => (t._1, t._2)).toSet
    val mutual = g.filter { case (a, b) => a < b && g.contains((b, a)) }
    // reachability replay: union-find over the mutual edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val got = rows.map(r => r._1 -> r._2).toMap
    (0L until n).foreach { id =>
      assert(got(id) == find(id), s"vector $id labeled ${got(id)}, replay says ${find(id)}")
    }
    // the fixture produces BOTH shapes: real clusters and singletons
    assert(rows.exists(_._3 > 1L) && rows.exists(_._3 == 1L),
      "expected a mix of clusters and singletons")
  }

  test("semantic dedup audit replays exactly from the cluster labels and the documents table") {
    val clus = graft.Graft.embeddingClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      val embedded = rows.filter(r => clus.contains(r._1))
      val dropped = embedded.count(r => clus(r._1) != r._1)
      val keptRows = rows.filter(r => clus.get(r._1).forall(_ == r._1))
      (src, (rows.length.toLong, embedded.length.toLong, dropped.toLong,
        keptRows.length.toLong, keptRows.map(_._3.length.toLong).sum))
    }
    val got = graft.Graft.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "audit diverged from the driver replay")
    // the pipeline actually dropped something AND passed something through
    assert(got.values.map(_._3).sum > 0, "no semantic duplicates dropped")
    // at sf0.001 every doc has an embedding (both tables are 500 rows);
    // the pass-through arm is exercised at sf0.1 (5000 docs / 2000 vecs)
    // and by the gate — here just pin the replay's arithmetic covers it
    assert(got.values.map(_._1).sum >= got.values.map(_._2).sum)
  }

  test("range search matches a sequential brute-force replay exactly") {
    // replay the engine contract in driver Scala: float→double cast,
    // sequential left-fold dot products, cosine = dot/(|q||c|), HALF_UP
    // rounding to 6 digits, keep rounded ≥ 0.30 — the pair SET and the
    // scores must both match bit-for-bit
    val emb = graft.warehouse.Tables.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = emb.toMap
    val want = (for {
      (qid, qv) <- emb if qid < 5
      (cid, cv) <- emb if cid != qid
      c = r6(dot(qv, cv) / (norm(qid) * norm(cid))) if c >= 0.30
    } yield (qid, cid, c)).toSet
    val got = SparkEntry.queries("q_similarity_range")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"range result diverged: ${got.size} vs ${want.size} pairs")
    assert(want.nonEmpty, "threshold returned nothing — fixture drifted?")
    // the radius must actually CUT: not every pair qualifies
    assert(want.size < 5 * (emb.length - 1),
      "threshold admitted every pair — no longer a range query")
  }
}
