package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.warehouse.Tables

/** Similarity search and multimodal-column operators over `embeddings` /
  * `documents` (SURVEY §2 Tier D; north-star "similarity search" and
  * "multimodal columns" blocks).
  *
  * Two search paths, per the north-star mandate:
  *   - [[q_similarity_topk]]: brute-force cosine top-k — the exactness
  *     baseline. Query set is broadcast; the big side streams through one
  *     scan; per-query top-k via window rank. At 100 TB this is the
  *     pattern for SMALL query batches (cost = one pass over the corpus
  *     per batch, no shuffle of the corpus itself).
  *   - [[q_similarity_lsh]]: random-hyperplane LSH — the scale path.
  *     Corpus vectors hash to sign-bit band buckets; candidates are
  *     same-bucket only (shuffle by band bucket, never O(n·q) dot
  *     products). Hyperplane coefficients are a fixed integer-arithmetic
  *     formula so both engines derive bit-identical planes.
  *
  * Dot products / norms are sequential left folds in element order in
  * both engines (the codegen'd [[graft.functions.DotProduct]] on the
  * Spark side — norms once per VECTOR via the self-dot, dot once per
  * PAIR — DuckDB `list_reduce` on the oracle side) → bit-identical
  * doubles; outputs are additionally rounded to 6 digits.
  */
object Vector {

  /** embeddings cast float→double once: (vec_id, label, v, nrm). The cast
    * is a native array Cast (codegen'd, exact for float→double), not a
    * `transform` lambda — HOFs run interpreted and this column feeds every
    * similarity path's hot loop. nrm is the codegen'd self-dot
    * (`sqrt(dot_product(v, v))` ≡ the x·x fold the oracle replays),
    * computed ONCE per vector so the pair-sized scoring loop divides by
    * precomputed norms instead of refolding both norms per pair. */
  private[ops] def vecs(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.functions.DotProduct.register(s)
    Tables.table(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("dot_product(v, v)")))
  }

  private val duckVecs =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
      |  FROM e
      |)""".stripMargin

  private val duckDot =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(q.v)),
      |        i -> q.v[i] * c.v[i])), (s0, x) -> s0 + x)""".stripMargin

  /** [[vecs]] + the per-vector int8 scalar-quantization artifacts shared
    * by `q_embedding_quantize`, the two-stage `q_similarity_quantized`
    * and the quantized near-dup candidate stage (registry key
    * `quant_vecs`): per-vector min/max affine codes (`x ≈ mn +
    * code·sc`), the exact code sum (the affine cross-term every
    * consumer needs), and the PACKED byte form (`cb` — one unsigned
    * byte per code via the codegen'd [[graft.functions.PackCodes]]):
    * the Dim-byte binary cell that rides every quantized candidate
    * shuffle 8× narrower than the f64 vector, scored there by the
    * exact integer [[graft.functions.CodeDot]] (products ≤255², sums
    * ≪2^53 → also exact when the score formula mixes it into double
    * arithmetic, matching the DuckDB twins' BIGINT folds). */
  private[ops] def quantizedVecs(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.functions.CodePack.register(s)
    vecs(s, d)
      .withColumn("mn", array_min(col("v")))
      .withColumn("sc", (array_max(col("v")) - col("mn")) / 255.0)
      .withColumn("codes", expr(
        "transform(v, x -> CASE WHEN sc = 0D THEN 0L " +
          "ELSE CAST(floor((x - mn) / sc + 0.5D) AS BIGINT) END)"))
      .withColumn("csum", expr("aggregate(codes, 0L, (a, c) -> a + c)"))
      .withColumn("cb", expr("pack_codes(codes)"))
  }

  /** Stage-1 survivor count of the quantized two-stage search: exact
    * cosine reranks only this many code-scored candidates per query. */
  private[graft] val Rerank = 20

  /** Quantized two-stage top-k ([[graft.Graft.similaritySearchQuantized]];
    * oracle key `q_similarity_quantized`): stage 1 scores EVERY candidate
    * against the broadcast query set using only the int8 artifacts — the
    * affine expansion Σ(qmn+qcᵢ·qsc)(cmn+ccᵢ·csc) = Dim·qmn·cmn +
    * qmn·csc·Σcc + cmn·qsc·Σqc + qsc·csc·(qc·cc), one exact integer code
    * dot plus three scalar cross-terms — so the candidate stage ships
    * codes (8× narrower than the f64 vectors) and four scalars per
    * vector; stage 2 re-attaches full vectors to the top-`rerank`
    * survivors per query ONLY (a broadcast-sized list) and ranks by
    * exact cosine. The corpus streams through both stages unshuffled. */
  private[graft] def quantizedTopK(
      s: org.apache.spark.sql.SparkSession, d: String,
      queryPred: org.apache.spark.sql.Column = col("vec_id") < 5,
      k: Int = 5, rerank: Int = Rerank): org.apache.spark.sql.DataFrame = {
    val qv8 = graft.CacheRegistry.getOrPersist("quant_vecs", d,
      quantizedVecs(s, d))
    val q = qv8.filter(queryPred).select(
      col("vec_id").as("qid"), col("cb").as("qcb"), col("mn").as("qmn"),
      col("sc").as("qsc"), col("csum").as("qsum"), col("nrm").as("qn"))
    val c = qv8.select(col("vec_id").as("cid"), col("cb").as("ccb"),
      col("mn").as("cmn"), col("sc").as("csc"), col("csum").as("ccsum"),
      col("nrm").as("cn"))
    val stage1 = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("idot", expr("code_dot(qcb, ccb)"))
      .withColumn("approx_cos", expr(
        s"round(($Dim * qmn * cmn + qmn * csc * ccsum + cmn * qsc * qsum" +
          s" + qsc * csc * idot) / (qn * cn), 6)"))
      .select("qid", "cid", "approx_cos")
    val wA = Window.partitionBy("qid")
      .orderBy(col("approx_cos").desc, col("cid"))
    val survivors = stage1
      .withColumn("rk", row_number().over(wA))
      .filter(col("rk") <= rerank)
      .select("qid", "cid", "approx_cos")
    val qfull = qv8.filter(queryPred).select(
      col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = survivors.join(broadcast(qfull), Seq("qid"))
    val scored = qv8
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(pairs), Seq("cid"))
      .withColumn("cosine",
        round(expr("dot_product(qv, cv)") / (col("qn") * col("cn")), 6))
    val wE = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(wE).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cosine", "approx_cos")
      .orderBy("qid", "rank")
  }

  /** Projection width and survivor count for [[projectedTopK]] — wider
    * than the 8-dim reduction artifact (`q_embedding_project`) because
    * stage-1 RANKING quality is what buys recall: the projected-dot
    * estimator's variance falls as 1/projK, and this synthetic corpus is
    * the JL worst case (near-uniform vectors, top-5 neighbor gaps ~0.01
    * cosine). Measured recall@5 vs brute force at these defaults: 0.84
    * at sf0.001, 0.80 at sf0.01 (VectorSpec pins the sf0.001 number —
    * deterministic, same data + matrix every run). Clustered real-world
    * embeddings separate far better; when approx-score fidelity matters
    * more than payload width, [[quantizedTopK]] is the higher-fidelity
    * sibling. */
  private[graft] val RpSearchK = 32
  private[graft] val RpRerank = 100

  /** Two-stage top-k by SIGNED RANDOM PROJECTION then exact rerank
    * (`q_similarity_projected`; [[graft.Graft.similaritySearchProjected]]):
    * the JL cousin of [[quantizedTopK]]. For a ±1 matrix R, E[(Rx)·(Ry)]
    * = projK·(x·y), so the stage-1 score is the projected integer dot —
    * EXACT arithmetic on [[randomProjection]] sums, 2× narrower than the
    * f64 vectors at the 32-long default (the dial goes as low as the
    * corpus's neighbor gaps allow) — ranking candidates per query with a
    * deterministic (score desc, cid) tiebreak; stage 2 re-attaches full
    * vectors to the top-`rerank` survivors only and ranks by exact
    * cosine. The corpus streams through both stages unshuffled
    * (broadcast query side, window keyed per query). Projections are
    * registry-cached: at 100 TB they are the materialize-once artifact
    * the nightly search batches reuse. */
  private[graft] def projectedTopK(
      s: org.apache.spark.sql.SparkSession, d: String,
      queryPred: org.apache.spark.sql.Column = col("vec_id") < 5,
      k: Int = 5, rerank: Int = RpRerank,
      projK: Int = RpSearchK): org.apache.spark.sql.DataFrame = {
    val pv = graft.CacheRegistry.getOrPersist(s"proj_vecs_$projK", d,
      randomProjection(vecs(s, d), "v", Seq("vec_id", "v", "nrm"), projK, Dim))
    val q = pv.filter(queryPred).select(col("vec_id").as("qid") +:
      (0 until projK).map(j => col(s"proj_$j").as(s"qp$j")): _*)
    val c = pv.select(col("vec_id").as("cid") +:
      (0 until projK).map(j => col(s"proj_$j").as(s"cp$j")): _*)
    val pdot = (0 until projK).map(j => s"qp$j * cp$j").mkString(" + ")
    val stage1 = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("pdot", expr(pdot))
      .select("qid", "cid", "pdot")
    val wA = Window.partitionBy("qid").orderBy(col("pdot").desc, col("cid"))
    val survivors = stage1
      .withColumn("rk", row_number().over(wA))
      .filter(col("rk") <= rerank)
      .select("qid", "cid", "pdot")
    val qfull = pv.filter(queryPred).select(
      col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = survivors.join(broadcast(qfull), Seq("qid"))
    val scored = pv
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(pairs), Seq("cid"))
      .withColumn("cosine",
        round(expr("dot_product(qv, cv)") / (col("qn") * col("cn")), 6))
    val wE = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(wE).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cosine", "pdot")
      .orderBy("qid", "rank")
  }

  // 16 hyperplanes × 4-bit bands: coefficient c(p,j) from a fixed integer
  // recurrence — exact in BIGINT, identical in both engines
  private val Planes = 16
  private val BandBits = 4
  private val NBands = Planes / BandBits

  /** Embedding dimensionality — the ONE constant every LSH artifact
    * derives from: the plane matrix ([[planeMatrix]], fed to the codegen'd
    * [[graft.functions.LshBands]]), the plane literals, and the DuckDB
    * twin's fold width ([[sigDuck]]). A fixture-dimension change edits
    * this line only; a hardcoded 64 in the oracle while Spark derived the
    * width from the matrix would make DuckDB NULL out-of-range indices
    * and silently diverge. */
  private[graft] val Dim = 64

  /** Output dimensionality of the signed random projection
    * (`q_embedding_project`). */
  private val RpK = 8

  /** Deterministic ±1 projection-matrix entry: md5("rp:<j>:<i>") first 8
    * hex chars as an int, parity → sign. Computed ONCE at plan-build time
    * and embedded as literals in both engines' plans — the Spark plan and
    * the DuckDB oracle share the exact matrix by construction. */
  private def rpSign(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(h, 16) % 2 == 0) 1L else -1L
  }

  /** Generic signed random projection ([[graft.Graft.randomProjection]];
    * `q_embedding_project`): reduce a `dim`-dimensional float vector
    * column to `k` signed-sum longs (JL-style distance proxy). Row-local,
    * zero shuffle; elements are floor(x·1e6) longs first, so the sums are
    * exact integer arithmetic whatever the partition order. The ±1 matrix
    * comes from [[rpSign]] at plan-build time — deterministic across
    * runs, sessions, and engines. */
  private[graft] def randomProjection(
      df: org.apache.spark.sql.DataFrame, vecCol: String,
      idCols: Seq[String], k: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0 && dim > 0, s"need positive dims, got k=$k dim=$dim")
    // loud dim check: zip_with pads a short side with NULLs, which would
    // silently null every projection of a mis-sized vector — fail the row
    // instead (IF + raise_error stays inside whole-stage codegen)
    val e6 = s"transform(IF(size($vecCol) = $dim, $vecCol, " +
      s"raise_error(concat('randomProjection: expected $dim-dim vectors, " +
      s"got ', CAST(size($vecCol) AS STRING)))), x -> " +
      "CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    val projCols = (0 until k).map { j =>
      val signs = (0 until dim).map(i => rpSign(j, i)).mkString("array(", ", ", ")")
      expr(s"aggregate(zip_with(__rp_e6, $signs, (x, sg) -> x * sg), " +
        "CAST(0 AS BIGINT), (a, y) -> a + y)").as(s"proj_$j")
    }
    df.withColumn("__rp_e6", expr(e6))
      .select(idCols.map(col) ++ projCols: _*)
  }

  /** Hyperplane coefficients, precomputed once in Scala from the fixed
    * integer recurrence and embedded as E-notation literals (parsed as
    * DOUBLE by both engines; 17 significant digits round-trip exactly).
    * Deriving them per row inside a lambda defeated constant folding and
    * dominated the LSH plan. */
  private def coef(p: Int, j: Int): Double =
    ((p.toLong * Dim + j) * 2654435761L % 1000003L) / 1000003.0 - 0.5

  private def planeLits(p: Int): Seq[String] =
    (0 until Dim).map(j => "%.17e".format(coef(p, j)))

  /** Plane matrix for the codegen'd banding expression
    * ([[graft.functions.LshBands]]). Identical doubles to the E-notation
    * literals the DuckDB twin parses ("%.17e" round-trips exactly). */
  private def planeMatrix: Array[Array[Double]] =
    Array.tabulate(Planes, Dim)(coef)

  private def sigDuck: String = {
    val bits = (0 until Planes).map { p =>
      val plane = planeLits(p).mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(generate_series(1, $Dim),
         |    i -> v[i] * ($plane)[i])),
         |  (s0, x) -> s0 + x) >= 0 THEN 1 ELSE 0 END)""".stripMargin
    }
    bits.mkString("[", ", ", "]")
  }

  /** Shared ranking tail for all three search paths: score the candidate
    * set (qid, qv, qn, cid, cv, cn) — vectors plus their PRECOMPUTED
    * norms — keep the top-k per query with the cid tie-break, emit
    * (qid, rank, cid, cosine). One copy so k / rounding / tie-break can
    * never desynchronize between paths. `dot/(qn·cn)` is bit-identical to
    * the fused cosine (independent sequential folds either way) but does
    * one multiply-add per element of PAIR-sized work instead of three. */
  private def topK(cand: org.apache.spark.sql.DataFrame, k: Int = 5,
      ordered: Boolean = true) = {
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    val cut = cand
      .withColumn("cosine",
        round(expr("dot_product(qv, cv)") / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cosine")
    // the total ORDER BY is presentation only — the NN-Descent refine
    // loop consumes the seed as an unordered SET (its first move is a
    // union + window re-sort), so the seed path skips the range
    // exchange + global sort (r16 verdict item 2: §2.3, don't sort what
    // nobody consumes). Every DECLARED query keeps ordered = true; the
    // row set is identical either way.
    if (ordered) cut.orderBy("qid", "rank") else cut
  }

  /** band values from the signature array column `sig` (1-indexed both) */
  private def bandExprs(arr: String => String): Seq[String] =
    (0 until NBands).map { b =>
      val bits = (0 until BandBits).map { i =>
        s"${arr((b * BandBits + i + 1).toString)} * ${1 << (BandBits - 1 - i)}"
      }.mkString(" + ")
      s"(($bits) + ${b * 16})" // namespace each band's 4-bit value by band idx
    }

  /** Plain Lloyd's iterations over an in-memory sample — the IVF coarse
    * quantizer. Sequential driver arithmetic with a fixed seed, so the
    * centroids are bit-stable run to run (which MLlib KMeans cannot
    * guarantee: its treeAggregate merges partition float sums in task
    * completion order). The sample is bounded by the caller (~10 MB), so
    * driver-side fitting is the SCALE design, not a shortcut: at 100 TB
    * the fit cost is constant while assignment stays a codegen'd map. */
  private[graft] def fitCentroids(
      sample: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty centroid-training sample")
    val kk = math.min(k, sample.length)
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(sample.indices.toVector).take(kk)
      .map(i => sample(i).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < sample.length) {
        val x = sample(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d2 = 0.0
          var j = 0
          while (j < dim) { val t = x(j) - centers(c)(j); d2 += t * t; j += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        val s0 = sums(best)
        var j = 0
        while (j < dim) { s0(j) += x(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      var c = 0
      while (c < kk) {
        // an emptied cluster keeps its previous center (standard Lloyd's)
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** IVF search against a FITTED centroid set. The 100 TB layout, strictly:
    * centroids ride as a CONSTANT inside a codegen'd cell-ranking
    * expression ([[graft.functions.IvfNearestCells]] — shipped once per
    * executor with the generated class, evaluated in the whole-stage
    * loop), so corpus cell assignment is a narrow shuffle-free map — no
    * iterative full-data passes, no ML job graph in the query path; search
    * joins by cell id with the (tiny) probe set broadcast. A corpus vector
    * lives in exactly one cell and a query probes DISTINCT cells, so no
    * (qid, cid) pair ever duplicates. nprobe is the recall dial (nprobe=1
    * misses neighbors straddling a Voronoi boundary). */
  private[graft] def ivfTopK(
      s: org.apache.spark.sql.SparkSession, d: String,
      cents: Array[Array[Double]], nprobe: Int = 3,
      queryPred: org.apache.spark.sql.Column = col("vec_id") < 5,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    graft.functions.IvfNearestCells.register(s, cents, nprobe)
    val base = vecs(s, d)
    val cells = base
      .withColumn("cell", expr("element_at(ivf_cells(v), 1)"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    // the query set stays a PREDICATE over the corpus (default: the keyed
    // fixture's first five vectors) so the probe side is a pruned scan,
    // small by contract → broadcast; the corpus side never shuffles
    val probed = base.filter(queryPred)
      .withColumn("cell", explode(expr("ivf_cells(v)")))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    topK(cells.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .select("qid", "qv", "qn", "cid", "cv", "cn"), k)
  }

  /** The sample-trained IVF path (the production API): fit the coarse
    * quantizer on a BOUNDED first-N sample — ONE short-circuited pass
    * (CollectLimit stops as soon as `sampleTarget` rows arrive; no
    * corpus-sized count() to derive a fraction), ≤20k × 64 doubles ≈
    * 10 MB driver-side — then search with [[ivfTopK]]. At 100 TB the fit
    * cost is CONSTANT while assignment stays a codegen'd map. Exercised by
    * VectorSpec; the oracle-checked `q_similarity_ivf` key runs the same
    * search against [[IvfCentroids]] frozen from this very fit, so DuckDB
    * can replay assignment exactly. */
  private[graft] def ivfTopKTrained(
      s: org.apache.spark.sql.SparkSession, d: String,
      sampleTarget: Int = 20000, nprobe: Int = 3,
      queryPred: org.apache.spark.sql.Column = col("vec_id") < 5,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    val sample = vecs(s, d).select("v").limit(sampleTarget)
      .collect().map(_.getSeq[Double](0).toArray)
    ivfTopK(s, d, fitCentroids(sample, k = 8, iters = 5, seed = 42),
      nprobe, queryPred, k)
  }

  /** All-queries kNN JOIN ([[graft.Graft.knnJoin]]; oracle key
    * `q_similarity_knn_join`): every row of the corpus gets its top-k
    * neighbors — the batch sibling of the probe searches, whose
    * `MaxQueryBatch` contract this operator exists to escape. No query
    * broadcast anywhere: BOTH sides assign to the frozen IVF cells
    * (corpus → its 1 nearest cell, queries → their `nprobe` nearest)
    * and meet in a cell-keyed shuffle join, so the query side scales to
    * the full corpus (kNN graphs for clustering, dedup, label
    * propagation all start here).
    *
    * Hot-cell story: a popular cell would serialize its (queries ×
    * members) pairs into one join task. Those pairs ARE the answer — a
    * candidate-dropping guard (the near-dup `maxCell`) would cost
    * recall — so the guard here is the REPLICATE-SALT skew split
    * ([[graft.ops.Temporal.asofJoinChunked]]'s trick, join-shaped):
    * members of a cell past `cellCap` salt into ceil(n/cap)
    * sub-partitions by id hash, and the cell's queries replicate to
    * every sub-partition. The pair set is provably unchanged (VectorSpec
    * pins cap=2 ≡ cap=∞ on the fixture), so the oracle replays cells +
    * scoring only, and one hot cell becomes ceil(n/cap) parallel tasks
    * at the price of re-shipping the cell's queries that many times. */
  private[graft] def knnJoin(
      s: org.apache.spark.sql.SparkSession, d: String,
      cents: Array[Array[Double]], nprobe: Int = 2, k: Int = 3,
      cellCap: Int = 4096, ordered: Boolean = true): org.apache.spark.sql.DataFrame = {
    graft.functions.IvfNearestCells.register(s, cents, nprobe)
    // the cache key carries the assignment's free parameters (centroids,
    // nprobe) so a facade call with different settings can never read a
    // stale frame (value-hash is session-stable, which is all a session
    // cache needs).
    cellKnnJoin(s, d,
      s"knn_cell_assign_${nprobe}_${java.util.Arrays.deepHashCode(
        cents.asInstanceOf[Array[AnyRef]])}", k, cellCap,
      nCells = cents.length.toLong, ordered = ordered)(
      vecs(s, d).withColumn("cells", expr("ivf_cells(v)")))
  }

  /** The cell-keyed join machinery shared by the flat ([[knnJoin]]) and
    * hierarchical ([[knnJoinHier]]) quantizers: one registered
    * `cellsFn(v)` ranking pass over the corpus (registry-persisted),
    * corpus side takes cell 1, query side explodes all probes, hot
    * cells replicate-salt at `cellCap`, shared [[topK]] tail. */
  private def cellKnnJoin(
      s: org.apache.spark.sql.SparkSession, d: String,
      assignKey: String, k: Int, cellCap: Int, nCells: Long,
      ordered: Boolean = true)(
      assign: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(cellCap >= 1, s"cellCap must be >= 1, got $cellCap")
    // ONE cell-ranking pass over the corpus, registry-shared: the corpus
    // side reads cell 1 of the ranked assignment, the query side explodes
    // all probed cells — without the persist both sides re-ran the
    // |corpus|×|centers| distance evaluation independently. `assign` is
    // by-name: expression-based for the flat quantizer, join-based for
    // the above-threshold hierarchical fit — both yield vecs + `cells`.
    val base = graft.CacheRegistry.getOrPersist(assignKey, d, assign)
    val corpus = base
      .withColumn("cell", expr("element_at(cells, 1)"))
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell"))
    // per-cell member counts: ≤ |centroids| rows — broadcasts by size
    val cellSizes = corpus.groupBy("cell")
      .agg(count(lit(1)).as("n_cell"))
      .withColumn("nsalt",
        greatest(ceil(col("n_cell") / lit(cellCap.toDouble)), lit(1))
          .cast(IntegerType))
      .select("cell", "nsalt")
    val corpusSalted = corpus.join(cellSizes, "cell")
      .withColumn("salt", pmod(hash(col("cid")), col("nsalt")))
    val queries = base
      .withColumn("cell", explode(col("cells")))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
      .join(cellSizes, "cell")
      .withColumn("salt", explode(sequence(lit(0), col("nsalt") - 1)))
    // the scoring join EXPLODES: its inputs are n-row sides (tens of MB)
    // but its output is the Σ queries×members pair stream, 2-4 orders of
    // magnitude bigger — AQE's coalescing sees only the INPUT bytes and
    // serialized the whole scoring stage onto 1-2 tasks (measured at the
    // 10× replica: 13 s in 2 tasks, r16 optimization round). The cure
    // DISPATCHES on the quantizer's cell count (known to every caller,
    // no extra job): with many cells (the adaptive √n / hierarchical
    // n^(2/3) quantizers — the scale designs) an explicit repartition to
    // the session's shuffle parallelism spreads the exploding join
    // (conf-driven, so it scales with the deployment); with FEW cells
    // (the frozen 8-centroid key) the same repartition is the §2.5
    // too-few-distinct-keys trap — it collides the handful of
    // (cell, salt) keys into a fraction of the partitions AND strips
    // AQE's runtime skew-split, measured 41 → 252 s at the 10× replica —
    // so the fat-cell case keeps the planner's layout and its skew
    // handling. 4× parallelism is the spread floor: below it the forced
    // hash cannot beat AQE's split, above it collisions average out.
    val parts = s.sessionState.conf.numShufflePartitions
    val spread = nCells >= 4L * parts
    val qSide =
      if (spread) queries.repartition(parts, col("cell"), col("salt"))
      else queries
    topK(qSide
      .join(corpusSalted, Seq("cell", "salt"))
      .filter(col("cid") =!= col("qid"))
      .select("qid", "qv", "qn", "cid", "cv", "cn"), k, ordered)
  }

  /** SCALE-ADAPTIVE IVF coarse quantizer — the production default for
    * [[graft.Graft.knnJoin]] (round-14 verdict task 1): cells ∝ √corpus
    * instead of a frozen constant, so corpus×corpus pair work is
    * n²/k = n^1.5 by construction rather than the Σ|cell|² ≈ n²/16
    * blowup the frozen quantizer measured at the 10× replica (30.6×
    * wall on 10× data, BASELINE.md).
    *
    * The centers are the corpus's OWN vectors at `vec_id ≡ 0 (mod
    * stride)`, stride = ⌈√n⌉, ordered by id — no training loop at all.
    * Three properties make this the scale pick over a sample-fitted
    * Lloyd's refinement ([[fitCentroids]], still available by passing
    * explicit centroids):
    *   1. k grows with the corpus PAST any bounded sample: at 10¹⁰
    *      vectors, k = 10⁵ centers cannot come out of a 20k-row
    *      training sample (Lloyd's caps k at sample size); a strided
    *      data-point pick has no such ceiling, and randomly-chosen
    *      data points are a standard IVF coarse-quantizer init.
    *   2. Cost is one count() (columnless metadata-cheap scan) + one
    *      ⌈n/stride⌉ ≈ √n-row collect (~50 MB at 10¹⁰×64d — the same
    *      bounded-collect class as the IVF list heads any ANN index
    *      ships to searchers), vs Lloyd's iterated driver passes.
    *   3. It is ORACLE-REPLAYABLE: centers are data the oracle engine
    *      also reads (float→double cast is exact on both), and the
    *      cell INDEX is the center's id-rank — so the adaptive key's
    *      DuckDB twin replays assignment bit-for-bit, which a
    *      seeded-shuffle Lloyd's init cannot.
    * Balance: random data points land ∝ local density, so an
    * adversarially hot region still caps at [[knnJoin]]'s `cellCap`
    * replicate-salt — the guard is unchanged.
    *
    * The id-modulus pick assumes ids are "generic" modulo stride (any
    * dense or blockwise-dense id space qualifies; the replica's
    * 10⁷-strided blocks yield ⌈n/stride⌉ ± a few centers). A corpus
    * whose ids all share a residue class would starve the pick — the
    * require fails loudly rather than degrading to one mega-cell. */
  private[graft] def adaptiveCenters(
      s: org.apache.spark.sql.SparkSession, d: String): Array[Array[Double]] = {
    val base = vecs(s, d)
    val n = base.count()
    require(n > 0, "adaptive IVF fit over an empty corpus")
    stridedCenters(base, math.max(1L,
      math.ceil(math.sqrt(n.toDouble)).toLong))
  }

  private def stridedCenters(base: org.apache.spark.sql.DataFrame,
      stride: Long): Array[Array[Double]] = {
    val cents = base.filter(col("vec_id") % stride === 0)
      .orderBy("vec_id").select("v")
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.nonEmpty,
      s"no corpus ids divisible by stride $stride — the id space is " +
        "degenerate modulo the stride; pass explicit centroids instead")
    cents
  }

  /** Smallest integer s with s^p ≥ n, computed by an INTEGER scan over
    * a ±4 window around the floating estimate — the estimate only
    * positions the window, the comparison is exact long arithmetic, so
    * the result cannot drift between engines the way a bare
    * `ceil(pow(n, 1/p))` can at a boundary (libm pow differs in the
    * last ulp across implementations). The DuckDB twins replay the
    * same window + integer filter. */
  private[graft] def smallestRoot(n: Long, p: Int): Long = {
    require(n >= 1 && (p == 2 || p == 3), s"smallestRoot($n, $p)")
    var s = math.max(1L,
      math.floor(math.pow(n.toDouble, 1.0 / p)).toLong - 3)
    def pow(x: Long): Long = if (p == 2) x * x else x * x * x
    while (pow(s) < n) s += 1
    s
  }

  /** TWO-LEVEL IVF hierarchy fit ([[knnJoinHier]]): fine centers are
    * the corpus's own vectors at stride s (smallest s with s³ ≥ n, so
    * k_f ≈ n^(2/3) cells), coarse centers are every t-th FINE center
    * (smallest t with t² ≥ k_f, so k_c ≈ √k_f = n^(1/3)), and each
    * fine center is OWNED by its nearest coarse center (sequential
    * (x−c)² fold, ties to the lower coarse position — the same
    * arithmetic the expression and the oracle replay). A coarse
    * center that ends up owning nothing (possible under exact
    * duplicate vectors: the replica warehouses clone rows, two
    * identical coarse centers tie every fine center toward the lower
    * position) is DROPPED and the survivors re-indexed, preserving
    * order — that is what lets [[graft.functions.HierIvfCells]]
    * guarantee every probed group is non-empty instead of emitting
    * cell-less corpus rows.
    *
    * Scale note: the driver arrays here are k_f ≈ n^(2/3) vectors —
    * affordable only below [[HierFitDriverMaxFine]]; past it
    * [[knnJoinHier]] dispatches to [[hierAssignFrame]], where the fit
    * runs as joins and driver state drops to the O(n^(1/3)) coarse
    * matrix. This array arm stays the below-threshold default because
    * the expression assignment is map-only whole-stage codegen. */
  private[graft] def hierCenters(
      s: org.apache.spark.sql.SparkSession, d: String,
      nKnown: Option[Long] = None):
      (Array[Array[Double]], Array[Array[Double]], Array[Array[Int]]) = {
    val base = vecs(s, d)
    val n = nKnown.getOrElse(base.count())
    require(n > 0, "hierarchical IVF fit over an empty corpus")
    val fine = stridedCenters(base, smallestRoot(n, 3))
    val kf = fine.length
    val step = smallestRoot(kf.toLong, 2).toInt
    val coarsePos = (0 until kf by step).toArray
    val coarseRaw = coarsePos.map(fine(_))
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      val m = math.min(a.length, b.length)
      var acc = 0d
      var j = 0
      while (j < m) { val t = a(j) - b(j); acc += t * t; j += 1 }
      acc
    }
    val owners = fine.map { fv =>
      var best = 0
      var bestD = sqDist(fv, coarseRaw(0))
      var c = 1
      while (c < coarseRaw.length) {
        val dd = sqDist(fv, coarseRaw(c))
        if (dd < bestD) { best = c; bestD = dd }
        c += 1
      }
      best
    }
    val ownerSet = owners.toSet
    val keep = coarseRaw.indices.filter(ownerSet)
    val remap = keep.zipWithIndex.toMap
    val coarse = keep.map(coarseRaw(_)).toArray
    val owned = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    owners.zipWithIndex.foreach { case (o, fid) => owned(remap(o)) += fid }
    (coarse, fine, owned.map(_.toArray))
  }

  /** Hierarchical corpus×corpus kNN join ([[graft.Graft.knnJoinHier]];
    * oracle key `q_similarity_knn_join_hier`) — the sub-n^1.5 rung
    * BASELINE.md's fixed-cell-size rejection note named: with k_f ≈
    * n^(2/3) fine cells routed through n^(1/3) coarse centers,
    * assignment costs n·2n^(1/3) and pair scoring n²/k_f — BOTH
    * Θ(n^(4/3)), the balanced two-level optimum, vs the flat
    * quantizer's Θ(n^1.5). The price is recall (scanned fraction
    * nprobe/k_f shrinks as cells multiply — published per round by
    * RecallProbe); [[knnRefineHier]] composes the NN-Descent rounds
    * on top to buy it back at linear cost, keeping the total at
    * n^(4/3). Same replicate-salt hot-cell machinery as [[knnJoin]]. */
  /** Fine-center count beyond which the hierarchical fit runs as
    * DATAFRAMES instead of driver arrays (r15 verdict task 1). Below it
    * (every gated scale incl. the 100× replica: k_f = 15.9k at n = 2M),
    * the array fit + [[graft.functions.HierIvfCells]] expression wins —
    * zero joins, whole-stage-codegen assignment. Above it — the 100 TB
    * design point is 10¹⁰⁺ vectors ⇒ k_f = n^(2/3) ≈ 4.6M+ centers,
    * 2–10 GB if collected — [[hierAssignFrame]] takes over and
    * driver-held fit state drops to the O(n^(1/3)) coarse matrix (a few
    * MB at ANY scale). 2²⁰ fine centers ≈ 512 MB of driver arrays is
    * the same measured-volume cutoff class as
    * [[Dedup.connectedComponents]]'s `driverMax`. */
  private[graft] val HierFitDriverMaxFine: Long = 1L << 20

  /** Driver-collected row count of the LAST hierarchy fit (coarse
    * centers + survivor ids for the frame path; fine-center count for
    * the array path) — what the VectorSpec driver-state pin reads. */
  @volatile private[graft] var lastHierFitDriverRows: Long = -1L

  private[graft] def knnJoinHier(
      s: org.apache.spark.sql.SparkSession, d: String,
      nprobe: Int = 2, k: Int = 3, cellCap: Int = 4096,
      fitDriverMaxFine: Long = HierFitDriverMaxFine,
      ordered: Boolean = true): org.apache.spark.sql.DataFrame = {
    val n = vecs(s, d).count()
    require(n > 0, "hierarchical IVF fit over an empty corpus")
    val strideF = smallestRoot(n, 3)
    // dispatch on the fit's driver footprint BEFORE building it: k_f is
    // within ±(id-gap noise) of n/stride for any dense or blockwise-
    // dense id space (the adaptiveCenters genericity assumption), and
    // the cutoff only sizes a resource decision — both arms produce
    // bit-identical assignments (VectorSpec pins equality), so a
    // borderline estimate can never change results, only which engine
    // path computes them.
    val kfEst = n / math.max(1L, strideF)
    // the arm rides the cache key: outputs are pinned bit-identical, but
    // a forced-arm call (spec, explicit fitDriverMaxFine) must never be
    // served the OTHER arm's cached frame and silently test nothing
    val arm = if (kfEst <= fitDriverMaxFine) "arr" else "frame"
    val assignKey = s"knn_hier_assign_${nprobe}_${n}_${strideF}_$arm"
    if (kfEst <= fitDriverMaxFine) {
      val (coarse, fine, owned) = hierCenters(s, d, Some(n))
      lastHierFitDriverRows = fine.length.toLong
      // a degenerate hierarchy (constant/duplicated strided centers) can
      // survive cleanup with ONE coarse group; the twin's `crk <= 2`
      // naturally degrades to the single group, so clamp rather than trip
      // the expression's range require — the engines stay in lockstep
      graft.functions.HierIvfCells.register(s, coarse, fine, owned,
        nprobeCoarse = math.min(2, coarse.length), nprobe = nprobe)
      cellKnnJoin(s, d, assignKey, k, cellCap,
        nCells = fine.length.toLong, ordered = ordered)(
        vecs(s, d).withColumn("cells", expr("hier_cells(v)")))
    } else {
      cellKnnJoin(s, d, assignKey, k, cellCap, nCells = kfEst,
        ordered = ordered)(
        hierAssignFrame(s, d, n, strideF, nprobe))
    }
  }

  /** DISTRIBUTED two-level assignment — the above-threshold arm of
    * [[knnJoinHier]] (r15 verdict task 1: the array fit's k_f ≈ n^(2/3)
    * fine centers are 2–10 GB of driver state at 10¹⁰⁺ vectors). Same
    * contract as [[graft.functions.HierIvfCells]], re-expressed so the
    * only driver-held fit state is O(n^(1/3)):
    *
    *   1. FINE CENTERS STAY A FRAME: corpus rows at the cube-root
    *      stride, globally ranked by vec_id via range-repartition +
    *      per-partition offsets (localCheckpoint freezes the partition
    *      ids so the offset pass and the rank pass read one layout) —
    *      never a single-partition window, never a collect.
    *   2. Coarse RAW = every step-th fine center — k_c ≈ n^(1/3) rows,
    *      the ONE collect (a few MB at any scale; the bounded-collect
    *      class of IVF list heads).
    *   3. OWNERSHIP = argmin join: fine frame × broadcast coarse matrix
    *      through a 1-probe [[graft.functions.IvfNearestCells]] scan —
    *      the same sequential (x−c)² fold, ties to the lower coarse
    *      position. Zero-owned coarse centers drop; survivors (≤ k_c
    *      ints, second bounded collect) re-index order-preserving —
    *      byte-for-byte the [[hierCenters]] cleanup.
    *   4. ASSIGNMENT = route + meet: phase 1 ranks each corpus row's
    *      `min(2, k_c)` nearest coarse groups (codegen scan over the
    *      re-indexed coarse matrix — the small object every executor
    *      CAN hold), phase 2 meets the owned fine centers in a
    *      coarse-group-keyed shuffle join (avg group = k_f/k_c =
    *      n^(1/3) fine rows ⇒ candidate volume n·2n^(1/3) = Θ(n^(4/3)),
    *      the same work the expression does per row, now bandwidth
    *      instead of driver memory), and a per-row window keeps the
    *      `nprobe` nearest fine cells by (dist asc, fine position asc).
    *
    * The distance is `aggregate(zip_with(v, fv, (x,y)→(x−y)²), 0D, +)` —
    * the identical element-order left fold, so both arms emit
    * bit-identical `cells` arrays and the DuckDB twin needs no second
    * variant (VectorSpec pins arm equality on the fixture). */
  private[graft] def hierAssignFrame(
      s: org.apache.spark.sql.SparkSession, d: String,
      n: Long, strideF: Long, nprobe: Int): org.apache.spark.sql.DataFrame = {
    val base = vecs(s, d)
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    // global fine rank without a global sort bottleneck: range layout is
    // frozen by the checkpoint (range boundaries come from a sample —
    // two independent evaluations could split differently; one frozen
    // layout serves both the offset scan and the rank scan)
    val ranged = graft.CacheRegistry.getOrCheckpoint(
      s"hier_fit_fine_ranged_$strideF", d,
      base.filter(col("vec_id") % strideF === 0)
        .select("vec_id", "v")
        .repartitionByRange(parts, col("vec_id"))
        .withColumn("pid", spark_partition_id()))
    val offs = ranged.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("pid", "off")
    val fine = ranged.join(broadcast(offs), "pid")
      .withColumn("fine_pos", (col("off") + row_number().over(
        Window.partitionBy("pid").orderBy("vec_id")) - 1).cast(IntegerType))
      .select(col("fine_pos"), col("v").as("fv"))
    val kf = ranged.count()
    require(kf > 0,
      s"no corpus ids divisible by stride $strideF — the id space is " +
        "degenerate modulo the stride; pass explicit centroids instead")
    val step = smallestRoot(kf, 2)
    // THE driver budget: k_c ≈ n^(1/3) coarse rows + ≤ k_c survivor ids
    val coarseRaw: Array[Array[Double]] = fine
      .filter(col("fine_pos") % step === 0)
      .orderBy("fine_pos").select("fv")
      .collect().map(_.getSeq[Double](0).toArray)
    graft.functions.IvfNearestCells.registerAs(s, "hier_fit_own",
      coarseRaw, 1)
    val owned0 = graft.CacheRegistry.getOrPersist(
      s"hier_fit_owned_$strideF", d,
      fine.withColumn("cpos0",
        expr("element_at(hier_fit_own(fv), 1)")))
    val survivors = owned0.select("cpos0").distinct()
      .collect().map(_.getInt(0)).sorted
    lastHierFitDriverRows = coarseRaw.length.toLong + survivors.length
    val coarse = survivors.map(coarseRaw(_))
    val remapDf = s.createDataFrame(
      s.sparkContext.parallelize(
        survivors.zipWithIndex.map { case (c0, i) => org.apache.spark.sql.Row(c0, i) }.toSeq, 1),
      StructType(Seq(StructField("cpos0", IntegerType, nullable = false),
        StructField("cgrp", IntegerType, nullable = false))))
    val fineOwned = owned0.join(broadcast(remapDf), "cpos0")
      .select("cgrp", "fine_pos", "fv")
    // phase 1: codegen coarse routing — the matrix every executor can
    // hold at any corpus size
    graft.functions.IvfNearestCells.registerAs(s, "hier_fit_route",
      coarse, math.min(2, coarse.length))
    val probed = base
      .withColumn("cgrp", explode(expr("hier_fit_route(v)")))
    // phase 2: meet the probed groups' fine centers; rank per row
    val cand = probed.join(fineOwned, "cgrp")
      .withColumn("dist", expr(
        "aggregate(zip_with(v, fv, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, z) -> acc + z)"))
    val wRank = Window.partitionBy("vec_id")
      .orderBy(col("dist").asc, col("fine_pos").asc)
    val cells = cand.withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= nprobe)
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("rk"), col("fine_pos")))),
        _.getField("fine_pos")).as("cells"))
    base.join(cells, "vec_id")
  }

  /** kNN-GRAPH REFINEMENT — NN-Descent over the adaptive IVF init
    * ([[graft.Graft.knnGraphRefined]]; oracle key
    * `q_similarity_knn_refine`). The adaptive join's published weak
    * spot is RECALL, not cost: at k=√n cells and nprobe=2 the scanned
    * fraction is 2/√n, and recall@3 tracks it (0.217 at sf0.1,
    * BASELINE.md "recall is now a published number"). Raising nprobe
    * buys recall back only at n² cost — the IVF trade is fundamental.
    * NN-Descent (Dong, Moses & Li, WWW'11: "Efficient K-Nearest
    * Neighbor Graph Construction for Generic Similarity Measures")
    * escapes it with the neighbor-of-my-neighbor observation: if b is
    * near a and c is near b, c is likely near a. Each round:
    *   1. symmetrize the current graph (fwd ∪ reversed edges — the
    *      paper's "reverse neighbors", carrying the pair's cosine,
    *      which is symmetric, so the reversed edge needs no rescore);
    *   2. cap each adjacency list at `cap` by (cosine DESC, cid) —
    *      the paper's ρ-sampling made DETERMINISTIC so the oracle can
    *      replay it (a hub vector that is reverse-neighbor of many
    *      rows would otherwise make the join quadratic);
    *   3. join the capped list with itself through the shared middle
    *      vector (≤ cap² candidate pairs per row — LINEAR in n);
    *   4. rescore candidates ∪ current edges, keep top-k per row.
    * Work per round is n·cap²·dim — the init's n^1.5 assignment
    * dominates asymptotically, so the recall lift is +linear cost.
    * Convergence is fixed at `rounds` (not a delta test) so both
    * engines unroll the SAME iteration count; each round's graph is
    * registry-persisted (the fwd∪rev self-union would otherwise
    * recompute the whole prior round twice per round, doubling work
    * per level exactly like the converge loops the graph family
    * checkpoints). Working width: the graph iterates at `workK`
    * neighbors and only the final emit cuts to `k` — at k=3 the graph
    * is too sparse to percolate on a near-uniform corpus (measured
    * recall ceiling 0.30 at workK=3, 0.47 at workK=10); workK=20 with
    * cap=40 and 4 rounds reaches recall@3 0.946 vs the init's 0.217
    * (RecallProbe at sf0.1, BASELINE.md round-15 section). */
  private[graft] def knnRefine(
      s: org.apache.spark.sql.SparkSession, d: String,
      rounds: Int = 4, k: Int = 3, workK: Int = 20,
      cap: Int = 40,
      bcastMaxVecs: Long = RefineBroadcastMaxVecs): org.apache.spark.sql.DataFrame =
    knnRefineFrom(s, d, "adaptive",
      () => knnJoin(s, d, adaptiveCenters(s, d), nprobe = 2, k = workK,
        ordered = false),
      rounds, k, workK, cap, bcastMaxVecs)

  /** [[knnRefine]] seeded by the HIERARCHICAL join instead of the flat
    * adaptive one (oracle key `q_similarity_knn_refine_hier`): the
    * n^(4/3) init's recall is the lowest of the family (scanned
    * fraction 2/n^(2/3)), and the NN-Descent rounds are exactly the
    * repair that does not change the asymptotics — the whole pipeline
    * stays Θ(n^(4/3)) + linear rounds. */
  private[graft] def knnRefineHier(
      s: org.apache.spark.sql.SparkSession, d: String,
      rounds: Int = 4, k: Int = 3, workK: Int = 20,
      cap: Int = 40): org.apache.spark.sql.DataFrame =
    knnRefineFrom(s, d, "hier",
      () => knnJoinHier(s, d, nprobe = 2, k = workK, ordered = false),
      rounds, k, workK, cap)

  /** Corpus size at or below which the NN-Descent RESCORE joins ship the
    * vector table as a broadcast instead of shuffling the n·cap²
    * candidate stream through vector-keyed exchanges. 2¹⁸ rows × 64
    * doubles ≈ 140 MB framed — the [[graft.ops.Graph.BroadcastMaxNodes]]
    * volume class. Above it the joins fall back to shuffles, with the
    * pair stream crossing the wire carrying a vector payload exactly
    * ONCE (the measured-dispatch pattern of `asofAutoWidth` /
    * `hintNodeGrain` / the DSIR vocabulary join). */
  private[graft] val RefineBroadcastMaxVecs: Long = 1L << 18

  private def knnRefineFrom(
      s: org.apache.spark.sql.SparkSession, d: String, initTag: String,
      init: () => org.apache.spark.sql.DataFrame,
      rounds: Int, k: Int, workK: Int,
      cap: Int,
      bcastMaxVecs: Long = RefineBroadcastMaxVecs): org.apache.spark.sql.DataFrame = {
    require(rounds >= 1 && workK >= k && cap >= workK,
      s"need rounds >= 1, workK >= k, cap >= workK; " +
        s"got rounds=$rounds k=$k workK=$workK cap=$cap")
    val side = graft.CacheRegistry.getOrPersist("knn_refine_vecs", d,
      vecs(s, d).select("vec_id", "v", "nrm"))
    val q = side.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = side.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"))
    // measured dispatch for the rescore: the count is one metadata agg
    // over the persisted side table, paid once per (session, corpus).
    // Below the threshold the rescore is a REGISTERED codegen expression
    // over the collected corpus ([[graft.functions.PairCosine]]) — the
    // vector table is loop-invariant, so shipping it once per executor
    // beats rebuilding a broadcast hash relation (2 jobs) every round;
    // the driver/executor volume is the SAME bytes the broadcast arm
    // would pin. Above the threshold the rescore stays shuffle joins.
    val smallCorpus = side.count() <= bcastMaxVecs
    // the arm rides every round's cache key (the knnJoinHier precedent):
    // a forced-arm call (the VectorSpec arm-equality pin) must never be
    // served the OTHER arm's cached rounds and silently test nothing
    val arm = if (smallCorpus) "expr" else "join"
    if (smallCorpus) {
      // memoized per (session, corpus): the 4 refine-family keys share
      // one collect + one broadcast instead of re-shipping the identical
      // table per call and leaking the superseded broadcasts (r16
      // advice item 3)
      graft.functions.PairCosine.registerOnce(s, s"knn_refine_vecs:$d") {
        val rows = side.select("vec_id", "v", "nrm").collect()
        (rows.map(_.getLong(0)),
          rows.map(_.getSeq[Double](1).toArray),
          rows.map(_.getDouble(2)))
      }
    }
    // getOrCheckpoint, not getOrPersist: each round reads the previous
    // graph TWICE (fwd ∪ reversed), so a lazy persist leaves a logical
    // plan that doubles per round — 4 rounds of windows+joins over a
    // 2⁴-wide analyzed tree took minutes to PLAN (the converge-loop
    // plan-growth class the graph family checkpoints away; measured
    // here: 3 min → seconds at sf0.1). The checkpoint collapses each
    // round to a LogicalRDD scan.
    var g = graft.CacheRegistry.getOrCheckpoint(
      s"knn_refine_${initTag}_${workK}_${cap}_r0", d,
      init().select("qid", "cid", "cosine"))
    // ONE window spec serves dedupe, cap and the per-round top-workK:
    // every qid-keyed step below reuses the same hash(qid) exchange.
    val wCap = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    // restore the CALLER's description on every exit path (r16 advice
    // item 4: a mid-loop failure used to leak the knn_refine label onto
    // unrelated subsequent jobs on this thread, and the non-exception
    // path clobbered any prior label with null)
    val prevDesc = s.sparkContext.getLocalProperty("spark.job.description")
    try {
    for (r <- 1 to rounds) {
      val e = g.union(g.select(col("cid").as("qid"), col("qid").as("cid"),
        col("cosine")))
      // dedupe + cap in ONE exchange instead of distinct + window (the
      // r16 optimization round; was 2 shuffles): a duplicated (qid, cid)
      // pair always carries the SAME cosine (the fold is symmetric and
      // deterministic), so duplicates are ADJACENT under
      // (cosine DESC, cid) and a lag() test drops every copy after the
      // first; the row_number cap rides the same sort with no new
      // exchange (filter preserves partitioning and order).
      // adj is read THREE times (self-join x side, y side, candidate
      // union); without the persist each consumer re-runs the union +
      // window pipeline as its own AQE stage chain — measured ~0.7 s of
      // single-task stage per re-read per round at sf0.1.
      // r17 note (verdict item 8, second fuse attempt, MEASURED and
      // rejected): inlining adj into the round query — its three
      // consumers are canonically identical, so ReuseExchange serves
      // them from one hash(qid) shuffle — read 8.9/8.9/9.5 s on
      // q_similarity_knn_refine_hier vs 8.1/8.5 s for this checkpointed
      // shape in an interleaved A/B at sf0.1 (refine: a wash). The
      // reused exchange still recomputes the dedupe window per consumer
      // and grows the round's AQE plan; the checkpoint also sorts the
      // symmetrized list ONCE at any scale. Two materializations per
      // round stay.
      s.sparkContext.setJobDescription(s"knn_refine[$initTag] r$r adj")
      val adj = graft.CacheRegistry.getOrCheckpoint(
        s"knn_refine_adj_${initTag}_${workK}_${cap}_${arm}_r$r", d,
        e.withColumn("__dup", lag("cid", 1).over(wCap) === col("cid"))
          .filter(!coalesce(col("__dup"), lit(false)))
          .withColumn("rk", row_number().over(wCap))
          .filter(col("rk") <= cap).select("qid", "cid"))
      val non = adj.as("x").join(adj.as("y"), col("x.cid") === col("y.qid"))
        .select(col("x.qid").as("qid"), col("y.cid").as("cid"))
        .filter(col("qid") =!= col("cid"))
      // the UNCAPPED current graph g rides along explicitly: adj alone is
      // the cap-truncated SYMMETRIZED list, and a hub row with > cap
      // higher-cosine reverse edges would evict its own forward edges
      // from adj — rescoring non ∪ adj only could then DROP a current
      // top-k edge and degrade that query in a round (r15 advice). With
      // g in the candidate set the per-qid top-k cosine sum is
      // non-decreasing by construction, unconditionally.
      //
      // The candidate stream — the round's BIG frame, n·cap² pairs —
      // is repartitioned by qid exactly once; hash(qid) clusters
      // (qid, cid) too, so the dedupe aggregation, the qid-side rescore
      // join and the top-workK window all reuse this one exchange
      // instead of adding their own (guide §2.4: shared exchanges).
      // Small corpora broadcast both vector sides (zero pair-stream
      // shuffles after this one); big corpora shuffle-join, with the
      // vectors dropped BEFORE the ranking window so the only exchange
      // that ever carries a vector payload is the cid-side attach
      // (§2.3: project before the exchange).
      val cand = non.union(adj).union(g.select("qid", "cid"))
        .repartition(col("qid"))
        .dropDuplicates("qid", "cid")
      // pair_cosine(qid, cid) ≡ round-free dot_product(qv, cv)/(qn·cn)
      // on the joined frame (same sequential fold, same precomputed
      // norms); Spark's own round(…, 6) stays on top in both arms, so
      // the emitted cosine is bit-identical whichever arm runs.
      val scored =
        if (smallCorpus)
          cand.withColumn("cosine",
            round(expr("pair_cosine(qid, cid)"), 6))
        else
          cand.join(q, "qid").join(c, "cid")
            .withColumn("cosine",
              round(expr("dot_product(qv, cv)") / (col("qn") * col("cn")), 6))
            .select("qid", "cid", "cosine")
            .repartition(col("qid"))
      s.sparkContext.setJobDescription(s"knn_refine[$initTag] r$r rescore")
      g = graft.CacheRegistry.getOrCheckpoint(
        s"knn_refine_${initTag}_${workK}_${cap}_${arm}_r$r", d,
        scored.withColumn("rk", row_number().over(wCap))
          .filter(col("rk") <= workK)
          .select("qid", "cid", "cosine"))
    }
    } finally s.sparkContext.setJobDescription(prevDesc)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    g.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "cosine")
      .orderBy("qid", "rank")
  }

  /** DuckDB twin of [[knnRefine]]: the adaptive-join CTE chain as g0,
    * then `rounds` UNROLLED NN-Descent rounds (symmetrize with the
    * carried symmetric cosine, cap by (cosine DESC, cid), ⋈ through
    * the middle vector, rescore, top-k) — the fixed iteration count is
    * what makes the twin possible at all; a convergence test would
    * fork the engines' round counts. */
  private def duckKnnRefine(nprobe: Int, k: Int, rounds: Int,
      workK: Int, cap: Int): String =
    s"""${duckKnnRefineCtes(duckKnnJoinCtes(
        "SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS stride FROM n",
        nprobe), rounds, workK, cap)}
       |SELECT qid, rank, cid, cosine FROM (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM g$rounds)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** The refine chain up through `g<rounds>` (qid, cid, cosine at the
    * working width) — shared by the refine key's final cut and the
    * mutual-kNN clustering oracle so the two can never drift. */
  private def duckKnnRefineCtes(initCtes: String, rounds: Int,
      workK: Int, cap: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""e$r AS (
         |  SELECT DISTINCT qid, cid, cosine FROM (
         |    SELECT qid, cid, cosine FROM g${r - 1}
         |    UNION ALL
         |    SELECT cid AS qid, qid AS cid, cosine FROM g${r - 1})
         |), adj$r AS MATERIALIZED (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, cid) AS rk FROM e$r)
         |  WHERE rk <= $cap
         |), cand$r AS (
         |  -- non ∪ adj ∪ g: the uncapped current graph is in the rescore
         |  -- set explicitly (same hub-eviction reasoning as the Spark side)
         |  SELECT DISTINCT qid, cid FROM (
         |    SELECT x.qid, y.cid FROM adj$r x JOIN adj$r y ON x.cid = y.qid
         |    WHERE x.qid <> y.cid
         |    UNION ALL SELECT qid, cid FROM adj$r
         |    UNION ALL SELECT qid, cid FROM g${r - 1})
         |), sc$r AS (
         |  -- list_dot_product, not the fold the other twins use: it is
         |  -- DuckDB's sequential C++ loop over the same doubles — verified
         |  -- bit-identical to the fold (and to Spark's dot_product codegen
         |  -- fold) on every corpus pair, and ~100× faster, which is what
         |  -- makes an unrolled 4-round n·cap² oracle feasible at the
         |  -- replica. Any reassociation drift would fail the hash gate.
         |  SELECT p.qid, p.cid,
         |    round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
         |      AS cosine
         |  FROM cand$r p JOIN n q ON q.vec_id = p.qid
         |    JOIN n c ON c.vec_id = p.cid
         |), g$r AS MATERIALIZED (
         |  SELECT qid, cid, cosine FROM (
         |    SELECT qid, cid, cosine, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, cid) AS rk FROM sc$r)
         |  WHERE rk <= $workK
         |)""".stripMargin
    }.mkString(", ")
    s"""$initCtes,
       |g0 AS MATERIALIZED (
       |  SELECT qid, cid, cosine FROM ranked WHERE rank <= $workK
       |), $roundCtes""".stripMargin
  }

  /** Mutual-kNN embedding clusters ([[graft.Graft.embeddingClusters]];
    * oracle key `q_embedding_cluster_mutual`) — the SemDeDup-shaped
    * grouping step: an edge survives only when BOTH endpoints rank
    * each other in their top-k at cosine ≥ `tau` (mutuality is the
    * standard precision filter — a hub vector that merely APPEARS in
    * many top-k lists cannot glue unrelated regions together), then
    * connected components label each cluster by its min vec_id and
    * every vector gets (cluster, cluster_size); singletons label
    * themselves. Built entirely from [[knnRefineHier]]'s
    * registry-cached graph (recall 0.935 at Θ(n^(4/3)) + linear
    * rounds — the family's cheapest high-recall graph, so the mutual
    * test operates on near-truth neighbor sets at the lowest measured
    * exponent: the whole clustering pipeline inherits n^(4/3)) + one self-join + [[Dedup.connectedComponents]]
    * (driver union-find below the measured threshold, HashMin +
    * pointer jumping above — the same size-adaptive dispatch as the
    * dedup family). At the 10× replica the corpus contains exact
    * clone groups by construction and the clusters recover them —
    * the embedding-dedup "group then keep one" precursor. */
  private[graft] def mutualKnnClusters(
      s: org.apache.spark.sql.SparkSession, d: String,
      tau: Double = 0.4): org.apache.spark.sql.DataFrame = {
    val lab = mutualLabels(s, d, tau)
    val sizes = lab.groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "cluster")
      .select("vec_id", "cluster", "cluster_size")
      .orderBy("vec_id")
  }

  /** The label frame (vec_id, cluster) alone — [[semanticDedup]]
    * consumes THIS, not [[mutualKnnClusters]], so the audit path never
    * pays the cluster-size aggregation + size join + global vec_id
    * sort it would immediately discard. */
  private def mutualLabels(
      s: org.apache.spark.sql.SparkSession, d: String,
      tau: Double): org.apache.spark.sql.DataFrame = {
    val g = knnRefineHier(s, d)
      .filter(col("cosine") >= tau)
      .select("qid", "cid")
    val mutual = g.as("f").join(g.as("r"),
        col("f.qid") === col("r.cid") && col("f.cid") === col("r.qid"))
      .filter(col("f.qid") < col("f.cid"))
      .select(col("f.qid").as("doc_a"), col("f.cid").as("doc_b"))
    val labels = Dedup.connectedComponents(mutual)._1
      .withColumnRenamed("doc_id", "vec_id")
    vecs(s, d).select("vec_id")
      .join(labels, Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("keep_id"), col("vec_id")))
      .select("vec_id", "cluster")
  }

  /** DuckDB twin of [[mutualKnnClusters]]: the refine chain, the
    * thresholded mutual join, and the Dedup family's unrolled
    * HashMin+jump rounds. 12 rounds, not the dedup keys' 8: an
    * insufficient unroll cannot pass silently (the gate hash-compares
    * against Spark's CONVERGED labels) and 6 rounds WERE measured
    * insufficient at sf0.1 — the organic τ=0.4 mutual graph grows a
    * long-chain giant component, unlike the replica's shallow clone
    * cliques; 12 is measured converged at every gated scale. */
  private def duckMutualClusters(nprobe: Int, rounds: Int, workK: Int,
      cap: Int, tau: Double): String =
    s"""${duckMutualClustersCtes(nprobe, rounds, workK, cap, tau)}
       |SELECT l.vec_id, l.cluster, s.cluster_size
       |FROM lab l JOIN sz s USING (cluster)
       |ORDER BY vec_id""".stripMargin

  /** [[duckMutualClusters]]'s chain up through `lab`(vec_id, cluster)
    * and `sz`(cluster, cluster_size) — shared with the semantic-dedup
    * twin so the two oracles can never drift. */
  private def duckMutualClustersCtes(nprobe: Int, rounds: Int,
      workK: Int, cap: Int, tau: Double): String =
    s"""${duckKnnRefineCtes(duckHierCtes(nprobe), rounds, workK, cap)},
       |gt AS MATERIALIZED (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid, cosine,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY cosine DESC, cid) AS rk
       |    FROM g$rounds)
       |  WHERE rk <= 3 AND cosine >= $tau
       |), mut AS MATERIALIZED (
       |  SELECT f.qid AS a, f.cid AS b
       |  FROM gt f JOIN gt r ON f.qid = r.cid AND f.cid = r.qid
       |  WHERE f.qid < f.cid
       |), und AS MATERIALIZED (
       |  SELECT a, b FROM mut UNION ALL SELECT b, a FROM mut
       |), l0 AS MATERIALIZED (
       |  SELECT a AS doc, min(least(a, b)) AS lab FROM und GROUP BY a
       |), ${Dedup.duckHashMinRounds(12)}, conv AS (
       |  -- twin-side convergence assertion (r15 advice): the 12-round
       |  -- unroll is only valid while the mutual graph's diameter fits
       |  -- it. An insufficient unroll must REPORT ITSELF (error()) at
       |  -- twin build time, not surface as a bare hash mismatch.
       |  SELECT count(*) AS n_drift FROM (
       |    SELECT doc, lab FROM l12 EXCEPT SELECT doc, lab FROM l11)
       |), lab AS (
       |  SELECT n.vec_id,
       |    CASE WHEN (SELECT n_drift FROM conv) > 0
       |      THEN error('mutual-cluster HashMin unroll (12 rounds) did ' ||
       |        'not converge: l12 <> l11 - raise the twin unroll')
       |      ELSE coalesce(l12.lab, n.vec_id) END AS cluster
       |  FROM n LEFT JOIN l12 ON l12.doc = n.vec_id
       |), sz AS (
       |  SELECT cluster, CAST(count(1) AS BIGINT) AS cluster_size
       |  FROM lab GROUP BY cluster
       |)""".stripMargin

  /** Sequential (X−Y)² distance fold between two list columns — the
    * exact arithmetic [[graft.functions.HierIvfCells]] (and the flat
    * chain) computes, as inline SQL. */
  private def duckSqDist(x: String, y: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len($x)),
       |        i -> ($x[i] - $y[i]) * ($x[i] - $y[i]))),
       |      (s0, z) -> s0 + z)""".stripMargin

  /** DuckDB twin of the HIERARCHICAL quantizer chain ([[knnJoinHier]]),
    * ending at `ranked` like [[duckKnnJoinCtes]] so the refine/cluster
    * builders compose over either init. Every stage recomputes from
    * the corpus: the fine stride is the smallest s with s³ ≥ n and the
    * coarse step the smallest t with t² ≥ k_f, found by an INTEGER
    * filter over a ±4 window around the pow() estimate (the estimate
    * only positions the window — a bare ceil(pow()) could flip at a
    * boundary between libm implementations); owners are argmin over
    * the coarse set with ties to the lower position; zero-owned coarse
    * centers drop and the survivors re-index — byte-for-byte the
    * [[hierCenters]] contract. */
  private def duckHierCtes(nprobe: Int): String =
    s"""$duckVecs, cnt AS (
       |  SELECT count(*) AS n_rows,
       |    CAST(greatest(floor(pow(count(*), 1.0/3.0)) - 3, 1) AS BIGINT)
       |      AS base
       |  FROM n
       |), stf AS (
       |  -- NULL here means the pow() estimate undershot by >7 — the twin
       |  -- must ERROR, not silently fork from smallestRoot's unbounded
       |  -- upward scan (r15 advice); the window bound is shared prose
       |  -- with smallestRoot's ±4 positioning + slack
       |  SELECT coalesce(min(base + t.o), error(
       |    'hier twin stride window exhausted: pow() undershot cbrt by >7'))
       |    AS stride
       |  FROM cnt, unnest([0,1,2,3,4,5,6,7]) t(o)
       |  WHERE (base + t.o) * (base + t.o) * (base + t.o) >= n_rows
       |), fine AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
       |    AS fpos, v AS fv
       |  FROM n, stf WHERE vec_id % stf.stride = 0
       |), kf AS (
       |  SELECT count(*) AS k_f,
       |    CAST(greatest(floor(pow(count(*), 0.5)) - 3, 1) AS BIGINT)
       |      AS cbase
       |  FROM fine
       |), stc AS (
       |  SELECT coalesce(min(cbase + t.o), error(
       |    'hier twin step window exhausted: pow() undershot sqrt by >7'))
       |    AS cstep
       |  FROM kf, unnest([0,1,2,3,4,5,6,7]) t(o)
       |  WHERE (cbase + t.o) * (cbase + t.o) >= k_f
       |), coarse0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY fpos) - 1 AS INT)
       |    AS cpos0, fv AS cv
       |  FROM fine, stc WHERE fpos % stc.cstep = 0
       |), ownd AS MATERIALIZED (
       |  SELECT fpos, cpos0 FROM (
       |    SELECT f.fpos, c.cpos0,
       |      row_number() OVER (PARTITION BY f.fpos
       |        ORDER BY ${duckSqDist("f.fv", "c.cv")}, c.cpos0) AS rk
       |    FROM fine f, coarse0 c)
       |  WHERE rk = 1
       |), coarse AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY cpos0) - 1 AS INT)
       |    AS cpos, cpos0, cv
       |  FROM coarse0 WHERE cpos0 IN (SELECT DISTINCT cpos0 FROM ownd)
       |), owners AS MATERIALIZED (
       |  SELECT o.fpos, c.cpos FROM ownd o JOIN coarse c USING (cpos0)
       |), vc AS MATERIALIZED (
       |  SELECT vec_id, cpos FROM (
       |    SELECT nn.vec_id, c.cpos,
       |      row_number() OVER (PARTITION BY nn.vec_id
       |        ORDER BY ${duckSqDist("nn.v", "c.cv")}, c.cpos) AS crk
       |    FROM n nn, coarse c)
       |  WHERE crk <= 2
       |), fcand AS MATERIALIZED (
       |  SELECT vec_id, fpos, frk FROM (
       |    SELECT vv.vec_id, ow.fpos,
       |      row_number() OVER (PARTITION BY vv.vec_id
       |        ORDER BY ${duckSqDist("nv.v", "f.fv")}, ow.fpos) AS frk
       |    FROM vc vv JOIN owners ow USING (cpos)
       |      JOIN fine f ON f.fpos = ow.fpos
       |      JOIN n nv ON nv.vec_id = vv.vec_id)
       |), assigned AS MATERIALIZED (
       |  SELECT nn.vec_id, nn.v, nn.nrm, fc.fpos AS cell
       |  FROM fcand fc JOIN n nn ON nn.vec_id = fc.vec_id
       |  WHERE fc.frk = 1
       |), probes AS (
       |  SELECT nn.vec_id AS qid, nn.v AS qv, nn.nrm AS qn,
       |    fc.fpos AS cell
       |  FROM fcand fc JOIN n nn ON nn.vec_id = fc.vec_id
       |  WHERE fc.frk <= $nprobe
       |), hcand AS (
       |  -- 'hcand', not 'cand': the curate pipeline splices these chains
       |  -- next to the LSH fragment, whose candidate CTE owns 'cand'
       |  SELECT p.qid, p.qv, p.qn, a.vec_id AS cid, a.v AS cv, a.nrm AS cn
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.qid
       |), scored AS (
       |  SELECT qid, cid,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(generate_series(1, len(qv)),
       |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
       |      / (qn * cn), 6) AS cosine
       |  FROM hcand
       |), ranked AS (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM scored
       |)""".stripMargin

  private def duckKnnJoinHier(nprobe: Int, k: Int): String =
    s"""${duckHierCtes(nprobe)}
       |SELECT qid, rank, cid, cosine FROM ranked
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  private def duckKnnRefineHier(nprobe: Int, k: Int, rounds: Int,
      workK: Int, cap: Int): String =
    s"""${duckKnnRefineCtes(duckHierCtes(nprobe), rounds, workK, cap)}
       |SELECT qid, rank, cid, cosine FROM (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM g$rounds)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** Semantic dedup over DOCUMENTS ([[graft.Graft.semanticDedup]];
    * oracle key `q_select_semdedup`) — the SemDeDup pipeline run end
    * to end on the corpus a training job actually reads: documents
    * join their embedding's mutual-kNN cluster ([[mutualKnnClusters]],
    * Θ(n^(4/3)) via the hier-seeded refine graph), each cluster keeps
    * ONLY its min-id member, documents WITHOUT an embedding pass
    * through untouched (no semantic signal — dropping them would be a
    * coverage bug, the standard pipeline runs exact/minhash dedup on
    * those), and the output is the per-source curation audit
    * (docs / embedded / dropped / kept / kept chars) a mixture
    * re-weighting step consumes. One broadcast-sized join against the
    * cluster labels + one hash agg on top of the graph build — the
    * pipeline's exponent is the graph's. */
  /** Doc-keyed semantic cluster labels at the semdedup key's parameters
    * — consumed by [[Dedup]]'s curate pipeline (stage 4). */
  private[ops] def semanticLabels(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    mutualLabels(s, d, tau = 0.4).withColumnRenamed("vec_id", "doc_id")

  /** The mutual-cluster twin chain through `lab`(vec_id, cluster) at the
    * same parameters, for splicing into the curate pipeline's oracle —
    * exported so the pipeline and the semdedup key can never drift. */
  private[ops] def duckSemanticLabCtes: String =
    duckMutualClustersCtes(nprobe = 2, rounds = 4, workK = 20, cap = 40,
      tau = 0.4)

  private[graft] def semanticDedup(
      s: org.apache.spark.sql.SparkSession, d: String,
      tau: Double = 0.4): org.apache.spark.sql.DataFrame = {
    val clusters = mutualLabels(s, d, tau)
      .withColumnRenamed("vec_id", "doc_id")
    val labeled = Tables.table(s, d, "documents")
      .select("doc_id", "source", "text")
      .join(clusters, Seq("doc_id"), "left")
    val kept = coalesce(col("cluster") === col("doc_id"), lit(true))
    labeled.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        count(col("cluster")).as("n_embedded"),
        sum(when(kept, 0L).otherwise(1L)).as("n_dropped"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(when(kept, length(col("text")).cast(LongType)).otherwise(0L))
          .as("kept_chars"))
      .orderBy("source")
  }

  /** DuckDB twin of [[semanticDedup]]: the cluster chain + the doc
    * join and per-source audit. */
  private def duckSemanticDedup(nprobe: Int, rounds: Int, workK: Int,
      cap: Int, tau: Double): String =
    s"""${duckMutualClustersCtes(nprobe, rounds, workK, cap, tau)},
       |docs AS (
       |  SELECT d.doc_id, d.source, d.text, l.cluster
       |  FROM documents d LEFT JOIN lab l ON l.vec_id = d.doc_id
       |)
       |SELECT source,
       |  CAST(count(1) AS BIGINT) AS n_docs,
       |  CAST(count(cluster) AS BIGINT) AS n_embedded,
       |  CAST(sum(CASE WHEN cluster IS NOT NULL AND cluster <> doc_id
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(sum(CASE WHEN cluster IS NULL OR cluster = doc_id
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN cluster IS NULL OR cluster = doc_id
       |    THEN length(text) ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM docs GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of the ADAPTIVE [[knnJoin]] key: the stride, the
    * strided center pick (cell = id-rank among centers, matching the
    * collected array's position) and the scoring all recompute from
    * the corpus itself — no literals, so the same SQL is exact at
    * every scale factor. */
  private def duckKnnJoinAdaptive(nprobe: Int, k: Int): String =
    duckKnnJoinStrided(
      "SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS stride FROM n",
      nprobe, k)

  private def duckKnnJoinStrided(stCte: String, nprobe: Int,
      k: Int): String =
    s"""${duckKnnJoinCtes(stCte, nprobe)}
       |SELECT qid, rank, cid, cosine FROM ranked
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** The strided-quantizer join chain up through `ranked` (qid, cid,
    * cosine, rank) — shared by the adaptive key's final SELECT and the
    * refine twin's g0 so the two oracles can never drift. */
  private def duckKnnJoinCtes(stCte: String, nprobe: Int): String =
    s"""$duckVecs, st AS (
       |  $stCte
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
       |    AS cell, v AS cv
       |  FROM n, st WHERE vec_id % stride = 0
       |), dists AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(n.v)),
       |        i -> (n.v[i] - c.cv[i]) * (n.v[i] - c.cv[i]))),
       |      (s0, x) -> s0 + x) AS d
       |  FROM n, cents c
       |), cellranks AS (
       |  SELECT vec_id, v, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk
       |  FROM dists
       |), assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM cellranks WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS qid, v AS qv, nrm AS qn, cell
       |  FROM cellranks WHERE rk <= $nprobe
       |), hcand AS (
       |  -- 'hcand', not 'cand': the curate pipeline splices these chains
       |  -- next to the LSH fragment, whose candidate CTE owns 'cand'
       |  SELECT p.qid, p.qv, p.qn, a.vec_id AS cid, a.v AS cv, a.nrm AS cn
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.qid
       |), scored AS (
       |  SELECT qid, cid,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(generate_series(1, len(qv)),
       |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
       |      / (qn * cn), 6) AS cosine
       |  FROM hcand
       |), ranked AS (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM scored
       |)""".stripMargin

  /** DuckDB twin of [[knnJoin]]: identical cell assignment and scoring
    * from the frozen centroid literals; the salt split is invisible in
    * the result by construction, so the oracle does not model it. */
  private def duckKnnJoin(cents: Array[Array[Double]], nprobe: Int,
      k: Int): String = {
    val values = cents.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(x => "%.17e".format(x)).mkString("[", ", ", "]")})"
    }.mkString(",\n    ")
    s"""$duckVecs, cents(cell, cv) AS (VALUES
       |    $values
       |), dists AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, ${cents.head.length}),
       |        i -> (n.v[i] - c.cv[i]) * (n.v[i] - c.cv[i]))),
       |      (s0, x) -> s0 + x) AS d
       |  FROM n, cents c
       |), cellranks AS (
       |  SELECT vec_id, v, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk
       |  FROM dists
       |), assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM cellranks WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS qid, v AS qv, nrm AS qn, cell
       |  FROM cellranks WHERE rk <= $nprobe
       |), hcand AS (
       |  -- 'hcand', not 'cand': the curate pipeline splices these chains
       |  -- next to the LSH fragment, whose candidate CTE owns 'cand'
       |  SELECT p.qid, p.qv, p.qn, a.vec_id AS cid, a.v AS cv, a.nrm AS cn
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.qid
       |), scored AS (
       |  SELECT qid, cid,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(generate_series(1, len(qv)),
       |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
       |      / (qn * cn), 6) AS cosine
       |  FROM hcand
       |), ranked AS (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, cid, cosine FROM ranked
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB twin of [[ivfTopK]] over the same frozen centroid literals:
    * identical sequential folds (list_reduce over a prepended zero), the
    * same (distance, cell) ranking, probe width and top-k tail. */
  private def duckIvf(cents: Array[Array[Double]], nprobe: Int = 3): String = {
    val values = cents.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(x => "%.17e".format(x)).mkString("[", ", ", "]")})"
    }.mkString(",\n    ")
    s"""$duckVecs, cents(cell, cv) AS (VALUES
       |    $values
       |), dists AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, ${cents.head.length}),
       |        i -> (n.v[i] - c.cv[i]) * (n.v[i] - c.cv[i]))),
       |      (s0, x) -> s0 + x) AS d
       |  FROM n, cents c
       |), cellranks AS (
       |  SELECT vec_id, v, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk
       |  FROM dists
       |), assigned AS (
       |  SELECT vec_id, v, nrm, cell FROM cellranks WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS qid, v AS qv, nrm AS qn, cell
       |  FROM cellranks WHERE vec_id < 5 AND rk <= $nprobe
       |), hcand AS (
       |  -- 'hcand', not 'cand': the curate pipeline splices these chains
       |  -- next to the LSH fragment, whose candidate CTE owns 'cand'
       |  SELECT p.qid, p.qv, p.qn, a.vec_id AS cid, a.v AS cv, a.nrm AS cn
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> p.qid
       |), scored AS (
       |  SELECT qid, cid,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(generate_series(1, len(qv)),
       |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
       |      / (qn * cn), 6) AS cosine
       |  FROM hcand
       |), ranked AS (
       |  SELECT qid, cid, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, cid, cosine FROM ranked
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** Squared-L2 distance from row vector `v` to the fold variable `c`'s
    * `centroid` field — the ONE exactness-critical fragment both the
    * nearest-centroid assignment (`q_embedding_assign`) and k-means
    * E-steps share: sequential zip_with/aggregate fold so both engines
    * add in the same index order. */
  private[ops] val dist2ToCent = "aggregate(zip_with(v, c.centroid, " +
    "(x, m) -> (x - m) * (x - m)), 0D, (a, y) -> a + y)"

  /** Argmin fold over the 1-row broadcast `cents` array-of-structs:
    * keeps the struct with the smallest [[dist2ToCent]]; strict `<`
    * breaks dist² ties toward the EARLIER (lower-`idField`) entry of
    * the sorted array — the contract every DuckDB twin replays with
    * `row_number() OVER (ORDER BY dist2, id)`. */
  private[ops] def argminFold(idField: String): String =
    "aggregate(cents, " +
      s"named_struct('d', CAST('Infinity' AS DOUBLE), " +
      s"'$idField', CAST(-1 AS BIGINT)), " +
      s"(acc, c) -> CASE WHEN $dist2ToCent < acc.d THEN " +
      s"named_struct('d', $dist2ToCent, '$idField', c.$idField) ELSE acc END)"

  /** DuckDB twin of [[dist2ToCent]]: `centRef` is the SQL reference to
    * the centroid list (e.g. `centroid` or `c.centroid`). */
  private[ops] def duckDist2(centRef: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, $Dim),
       |        i -> (v[i] - $centRef[i]) * (v[i] - $centRef[i]))),
       |      (a, y) -> a + y)""".stripMargin

  /** Distributed Lloyd's k-means over `embeddings`
    * ([[graft.Graft.kmeansFit]]; oracle key `q_kmeans`): `iters` full
    * E/M rounds, each ONE streaming corpus pass — the K current
    * centroids collapse to a single broadcast array row, a higher-order
    * fold arg-mins per vector (the `q_embedding_assign` shape: zero row
    * inflation, no shuffle on the corpus side), and the M-step re-sums
    * through the mergeable integer-scaled [[graft.functions.VectorSum]]
    * (the `q_embedding_centroids` shape: partial+final agg, one
    * dim-length buffer per (executor, cluster)). Only the k-row
    * centroid STATE round-trips the driver between rounds (k·(Dim+2)
    * values — the MLlib iteration shape); the corpus never does, and
    * materializing the state per round keeps the logical plan
    * CONSTANT-SIZE in `iters` (chaining frames instead doubles the
    * plan every round — unusable past ~15 iterations). Each round
    * re-scans the source; a production caller iterating many rounds
    * caches the projected corpus first. This is the at-scale
    * REFINEMENT path beyond [[fitCentroids]]' bounded-sample fit:
    * iters × (broadcast K·Dim + one corpus pass + a K-row agg).
    *
    * Determinism contract (what lets DuckDB replay it bit-for-bit):
    * init = the `k` lowest-`vec_id` vectors rounded to 6; every M-step
    * mean goes through exact integer sums (floor(x·1e7)) then
    * `round(·/1e7/n, 6)`, so each iteration's centroids are identical
    * doubles in both engines and the E-step folds them in the same
    * cluster-id order with identical IEEE ops (dist² ties break toward
    * the lower cluster id on both sides). An emptied cluster keeps its
    * previous center (standard Lloyd's), n = 0. */
  private[graft] def kmeansCentroids(
      s: SparkSession, d: String, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1; got ($k, $iters)")
    import s.implicits._
    val vsum = graft.functions.VectorSum.udaf(Dim)
    // registry-cached: every E/M round reads this projection, so without
    // the persist each of the iters+1 jobs would re-run the parquet scan
    val corpus = graft.CacheRegistry.getOrPersist("kmeans_corpus", d,
      Tables.table(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          expr("transform(embedding, " +
            "x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("sv")))
    // bounded k-row collect: the deterministic init
    var cents: Seq[(Long, Long, Seq[Double])] = corpus.orderBy("vec_id")
      .limit(k)
      .select(col("vec_id"), expr("transform(v, x -> round(x, 6))").as("c"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i.toLong, 0L, r.getSeq[Double](1)) }.toSeq
    for (_ <- 1 to iters) {
      val centsRow = cents.map { case (cid, _, c) => (cid, c) }
        .toDF("cid", "centroid")
        .agg(array_sort(collect_list(struct(col("cid"), col("centroid"))))
          .as("cents"))
      val assigned = corpus.join(broadcast(centsRow))
        .withColumn("best", expr(argminFold("cid")))
        .select(col("best.cid").as("cid"), col("sv"))
      // bounded k-row collect: the new per-cluster state
      val next = assigned.groupBy("cid")
        .agg(vsum(col("sv")).as("sums"), count(lit(1)).as("n"))
        .select(col("cid"), col("n"),
          expr("transform(sums, x -> round(CAST(x AS DOUBLE) / 1e7 / n, 6))")
            .as("centroid"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
      cents = cents.map { case (cid, _, prev) =>
        next.get(cid) match {
          case Some((n, c)) => (cid, n, c)
          case None => (cid, 0L, prev) // emptied cluster keeps its center
        }
      }
    }
    cents.toDF("cluster_id", "n", "centroid")
  }

  /** DuckDB replay of [[kmeansCentroids]]: the same init, the same
    * per-iteration assign (row_number by (dist², cid)) and integer-sum
    * M-step, chained as CTEs `c0 → c1 → … → c$iters`. */
  private[graft] def duckKmeans(k: Int, iters: Int): String = {
    val iterCtes = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (
         |  SELECT vec_id, sv, cid FROM (
         |    SELECT vv.vec_id, vv.sv, c.cid,
         |      row_number() OVER (PARTITION BY vv.vec_id
         |        ORDER BY ${duckDist2("c.centroid")}, c.cid) AS rn
         |    FROM vv, $prev c)
         |  WHERE rn = 1
         |), el$it AS (
         |  SELECT cid, i, sv[i] AS x
         |  FROM a$it, UNNEST(generate_series(1, $Dim)) AS u(i)
         |), g$it AS (
         |  SELECT cid, n, list(round(CAST(sx AS DOUBLE) / 1e7 / n, 6)
         |      ORDER BY i) AS centroid
         |  FROM (SELECT cid, i, sum(x) AS sx, count(1) AS n
         |        FROM el$it GROUP BY 1, 2)
         |  GROUP BY cid, n
         |), c$it AS (
         |  SELECT p.cid, CAST(coalesce(g.n, 0) AS BIGINT) AS n,
         |    coalesce(g.centroid, p.centroid) AS centroid
         |  FROM $prev p LEFT JOIN g$it g USING (cid)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH vv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS sv
       |  FROM embeddings
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |    list_transform(v, x -> round(x, 6)) AS centroid
       |  FROM (SELECT vec_id, v FROM vv ORDER BY vec_id LIMIT $k)
       |),
       |$iterCtes
       |SELECT cid AS cluster_id, n, CAST(u.i - 1 AS BIGINT) AS i,
       |  centroid[u.i] AS x
       |FROM c$iters, UNNEST(generate_series(1, $Dim)) AS u(i)
       |ORDER BY cluster_id, i""".stripMargin
  }

  /** (label, n, centroid) — the per-label mean vectors behind
    * `q_embedding_centroids` and the nearest-centroid assignment
    * (`q_embedding_assign`); see the centroids QueryDef for the
    * exactness/scale argument. Centroid elements are rounded to 6
    * digits, which is the form BOTH consumers and both engines share. */
  private def labelCentroids(s: SparkSession, d: String): DataFrame = {
    val vsum = graft.functions.VectorSum.udaf(Dim)
    Tables.table(s, d, "embeddings")
      .select(col("label").cast(LongType).as("label"),
        expr("transform(embedding, " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("sv"))
      .groupBy("label")
      .agg(vsum(col("sv")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("n"),
        expr("transform(s, x -> round(CAST(x AS DOUBLE) / 1e7 / n, 6))")
          .as("centroid"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------- brute-force cosine top-k
    QueryDef("q_similarity_topk",
      (s, d) => {
        // norms precomputed once per vector in [[vecs]]; the n×q pair loop
        // is then the codegen'd dot fold + a division, bit-identical to
        // the dot/(nrm·nrm) the oracle runs
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
        topK(c.join(broadcast(q), col("cid") =!= col("qid")))
      },
      Some(s"""$duckVecs, scored AS (
              |  SELECT q.vec_id AS qid, c.vec_id AS cid,
              |    round($duckDot / (q.nrm * c.nrm), 6) AS cosine
              |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
              |), ranked AS (
              |  SELECT qid, cid, cosine,
              |    CAST(row_number() OVER (PARTITION BY qid
              |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
              |  FROM scored
              |)
              |SELECT qid, rank, cid, cosine FROM ranked
              |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // ---------------------------------------- LSH-bucketed ANN top-k
    // same query set, but candidates are vectors sharing ≥1 hyperplane
    // band with the query — the recall/cost dial is (Planes, BandBits)
    QueryDef("q_similarity_lsh",
      (s, d) => {
        graft.functions.LshBands.register(s, planeMatrix, BandBits)
        val base = vecs(s, d)
        // candidate generation carries ONLY ids through the band join and
        // the dedup — 16 bytes/pair in the distinct's shuffle instead of
        // the two 64-double payloads (the 100 TB shape); the query band
        // set is tiny so the band join is broadcast: the banded corpus
        // streams through unshuffled. Banding is the codegen'd
        // [[graft.functions.LshBands]] (16 plane folds per row ran
        // interpreted as HOF lambdas before — the key's dominant cost).
        val banded = base.withColumn("band", explode(expr("lsh_bands(v)")))
          .select("vec_id", "band")
        val qb = banded.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("band"))
        val ids = banded.select(col("vec_id").as("cid"), col("band"))
          .join(broadcast(qb), Seq("band"))
          .filter(col("cid") =!= col("qid"))
          .select("qid", "cid").distinct()
        // re-attach vectors AFTER dedup: deduped pairs + query vectors are
        // both small → broadcast, so the corpus side again streams once
        val qv = base.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val pairs = ids.join(broadcast(qv), Seq("qid"))
        topK(base.select(col("vec_id").as("cid"), col("v").as("cv"),
            col("nrm").as("cn"))
          .join(broadcast(pairs), Seq("cid"))
          .select("qid", "qv", "qn", "cid", "cv", "cn"))
      },
      Some {
        val duckBands = bandExprs(i => s"sig[$i]").mkString("[", ", ", "]")
        s"""$duckVecs, sigs AS (
           |  SELECT vec_id, v, nrm, $sigDuck AS sig FROM n
           |), banded AS (
           |  SELECT vec_id, v, nrm, unnest($duckBands) AS band FROM sigs
           |), cand AS (
           |  SELECT DISTINCT q.vec_id AS qid, q.v AS qv, q.nrm AS qn,
           |    c.vec_id AS cid, c.v AS cv, c.nrm AS cn
           |  FROM banded q JOIN banded c USING (band)
           |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
           |), scored AS (
           |  SELECT qid, cid,
           |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list_transform(generate_series(1, len(qv)),
           |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
           |      / (qn * cn), 6) AS cosine
           |  FROM cand
           |), ranked AS (
           |  SELECT qid, cid, cosine,
           |    CAST(row_number() OVER (PARTITION BY qid
           |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
           |  FROM scored
           |)
           |SELECT qid, rank, cid, cosine FROM ranked
           |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
      }),

    // ---------------------------------------- IVF-bucketed ANN top-k
    // the third search path: coarse quantization, candidates drawn from
    // each query's nprobe nearest cells. This key runs [[ivfTopK]] against
    // the FROZEN quantizer ([[IvfCentroids]], fitted once by
    // tools.FreezeIvf with the same Lloyd's the trained API uses) so the
    // DuckDB oracle replays assignment + probe + top-k EXACTLY from the
    // same literals; the sample-trained production path ([[ivfTopKTrained]])
    // is exercised by VectorSpec (shape, recall, single-pass fit).
    // nprobe=4 (of 8 cells): the synthetic embeddings are near-uniform, so
    // the coarse quantizer needs a wider probe to clear recall ≥0.5 at
    // every SF (measured 0.56/0.72/0.76 at sf0.001/0.01/0.1; nprobe=3 was
    // 0.36 at sf0.001)
    QueryDef("q_similarity_ivf",
      (s, d) => ivfTopK(s, d, IvfCentroids.values, nprobe = 4),
      Some(duckIvf(IvfCentroids.values, nprobe = 4))),

    // ---------------------------------------------- all-queries kNN join
    // the kNN-GRAPH builder: top-3 neighbors for EVERY vector through the
    // cell-keyed shuffle join — no query broadcast, no MaxQueryBatch
    // bound; hot cells rebalance by replicate-salting (pair set provably
    // unchanged — see [[knnJoin]]). nprobe=2 keeps candidate volume
    // ~2 cells/query while recovering cross-boundary neighbors.
    QueryDef("q_similarity_knn_join",
      (s, d) => knnJoin(s, d, IvfCentroids.values, nprobe = 2, k = 3),
      Some(duckKnnJoin(IvfCentroids.values, nprobe = 2, k = 3))),

    // ------------------------------- scale-ADAPTIVE all-queries kNN join
    // the production default ([[graft.Graft.knnJoin]] with no explicit
    // centroids): cells ∝ √corpus via the strided data-point quantizer
    // ([[adaptiveCenters]]), so pair work is n^1.5 by construction
    // instead of the frozen key's n²/16 — the round-14 verdict's one
    // scale-killer, closed. Same knnJoin machinery (one persisted
    // ivf_cells pass, cellCap replicate-salting); the frozen-cell key
    // above stays as the engine-exact fixed-quantizer twin. The oracle
    // recomputes stride + centers FROM THE CORPUS, so one SQL string is
    // exact at every scale factor.
    QueryDef("q_similarity_knn_join_adaptive",
      (s, d) => knnJoin(s, d, adaptiveCenters(s, d), nprobe = 2, k = 3),
      Some(duckKnnJoinAdaptive(nprobe = 2, k = 3))),

    // -------------------------------- NN-Descent kNN-graph refinement
    // the recall answer to the adaptive key's published 0.217 recall@3:
    // four neighbor-of-my-neighbor rounds over a workK=20 working graph
    // lift recall@3 to 0.946 at sf0.1 (RecallProbe) for n·cap²·dim
    // EXTRA work per round — linear, so the init's n^1.5 still
    // dominates at scale. Adjacency capping is the paper's ρ-sampling
    // made deterministic (cosine DESC, cid), which is what lets the
    // DuckDB twin unroll the same four rounds bit-for-bit. See
    // [[knnRefine]].
    QueryDef("q_similarity_knn_refine",
      (s, d) => knnRefine(s, d, rounds = 4, k = 3, workK = 20, cap = 40),
      Some(duckKnnRefine(nprobe = 2, k = 3, rounds = 4, workK = 20,
        cap = 40))),

    // -------------------------------- HIERARCHICAL (two-level) kNN join
    // the sub-n^1.5 rung the fixed-cell-size rejection note recorded:
    // n^(2/3) fine cells routed through n^(1/3) coarse centers make
    // assignment AND pair scoring both Θ(n^(4/3)) — the balanced
    // two-level optimum. Recall at nprobe=2 drops with the scanned
    // fraction (published by RecallProbe); the refine twin below buys
    // it back at linear cost. See [[knnJoinHier]]/[[hierCenters]].
    QueryDef("q_similarity_knn_join_hier",
      (s, d) => knnJoinHier(s, d, nprobe = 2, k = 3),
      Some(duckKnnJoinHier(nprobe = 2, k = 3))),

    // ------------------------- NN-Descent refine over the n^(4/3) init
    // the flagship composition: hierarchical init + 4 NN-Descent rounds
    // = a high-recall kNN graph in Θ(n^(4/3)) total — the family's
    // cheapest high-recall configuration at scale. Same rounds/working
    // width as q_similarity_knn_refine, only the init differs.
    QueryDef("q_similarity_knn_refine_hier",
      (s, d) => knnRefineHier(s, d, rounds = 4, k = 3, workK = 20,
        cap = 40),
      Some(duckKnnRefineHier(nprobe = 2, k = 3, rounds = 4, workK = 20,
        cap = 40))),

    // ------------------------------------ mutual-kNN embedding clusters
    // the SemDeDup-shaped grouping: refine graph → mutual top-3 edges at
    // cosine ≥ 0.4 (857 of 2000·3 directed edges survive at sf0.1 — the
    // threshold discriminates) → connected components → every vector
    // labeled (cluster = component min id, cluster_size); at the 10×
    // replica the clone groups the warehouse builds by construction come
    // back as clusters. See [[mutualKnnClusters]].
    QueryDef("q_embedding_cluster_mutual",
      (s, d) => mutualKnnClusters(s, d, tau = 0.4),
      Some(duckMutualClusters(nprobe = 2, rounds = 4, workK = 20,
        cap = 40, tau = 0.4))),

    // ------------------------------------- SemDeDup over the documents
    // the end-to-end semantic-dedup pipeline on the table a training
    // job reads: embedded docs keep only their cluster's min-id member,
    // un-embedded docs pass through (no semantic signal — the standard
    // pipeline exact/minhash-dedups those), output is the per-source
    // curation audit a mixture re-weighting step consumes. One
    // label-sized join + one hash agg on top of the n^(4/3) graph.
    QueryDef("q_select_semdedup",
      (s, d) => semanticDedup(s, d, tau = 0.4),
      Some(duckSemanticDedup(nprobe = 2, rounds = 4, workK = 20,
        cap = 40, tau = 0.4))),


    // ---------------------------------------- int8 scalar quantization
    // per-vector min/max scalar quantization to int8 codes — the standard
    // 4× storage/bandwidth shrink for a 100 TB vector corpus (codes ship
    // through shuffles, full floats stay in cold storage). Per-row map
    // over one scan, zero shuffle. Output is engine-exact: integer code
    // checksum + floor-scaled max reconstruction error (identical double
    // arithmetic both sides; a constant vector gets scale 0 → all codes
    // 0, error 0 by the same CASE in both engines).
    QueryDef("q_embedding_quantize",
      (s, d) => graft.CacheRegistry.getOrPersist("quant_vecs", d, quantizedVecs(s, d))
        .select(col("vec_id"),
          col("csum").as("code_sum"),
          floor(expr(
            "aggregate(zip_with(v, codes, (x, c) -> abs(x - (mn + c * sc))), " +
              "0D, (a, y) -> greatest(a, y))") * 1e6)
            .cast(LongType).as("max_err_e6"))
        .orderBy("vec_id"),
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings
             |), p AS (
             |  SELECT vec_id, v, list_min(v) AS mn,
             |    (list_max(v) - list_min(v)) / 255.0 AS sc
             |  FROM e
             |), q AS (
             |  SELECT vec_id, v, mn, sc,
             |    list_transform(v, x -> CASE WHEN sc = 0 THEN 0
             |      ELSE CAST(floor((x - mn) / sc + 0.5) AS BIGINT) END) AS codes
             |  FROM p
             |)
             |SELECT vec_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
             |    (a, b) -> a + b) AS code_sum,
             |  CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(generate_series(1, len(v)),
             |        i -> abs(v[i] - (mn + codes[i] * sc)))),
             |      (a, y) -> greatest(a, y)) * 1000000.0) AS BIGINT) AS max_err_e6
             |FROM q ORDER BY vec_id""".stripMargin)),

    // ------------------------------- signed random projection (JL lemma)
    // dimensionality reduction 64 → 8 before ANN / clustering: proj_j =
    // Σ_i vec[i]·sign(j,i) with a DETERMINISTIC ±1 matrix (md5-derived at
    // plan-build time, embedded as literals in BOTH engines' plans — the
    // same shared-constant scheme as the minhash A/B coefficients).
    // Row-local, zero shuffle, embarrassingly parallel: at 100 TB this is
    // a map over the scan producing 8 longs from 64 floats (8× narrower
    // than even the int8 codes for distance work that tolerates JL
    // distortion). Elements are floor(x·1e6) longs first, so the signed
    // sums are exact integer arithmetic — order-independent, no
    // cross-engine rounding caveat anywhere in this key.
    QueryDef("q_embedding_project",
      (s, d) => randomProjection(Tables.table(s, d, "embeddings"),
        "embedding", Seq("vec_id"), RpK, Dim).orderBy("vec_id"),
      Some {
        val projSelects = (0 until RpK).map { j =>
          val signs = (0 until Dim).map(i => rpSign(j, i)).mkString("[", ", ", "]")
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(generate_series(1, $Dim),
             |      i -> e6[i] * ($signs)[i])), (a, b) -> a + b) AS proj_$j""".stripMargin
        }.mkString(",\n  ")
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x ->
           |    CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS e6
           |  FROM embeddings
           |)
           |SELECT vec_id,
           |  $projSelects
           |FROM e ORDER BY vec_id""".stripMargin
      }),

    // ---------------------------------------- per-label centroids
    // the class-prototype / k-means-E-step primitive: mean vector per
    // label in ONE corpus pass through the mergeable
    // [[graft.functions.VectorSum]] aggregator. Elements are
    // integer-scaled first (floor(x·1e7) longs) so the sum is exact and
    // order-independent — a double sum would wobble in the low bits with
    // partition order and break the cross-engine hash — and the
    // aggregator's merge is associative+commutative, so the plan is a
    // partial+final ObjectHashAggregate: each executor ships ONE
    // Dim-length long array per label to the shuffle regardless of group
    // size. The built-in alternative (posexplode → groupBy(label, pos))
    // would inflate the corpus ×Dim rows BEFORE its shuffle; the oracle
    // replays exactly that naive expansion and hash-matches. Averages
    // leave integer space only at the very end: identical double ops on
    // both engines up to the final round(·,6). That last rounding is the
    // same residual cross-engine risk every rounded-double key in this
    // repo carries (Spark rounds the exact decimal HALF_UP, DuckDB
    // rounds via double arithmetic): no double sits exactly ON a tie
    // (k.5·10⁻⁷ is never dyadic), but a value whose true product with
    // 1e6 falls within half an ulp of one could in principle round
    // differently. Accepted as data-dependent and vanishingly rare, not
    // proven impossible — don't cite this key as a determinism proof.
    // Output convention: the centroid is emitted ELEMENT-WISE as
    // (label, n, i, x) rows, not as a raw array column — the driver's
    // canonical row sort hashes scalars only (raw arrays are unhashable
    // in its pandas path; same convention as q_dsv2_array's digest).
    // Element rows are also the STRICTER check: every coordinate is
    // individually hash-compared instead of riding one opaque cell.
    // Output stays bounded: |labels|·Dim rows.
    QueryDef("q_embedding_centroids",
      (s, d) => labelCentroids(s, d)
        .select(col("label"), col("n"),
          posexplode(col("centroid")).as(Seq("i", "x")))
        .select(col("label"), col("n"), col("i").cast(LongType).as("i"),
          col("x"))
        .orderBy("label", "i"),
      Some(s"""WITH sv AS (
              |  SELECT label,
              |    list_transform(embedding,
              |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS v
              |  FROM embeddings
              |), el AS (
              |  SELECT label, i, v[i] AS x
              |  FROM sv, UNNEST(generate_series(1, $Dim)) AS u(i)
              |), agg AS (
              |  SELECT label, i, sum(x) AS sx, count(1) AS n
              |  FROM el GROUP BY 1, 2
              |)
              |SELECT CAST(label AS BIGINT) AS label, n,
              |  CAST(i - 1 AS BIGINT) AS i,
              |  round(CAST(sx AS DOUBLE) / 1e7 / n, 6) AS x
              |FROM agg ORDER BY label, i""".stripMargin)),

    // ---------------------------------------- nearest-centroid assign
    // the k-means E-step / classifier-by-prototype, composing with
    // [[labelCentroids]]: every vector is assigned the label of its
    // nearest (squared-L2) centroid. Zero row inflation: the K
    // centroids collapse into ONE sorted array-of-structs row that is
    // BROADCAST to the corpus scan, and a higher-order `aggregate` fold
    // arg-mins over it per row — the corpus neither shuffles nor
    // multiplies ×K, so at 100 TB the cost is exactly one streaming
    // pass (vs the join-then-groupBy form, which inflates ×K before
    // re-aggregating every row back down). Cross-engine exactness:
    // both engines fold the SAME rounded-6 centroid doubles in the
    // SAME array order with identical IEEE ops; ties on raw dist²
    // break toward the lower label on both sides (the fold keeps the
    // earlier entry of the label-sorted array; the oracle ranks by
    // (dist2, label)). Output dist² is rounded for display only —
    // the comparison uses the raw double.
    QueryDef("q_embedding_assign",
      (s, d) => {
        val cents = labelCentroids(s, d)
          .agg(array_sort(collect_list(struct(col("label"), col("centroid"))))
            .as("cents"))
        Tables.table(s, d, "embeddings")
          .select(col("vec_id"), col("label").cast(LongType).as("true_label"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .join(broadcast(cents))
          .withColumn("best", expr(argminFold("label")))
          .select(col("vec_id"), col("best.label").as("assigned"),
            col("true_label"), round(col("best.d"), 6).as("dist2"))
          .orderBy("vec_id")
      },
      Some(s"""WITH sv AS (
              |  SELECT label,
              |    list_transform(embedding,
              |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS v
              |  FROM embeddings
              |), el AS (
              |  SELECT label, i, v[i] AS x
              |  FROM sv, UNNEST(generate_series(1, $Dim)) AS u(i)
              |), agg AS (
              |  SELECT label, i, sum(x) AS sx, count(1) AS n
              |  FROM el GROUP BY 1, 2
              |), cent AS (
              |  SELECT CAST(label AS BIGINT) AS clabel,
              |    list(round(CAST(sx AS DOUBLE) / 1e7 / n, 6) ORDER BY i)
              |      AS centroid
              |  FROM agg GROUP BY label
              |), vv AS (
              |  SELECT vec_id, CAST(label AS BIGINT) AS true_label,
              |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings
              |), d2 AS (
              |  SELECT vec_id, true_label, clabel,
              |    ${duckDist2("centroid")} AS dist2
              |  FROM vv, cent
              |)
              |SELECT vec_id, clabel AS assigned, true_label,
              |  round(dist2, 6) AS dist2
              |FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |    ORDER BY dist2, clabel) AS rn
              |  FROM d2)
              |WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // ---------------------------------------- distributed k-means
    // full Lloyd's over the corpus — E-step and M-step both
    // distributed, chained for 2 rounds from a deterministic init (the
    // 4 lowest-vec_id vectors): per round one K·Dim broadcast, one
    // streaming argmin pass (no corpus shuffle, no ×K inflation), one
    // mergeable integer-scaled VectorSum agg. The at-scale REFINEMENT
    // path beyond the bounded-sample driver fit behind q_similarity_ivf
    // — see [[kmeansCentroids]] for the exactness contract that lets
    // DuckDB replay both rounds bit-for-bit.
    // Same element-wise output convention as q_embedding_centroids:
    // (cluster_id, n, i, x) rows — k·Dim rows total, driver-sortable.
    QueryDef("q_kmeans",
      (s, d) => kmeansCentroids(s, d, k = 4, iters = 2)
        .select(col("cluster_id"), col("n"),
          posexplode(col("centroid")).as(Seq("i", "x")))
        .select(col("cluster_id"), col("n"),
          col("i").cast(LongType).as("i"), col("x"))
        .orderBy("cluster_id", "i"),
      Some(duckKmeans(k = 4, iters = 2))),

    // ---------------------------------------- quantized two-stage ANN
    // the search path that CONSUMES the int8 codes (closing the
    // bandwidth claim q_embedding_quantize's storage shrink opens):
    // stage 1 scores every candidate with the affine-reconstructed code
    // dot — Σ(qmn+qcᵢ·qsc)(cmn+ccᵢ·csc) expanded to one exact integer
    // code dot plus three scalar cross-terms — so only CODES (8× narrower
    // than the f64 vectors) plus four per-vector scalars ride the
    // candidate stage; stage 2 reranks the top-Rerank survivors per query
    // with the exact cosine, re-attaching full vectors to survivor rows
    // only (survivor list broadcast; the corpus streams, never shuffles).
    // The approximate scores are engine-exact: the integer code dot is
    // exact (the codegen'd code_dot over the packed byte cells sums
    // products ≤255² in a long, equal to DuckDB's BIGINT fold), and the
    // scalar correction uses the identical expression text both sides.
    QueryDef("q_similarity_quantized",
      (s, d) => quantizedTopK(s, d),
      Some(s"""$duckVecs, p AS (
              |  SELECT vec_id, v, nrm, list_min(v) AS mn,
              |    (list_max(v) - list_min(v)) / 255.0 AS sc
              |  FROM n
              |), q8 AS (
              |  SELECT vec_id, v, nrm, mn, sc,
              |    list_transform(v, x -> CASE WHEN sc = 0 THEN 0
              |      ELSE CAST(floor((x - mn) / sc + 0.5) AS BIGINT) END) AS codes
              |  FROM p
              |), qs AS (
              |  SELECT vec_id, v, nrm, mn, sc, codes,
              |    list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
              |      (a, b) -> a + b) AS csum
              |  FROM q8
              |), cand AS (
              |  SELECT q.vec_id AS qid, c.vec_id AS cid,
              |    q.v AS qv, q.nrm AS qn, c.v AS cv, c.nrm AS cn,
              |    q.mn AS qmn, q.sc AS qsc, q.csum AS qsum,
              |    c.mn AS cmn, c.sc AS csc, c.csum AS ccsum,
              |    list_reduce(list_prepend(CAST(0 AS BIGINT),
              |      list_transform(generate_series(1, $Dim),
              |        i -> q.codes[i] * c.codes[i])), (a, b) -> a + b) AS idot
              |  FROM qs q JOIN qs c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
              |), approx AS (
              |  SELECT qid, cid, qv, qn, cv, cn,
              |    round(($Dim * qmn * cmn + qmn * csc * ccsum + cmn * qsc * qsum
              |      + qsc * csc * idot) / (qn * cn), 6) AS approx_cos
              |  FROM cand
              |), survivors AS (
              |  SELECT qid, cid, qv, qn, cv, cn, approx_cos,
              |    row_number() OVER (PARTITION BY qid
              |      ORDER BY approx_cos DESC, cid) AS rk
              |  FROM approx
              |), exact AS (
              |  SELECT qid, cid, approx_cos,
              |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              |        list_transform(generate_series(1, len(qv)),
              |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
              |      / (qn * cn), 6) AS cosine
              |  FROM survivors WHERE rk <= $Rerank
              |), ranked AS (
              |  SELECT qid, cid, cosine, approx_cos,
              |    CAST(row_number() OVER (PARTITION BY qid
              |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
              |  FROM exact
              |)
              |SELECT qid, rank, cid, cosine, approx_cos FROM ranked
              |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // --------------------------- two-stage search over JL projections
    // stage 1 ranks by the EXACT integer dot of the 8-long random
    // projections (the narrowest candidate-stage payload in the family:
    // 8 longs vs 64 doubles); stage 2 exact-cosine reranks the top-20
    // survivors per query. The oracle replays the projection sums, the
    // integer stage-1 scores, both deterministic tiebreaks, and the
    // final rounding — every intermediate is either exact integer math
    // or an identically-written double expression.
    QueryDef("q_similarity_projected",
      (s, d) => projectedTopK(s, d),
      Some {
        val projSelects = (0 until RpSearchK).map { j =>
          val signs = (0 until Dim).map(i => rpSign(j, i)).mkString("[", ", ", "]")
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, $Dim),
             |        i -> e6[i] * ($signs)[i])), (a, b) -> a + b) AS p$j""".stripMargin
        }.mkString(",\n    ")
        val pdot = (0 until RpSearchK).map(j => s"q.p$j * c.p$j").mkString(" + ")
        s"""$duckVecs, e6t AS (
           |  SELECT vec_id, v, nrm, list_transform(v, x ->
           |    CAST(floor(x * 1000000.0) AS BIGINT)) AS e6
           |  FROM n
           |), pr AS (
           |  SELECT vec_id, v, nrm,
           |    $projSelects
           |  FROM e6t
           |), cand AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    q.v AS qv, q.nrm AS qn, c.v AS cv, c.nrm AS cn,
           |    $pdot AS pdot
           |  FROM pr q JOIN pr c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
           |), survivors AS (
           |  SELECT qid, cid, qv, qn, cv, cn, pdot,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY pdot DESC, cid) AS rk
           |  FROM cand
           |), exact AS (
           |  SELECT qid, cid, pdot,
           |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list_transform(generate_series(1, len(qv)),
           |          i -> qv[i] * cv[i])), (s0, x) -> s0 + x)
           |      / (qn * cn), 6) AS cosine
           |  FROM survivors WHERE rk <= $RpRerank
           |), ranked AS (
           |  SELECT qid, cid, cosine, pdot,
           |    CAST(row_number() OVER (PARTITION BY qid
           |      ORDER BY cosine DESC, cid) AS BIGINT) AS rank
           |  FROM exact
           |)
           |SELECT qid, rank, cid, cosine, pdot FROM ranked
           |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
      }),

    // ---------------------------------------- multimodal join
    // text modality ⋈ vector modality on the shared id; ArrayType(Float)
    // is a first-class column — no serialization detour
    QueryDef("q_multimodal_join",
      (s, d) => {
        val e = vecs(s, d)
        Tables.table(s, d, "documents")
          .join(e, col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
            round(col("nrm"), 6).as("embedding_norm"))
          .orderBy("doc_id")
      },
      Some(s"""$duckVecs
              |SELECT doc_id, lang, n_chars, label,
              |  round(nrm, 6) AS embedding_norm
              |FROM documents JOIN n ON doc_id = vec_id
              |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ radius search
    // the range-query twin of q_similarity_topk: ALL corpus vectors
    // within a cosine radius of each query (top-k answers "best k",
    // range answers "everything this similar" — retrieval's filter-by-
    // score mode, and the primitive behind near-dup blocklists with an
    // explicit threshold instead of a rank cut). Same scale shape as
    // topk: the query batch broadcasts, the corpus streams through ONE
    // scan with a codegen'd dot fold per pair, and the threshold filter
    // collapses the output long before any shuffle — per query batch the
    // cost is one corpus pass regardless of result size. The compare
    // runs on the ROUNDED cosine (both engines round identically, so the
    // boundary cannot flake); 0.30 sits at ~p99 of the query-pair cosine
    // distribution on the near-orthogonal fixture vectors (max ≈ 0.40 at
    // sf0.001-0.1; the 10x replica adds exact-copy pairs at 1.0), so the
    // radius admits the genuine upper tail at every scale — VectorSpec
    // pins non-empty, non-everything, and bit-exact vs a driver replay.
    QueryDef("q_similarity_range",
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"))
        val c = e.select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
        c.join(broadcast(q), col("cid") =!= col("qid"))
          .withColumn("cosine",
            round(expr("dot_product(qv, cv)") / (col("qn") * col("cn")), 6))
          .filter(col("cosine") >= 0.30)
          .select("qid", "cid", "cosine")
          .orderBy("qid", "cid")
      },
      Some(s"""$duckVecs, scored AS (
              |  SELECT q.vec_id AS qid, c.vec_id AS cid,
              |    round($duckDot / (q.nrm * c.nrm), 6) AS cosine
              |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
              |)
              |SELECT qid, cid, cosine FROM scored
              |WHERE cosine >= 0.30
              |ORDER BY qid, cid""".stripMargin)),

    // ---------------------------------------- multimodal binary plumbing
    // opaque binary payload + typed metadata: the oracle-checkable half of
    // the binary-column pipeline (lengths + content hash + a
    // deterministic "decoded feature" stub — see ops.Multimodal for the
    // mapPartitions decode plumbing)
    QueryDef("q_multimodal_binary",
      (s, d) => Tables.table(s, d, "documents").select(
          col("doc_id"),
          octet_length(col("text")).cast(LongType).as("payload_bytes"),
          md5(col("text").cast(BinaryType)).as("payload_md5"),
          expr(Text.md5i("text")).as("feature_stub"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
              |  md5(text) AS payload_md5,
              |  ${Text.md5iDuck("text")} AS feature_stub
              |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
