package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.warehouse.Tables

/** Graph analytics over relationship tables — the family the reference's
  * users reach for when the warehouse rows ARE an entity graph (customers
  * trading with suppliers, documents linking to documents). The north-star
  * pipeline analogue is influence/importance scoring of a web-crawl link
  * graph before curation (PageRank-weighted sampling is a standard
  * training-data trick).
  *
  * Everything here is Pregel-as-joins: one iteration = join the rank
  * vector to the edge list on `src` (shuffle bounded by |E|), aggregate
  * contributions on `dst` (map-side combinable). No driver-side graph, no
  * collect — the 100 TB path is exactly these two exchanges per round,
  * and the edge list + out-degrees are built ONCE and registry-cached
  * across iterations (the rank vector is the only thing that changes).
  *
  * Determinism contract (same policy as `q_kmeans`' integer-sum rounds):
  * ranks live in integer micro-units (1.0 ≡ 10^12) and every division is
  * an INTEGER floor division — `rank div deg`, `(85 * Σ) div 100` — so
  * partial-aggregation order cannot wiggle a single bit and DuckDB
  * replays all iterations exactly. Long headroom: Σ shares ≤ total mass
  * ≈ |V|·10^12, ×85 stays < 2^63 for |V| up to ~10^5 at this unit scale;
  * at a real 100 TB graph drop the unit to 10^9 (same code, 1000× more
  * nodes of headroom).
  */
object Graph {

  /** One PageRank power iteration over a prepared (src, dst) + degree
    * table: everyone shares `rank div deg` along out-edges, damping 85%
    * against the 15% uniform restart — all in exact integer micro-units.
    * `hintSmall` wraps the two |V|-sized sides (rank vector, contribution
    * vector) in `broadcast()` on the small-graph path, so an iteration is
    * two broadcast hash joins over the cached edge list and ONE map-side-
    * combined |V| shuffle — the edge list itself never reshuffles. */
  private def iterate(fused: DataFrame, deg: DataFrame, ranks: DataFrame,
      hintSmall: Boolean): DataFrame = {
    def h(df: DataFrame) = if (hintSmall) broadcast(df) else df
    // `fused` carries (src, dst, deg): the degree join is iteration-
    // INVARIANT, so it is paid once at build time, and a round is ONE
    // rank join + one aggregation. The 15% restart base reaches every
    // node (incl. in-edge-less ones) as a zero-share seed row UNIONed
    // under the same aggregation — no join back to a node base.
    fused
      .join(h(ranks.withColumnRenamed("node", "src")), "src")
      .select(col("dst").as("node"), expr("rank div deg").as("share"))
      .unionAll(deg.select(col("src").as("node"), lit(0L).as("share")))
      .groupBy("node").agg(sum("share").as("s"))
      .select(col("node"),
        (lit(150000000000L) + expr("(85 * s) div 100")).as("rank"))
  }

  /** [[iterate]] with the PREVIOUS rank carried through as `__prev` —
    * the converge loops' round. The carry rides the aggregation's
    * union (one extra |V| input with a −1 share/old sentinel), NOT a
    * join of the previous vector into the output:
    * `Dataset.localCheckpoint` INHERITS the source plan's Catalyst
    * statistics, and a prev-JOIN makes each round's size estimate the
    * PRODUCT of two copies of the previous round's — the BigInt
    * `sizeInBytes` doubles its digit count every round and stats
    * computation itself stalls planning around round ~20 (measured:
    * 23 digits → 25M digits by round 22, 10+ s/round in pure
    * BigInteger math). A union ADDS estimates instead, so the carry
    * keeps stats growth linear and 300-round converge runs plan in
    * constant time. Same restart/floor semantics as [[iterate]],
    * round output (node, rank, __prev). */
  private def iterateCarry(fused: DataFrame, deg: DataFrame,
      ranks: DataFrame, hintSmall: Boolean): DataFrame = {
    def h(df: DataFrame) = if (hintSmall) broadcast(df) else df
    fused
      .join(h(ranks.withColumnRenamed("node", "src")), "src")
      .select(col("dst").as("node"), expr("rank div deg").as("share"),
        lit(-1L).as("old"))
      .unionAll(deg.select(col("src").as("node"), lit(0L).as("share"),
        lit(-1L).as("old")))
      .unionAll(ranks.select(col("node"), lit(0L).as("share"),
        col("rank").as("old")))
      .groupBy("node").agg(sum("share").as("s"), max("old").as("old"))
      .select(col("node"),
        (lit(150000000000L) + expr("(85 * s) div 100")).as("rank"),
        col("old").as("__prev"))
  }

  /** Damped PageRank (d = 0.85) on an arbitrary directed edge list, run
    * for a FIXED number of power iterations (fixed-round = deterministic
    * output AND a bounded plan; convergence-tested looping belongs in a
    * driver loop around this, exactly like [[graft.Graft.kmeansFit]]).
    * Returns (node, rank) with rank in integer micro-units (1.0 ≡ 10^12
    * before degree normalization). Edges must already be in the
    * orientation the caller wants mass to flow; pass the symmetrized
    * union for an undirected graph. Every node must have ≥1 out-edge
    * (true by construction for symmetrized graphs — for raw directed
    * graphs add self-loops or the dangling mass is dropped, the
    * documented simplification). */
  /** Rank vectors up to this many nodes ride broadcast joins (≈16 B/node
    * → ~80 MB at the cap, inside a healthy executor's broadcast budget);
    * bigger graphs fall back to shuffle joins + per-round checkpoints. */
  private[graft] val BroadcastMaxNodes = 5000000L

  private[graft] def pageRank(edges: DataFrame, iters: Int,
      degCacheKey: Option[String] = None,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"pageRank runs a fixed unrolled plan per iteration; $iters is " +
        "outside the sane 1..20 range (each iteration adds two exchanges)")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // out-degrees feed the restart seed every round; without a persist
    // each read re-runs the |E| groupBy. The registry key makes the
    // persist shareable with q_graph_degrees.
    def buildDeg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val deg = degCacheKey
      .map(k => graft.CacheRegistry.getOrCheckpoint("graph_out_degrees", k, buildDeg))
      .getOrElse(buildDeg)
    // the degree-annotated edge list (src, dst, deg): built and cached
    // ONCE — the per-round plan joins only the rank vector against it
    def buildFused = und.join(deg, "src")
    val fused = degCacheKey
      .map(k => graft.CacheRegistry.getOrCheckpoint("graph_edges_deg", k, buildFused))
      .getOrElse(buildFused)
    // Size-adaptive execution, the same dispatch pattern as the dedup
    // cluster resolution (driver union-find below a threshold, BSP
    // above). |V| comes from one tiny agg over the (usually cached)
    // degree table and picks between two shapes with IDENTICAL integer
    // semantics (GraphSpec pins their equality):
    //  - small |V|: the rank/contribution vectors ride BROADCAST hash
    //    joins, so an iteration never reshuffles the edge list and the
    //    whole fixed-round loop executes as ONE job of chained broadcast
    //    stages. No checkpoint needed — a retry recomputes at most this
    //    bounded chain over the cached graph, and plan depth is capped
    //    by the iters<=20 guard.
    //  - large |V| (the 100 TB graph): broadcast would OOM, so ranks
    //    flow through shuffle joins against the cached graph, and each
    //    round is materialized + lineage-CUT (localCheckpoint) so round
    //    i+1 starts from |V| concrete rows instead of an i-deep join
    //    tree — the standard Pregel-as-joins hygiene; a production loop
    //    that must survive executor loss would use reliable checkpoint().
    val nV = deg.count()
    val small = nV <= broadcastMaxNodes
    var ranks = deg.select(col("src").as("node"), lit(1000000000000L).as("rank"))
    for (i <- 1 to iters) {
      ranks = iterate(fused, deg, ranks, hintSmall = small)
      if (!small && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Run-to-convergence PageRank — the 100 TB production mode next to
    * the fixed-round oracle mode: iterate [[iterate]] until the integer
    * rank vector reaches its EXACT fixed point (micro-unit ranks make
    * the convergence test exact equality, not an epsilon — once a round
    * changes no node, every later round is the identity, so the result
    * equals any sufficiently long fixed-round run; GraphSpec pins
    * that). Every round is materialized + lineage-cut, so plan depth
    * never grows with the round count and `maxIters` may far exceed
    * the fixed-round 20-cap; the per-round fixed-point probe rides
    * inside that materialization (the previous rank joins on before
    * the checkpoint), so the changed-row test is a narrow filter +
    * limit-1 scan over materialized blocks, not a second |V| join
    * job. Raises if `maxIters` rounds pass without a fixed
    * point — silent non-convergence is not a result. */
  /** One PageRank step applied to a GIVEN rank vector over freshly
    * built graph tables — the test hook that lets GraphSpec verify the
    * converged vector is an exact fixed point (step(conv) == conv).
    * Because the integer map is deterministic and a fixed point is
    * absorbing, that identity is equivalent to equality with every
    * fixed-round run long enough to have converged. */
  private[graft] def pageRankStep(edges: DataFrame,
      ranks: DataFrame): DataFrame = {
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    iterate(und.join(deg, "src"), deg, ranks, hintSmall = true)
  }

  private[graft] def pageRankConverge(edges: DataFrame, maxIters: Int = 50,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(maxIters >= 1 && maxIters <= 500,
      s"maxIters outside the sane 1..500 range: $maxIters")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val fused = und.join(deg, "src").persist()
    val nV = deg.count()
    val small = nV <= broadcastMaxNodes
    var ranks = deg.select(col("src").as("node"),
      lit(1000000000000L).as("rank")).localCheckpoint(true)
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      // the fixed-point probe rides INSIDE the round's materialization:
      // the previous rank is CARRIED through the round's aggregation
      // union ([[iterateCarry]] — NOT joined in afterwards, which
      // would square the checkpoint-inherited Catalyst size estimate
      // every round and stall planning in BigInt stats math by round
      // ~20), so the changed-row test is a narrow filter + limit-1
      // scan over already-materialized blocks instead of its own
      // |V| join job — converge mode costs one full job per round, not
      // two (round-13 verdict item 7)
      val next = iterateCarry(fused, deg, ranks, hintSmall = small)
        .localCheckpoint(true)
      done = next.filter(col("rank") =!= col("__prev")).isEmpty
      ranks = next.select("node", "rank")
      i += 1
    }
    deg.unpersist(); fused.unpersist()
    if (!done) sys.error(
      s"pageRank did not reach its integer fixed point in $maxIters rounds")
    ranks
  }

  /** The customer↔supplier trade graph: an edge for every DISTINCT
    * (customer, supplier) pair that traded, symmetrized. Node ids are
    * namespaced (2·custkey / 2·suppkey + 1) because the synthetic keys
    * overlap numerically. Registry-cached: the graph is rebuilt once per
    * (session, sf dir), not once per iteration or per key. */
  /** ONE directed (customer, supplier) pair aggregation feeding BOTH
    * trade graphs (r16 optimization round: the unweighted and weighted
    * graphs each ran their own orders⋈lineitem scan + pair aggregation;
    * the unweighted distinct IS the weighted groupBy's key set, so the
    * session now pays the fact scan once). Carries the MIN line price
    * in exact integer cents — the weight [[sssp]] consumes. */
  private def tradePairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrCheckpoint("graph_trade_pairs", d, {
      Tables.table(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(Tables.table(s, d, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_extendedprice"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("w"))
    })

  private def tradeGraph(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrCheckpoint("graph_trade_edges", d, {
      val e = tradePairs(s, d).select("src", "dst")
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    })

  /** The weighted twin of [[tradeGraph]]: each (customer, supplier)
    * edge carries the MIN line price in exact integer cents over the
    * pair's trades — the "cheapest route" cost surface for [[sssp]].
    * Registry-cached like every graph artifact. */
  private def tradeGraphWeighted(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrCheckpoint("graph_trade_edges_w", d, {
      val e = tradePairs(s, d)
      e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    })

  private def nodeType: Column =
    when(col("node") % 2 === 0, "customer").otherwise("supplier")

  /** The 3-round seed-biased PPR vector over the trade graph —
    * registry-shared (r16 optimization round): `q_graph_ppr` AND
    * `q_sample_importance` consume the identical (graph, seeds, 3
    * rounds) vector, and each previously re-ran all three power
    * iterations; now the second consumer reads |V| materialized rows. */
  private def tradePpr3(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrCheckpoint("graph_trade_ppr3", d, {
      val edges = tradeGraph(s, d)
      val seeds = edges.select(col("src").as("node")).distinct()
        .filter(expr("node % 2 = 1 AND ((node - 1) div 2) % 7 = 1"))
      pageRankFrom(edges, seeds, iters = 3, degCacheKey = Some(d))
    })

  /** The DuckDB twin of [[pageRank]] on the trade graph, iterations
    * unrolled as chained CTEs — same integer floor divisions, bit-exact. */
  private def duckPageRank(iters: Int): String = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), und AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        |), deg AS (
        |  SELECT src AS node, count(1) AS deg FROM und GROUP BY 1
        |), r0 AS (
        |  SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM deg
        |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""", c$i AS (
         |  SELECT u.dst AS node, sum(r.rank // d.deg) AS s
         |  FROM und u
         |  JOIN deg d ON u.src = d.node
         |  JOIN r${i - 1} r ON u.src = r.node
         |  GROUP BY 1
         |), r$i AS (
         |  SELECT d.node,
         |    CAST(150000000000 + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM deg d LEFT JOIN c$i ON d.node = c$i.node
         |)""".stripMargin
    }.mkString
    base + steps
  }

  /** The DuckDB twin of [[pageRankFrom]] on the trade graph with the
    * q_graph_bfs seed set — [[duckPageRank]]'s CTE chain with the
    * restart mass confined to the seeds. */
  private def duckPprChain(iters: Int): String = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), und AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        |), deg AS (
        |  SELECT src AS node, count(1) AS deg FROM und GROUP BY 1
        |), seeds AS (
        |  SELECT node, CAST(150000000000 AS BIGINT) AS restart FROM deg
        |  WHERE node % 2 = 1 AND ((node - 1) // 2) % 7 = 1
        |), r0 AS (
        |  SELECT d.node,
        |    CAST(CASE WHEN s.node IS NOT NULL THEN 1000000000000 ELSE 0 END
        |      AS BIGINT) AS rank
        |  FROM deg d LEFT JOIN seeds s ON d.node = s.node
        |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""", c$i AS (
         |  SELECT u.dst AS node, sum(r.rank // d.deg) AS s
         |  FROM und u
         |  JOIN deg d ON u.src = d.node
         |  JOIN r${i - 1} r ON u.src = r.node
         |  GROUP BY 1
         |), r$i AS (
         |  SELECT d.node,
         |    CAST(coalesce(s.restart, 0)
         |      + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg d
         |  LEFT JOIN c$i ON d.node = c$i.node
         |  LEFT JOIN seeds s ON d.node = s.node
         |)""".stripMargin
    }.mkString
    base + steps
  }

  private def duckPpr(iters: Int): String =
    duckPprChain(iters) +
      s"""
         |SELECT node AS node_id,
         |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS node_type,
         |  rank
         |FROM r$iters ORDER BY node_id""".stripMargin

  /** Semi-synchronous label propagation (community detection) over a
    * symmetrized edge list: `iters` fixed rounds, each node adopting
    * the most frequent label among its neighbours with a DETERMINISTIC
    * tie-break (frequency ties → smallest label — GraphX's LPA returns
    * an arbitrary tied label, which could never hash-match a replay).
    * The per-round plan is (node, label) hash agg → ONE mergeable
    * struct-max `max((n, −label))` per node — labels are numeric so
    * the min-label tie-break is the negation trick, no join-back and
    * never a per-node window. Same size-adaptive dispatch as
    * [[pageRank]]: the label vector rides broadcast joins on small
    * graphs and shuffle joins above [[BroadcastMaxNodes]]; EVERY round
    * ends in a `localCheckpoint` lineage cut — each round broadcasts
    * the label vector, and broadcasting an un-materialized chain
    * re-executes all earlier rounds, O(iters²) work (measured 12 s →
    * 1.x s at sf0.1 over 3 rounds). */
  private[graft] def labelPropagation(edges: DataFrame, iters: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"labelPropagation unrolls a fixed plan per round; $iters is " +
        "outside the sane 1..20 range")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = und.select(col("src").as("node")).distinct()
    val small = nodes.count() <= broadcastMaxNodes
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val lab = (if (small) broadcast(labels) else labels)
        .select(col("node").as("__n"), col("label"))
      // ONE exchange per round (r17 round, guide §2.4): hash(src) set
      // explicitly on the join output satisfies BOTH aggregations —
      // clustering by src co-locates every (src, label) group, and the
      // argmax's node key is the same src through the alias — where the
      // planner's default ran hash(src, label) for the counts and a
      // second hash(node) exchange for the argmax.
      val counts = und.join(lab, und("dst") === col("__n"))
        .repartition(und("src"))
        .groupBy(und("src").as("node"), col("label"))
        .agg(count(lit(1)).as("n"))
      // argmax as one struct max: (n, −label) picks the highest count,
      // count ties resolve to the SMALLEST label via the negation
      val next = counts
        .groupBy("node")
        .agg(max(struct(col("n"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      // LAZY checkpoint: the next round's broadcast collect is the
      // first (and only) materialization, so it persists the partitions
      // as a side effect — one pass instead of an eager job + a collect
      labels = next.localCheckpoint(false)
    }
    labels
  }

  /** Run-to-convergence label propagation — [[pageRankConverge]]'s LPA
    * twin: semi-synchronous deterministic rounds until the label vector
    * stops changing (labels are integers, so the fixed-point test is
    * exact equality and the converged result equals any longer
    * fixed-round run). Per-round lineage cuts keep plan depth constant;
    * raises on non-convergence within `maxIters` (deterministic
    * min-tie-break LPA CAN 2-cycle on bipartite-ish structures — a
    * loud error beats an arbitrary winner). */
  private[graft] def labelPropagationConverge(edges: DataFrame,
      maxIters: Int = 50,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(maxIters >= 1 && maxIters <= 500,
      s"maxIters outside the sane 1..500 range: $maxIters")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = und.select(col("src").as("node")).distinct()
    val small = nodes.count() <= broadcastMaxNodes
    var labels = nodes.withColumn("label", col("node")).localCheckpoint(true)
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val lab = (if (small) broadcast(labels) else labels)
        .select(col("node").as("__n"), col("label"))
      val counts = und.join(lab, und("dst") === col("__n"))
        // hash(src) satisfies both this agg and the argmax (see
        // [[labelPropagation]]) — one exchange, not two
        .repartition(und("src"))
        .groupBy(und("src").as("node"), col("label"))
        .agg(count(lit(1)).as("n"))
      // probe folded into the materialization, like [[pageRankConverge]]:
      // the previous label is CARRIED through one extra |V| union +
      // max-agg (NULL rows are invisible to max, so the carry is
      // sign-agnostic) rather than JOINED on — a prev-join would square
      // the checkpoint-inherited size estimate every round and stall
      // planning in BigInt stats math (see [[iterateCarry]]); the
      // changed-row test stays a narrow filter over materialized
      // blocks — one full job per round, not two
      val next = counts
        .groupBy("node")
        .agg(max(struct(col("n"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"),
          lit(null).cast("long").as("old"))
        .unionAll(labels.select(col("node"),
          lit(null).cast("long").as("label"), col("label").as("old")))
        .groupBy("node")
        .agg(max("label").as("label"), max("old").as("__prev"))
        .localCheckpoint(true)
      done = next.filter(col("label") =!= col("__prev")).isEmpty
      labels = next.select("node", "label")
      i += 1
    }
    if (!done) sys.error(
      s"labelPropagation did not converge in $maxIters rounds " +
        "(deterministic LPA can oscillate; inspect the graph or use " +
        "the fixed-round mode)")
    labels
  }

  /** DuckDB twin of [[labelPropagation]] on the trade graph, rounds
    * unrolled as chained CTEs — integer counts and min tie-breaks,
    * bit-exact. */
  private def duckLabelProp(iters: Int): String = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), und AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        |), l0 AS (
        |  SELECT DISTINCT src AS node, src AS label FROM und
        |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""", c$i AS (
         |  SELECT u.src AS node, l.label, count(1) AS n
         |  FROM und u JOIN l${i - 1} l ON u.dst = l.node
         |  GROUP BY 1, 2
         |), t$i AS (
         |  SELECT node, max(n) AS top_n FROM c$i GROUP BY 1
         |), l$i AS (
         |  SELECT c$i.node AS node, min(label) AS label
         |  FROM c$i JOIN t$i ON c$i.node = t$i.node AND c$i.n = t$i.top_n
         |  GROUP BY 1
         |)""".stripMargin
    }.mkString
    base + steps
  }

  /** Size-adaptive broadcast hint for NODE-grain frames (degrees, ranks,
    * labels). A node-grain frame on a 100 TB graph is billions of rows —
    * an unconditional `broadcast()` of it OOMs the driver and every
    * executor — so every degree/rank attach in this file routes through
    * this measured-count dispatch: broadcast below `broadcastMaxNodes`
    * rows, plain (shuffle) join above. GraphSpec pins that both arms
    * produce identical results; PlanSpec pins the adaptivity. */
  private[graft] def hintNodeGrain(df: DataFrame, nNodes: Long,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame =
    if (nNodes <= broadcastMaxNodes) broadcast(df) else df

  /** Degree-ordered orientation of a canonical (a < b) undirected edge
    * list: every edge points from its (degree, id)-smaller endpoint to
    * the larger, so out-degrees are O(√m) on ANY degree distribution —
    * the bound that keeps the wedge expansion below safe on hub nodes.
    * The two degree attaches ride [[hintNodeGrain]]: the degree table is
    * node-grain, so it broadcasts only below the measured-|V| gate and
    * falls back to shuffle joins on a big graph (same dispatch as
    * [[pageRank]]'s rank vector). The table is materialized once
    * (localCheckpoint) so the |V| measurement and both attach joins read
    * the same concrete rows instead of re-running the |E| degree agg. */
  private[graft] def orientEdges(edges: DataFrame,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
      .localCheckpoint(true)
    val nV = deg.count()
    val da = deg.select(col("n").as("a"), col("dg").as("da"))
    val db = deg.select(col("n").as("b"), col("dg").as("db"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    edges.join(hintNodeGrain(da, nV, broadcastMaxNodes), "a")
      .join(hintNodeGrain(db, nV, broadcastMaxNodes), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("src"),
        when(lowFirst, col("b")).otherwise(col("a")).as("dst"))
  }

  /** The wedge-closed triangle set (src, x, y): wedges expand
    * ROW-LOCALLY from each apex's sorted out-list (the q_basket_pairs
    * double-GENERATE — one src shuffle, never a corpus self-join; list
    * length is the orientation-bounded O(√m) out-degree), each triangle
    * closes at exactly ONE apex via the (x, y) equi-join against the
    * canonical edge set. */
  private[graft] def wedgeTriangles(
      edges: DataFrame, oriented: DataFrame): DataFrame = {
    val wedges = oriented.groupBy("src")
      .agg(array_sort(collect_set(col("dst"))).as("outs"))
      .select(col("src"), col("outs"), posexplode(col("outs")))
      .select(col("src"), col("col").as("x"),
        explode(slice(col("outs"), col("pos") + lit(2),
          size(col("outs")))).as("y"))
    wedges.join(edges, col("x") === col("a") && col("y") === col("b"))
      .select(col("src"), col("x"), col("y"))
  }

  /** Per-node triangle participation ([[graft.Graft.triangleCounts]]):
    * (node, n_tri) for every node of ≥1 triangle — sums a node's three
    * possible roles over the triangle frame. */
  private[graft] def triangleParticipation(tris: DataFrame): DataFrame =
    tris.select(col("src").as("node"))
      .unionAll(tris.select(col("x").as("node")))
      .unionAll(tris.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

  /** The three canonical (a < b) edges of every triangle — the edge-
    * grain view of the triangle frame (one row per (triangle, edge)
    * incidence; group to count triangles per edge). */
  private[graft] def triangleEdges(tris: DataFrame): DataFrame = {
    def canon(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      Seq(least(u, v).as("ea"), greatest(u, v).as("eb"))
    tris.select(canon(col("src"), col("x")): _*)
      .unionAll(tris.select(canon(col("src"), col("y")): _*))
      .unionAll(tris.select(canon(col("x"), col("y")): _*))
      .withColumnRenamed("ea", "a").withColumnRenamed("eb", "b")
  }

  /** Shared DuckDB CTE prefix for the co-purchase graph keys: canonical
    * edges of the small-part co-purchase graph, degrees, the degree-
    * ordered orientation, and the triangle set — the exact SQL replay of
    * the engine's cached artifacts. */
  private val duckCopurchaseBase =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_size <= 10
      |), edges AS (
      |  SELECT i.l_partkey AS a, j.l_partkey AS b
      |  FROM items i JOIN items j
      |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey
      |  GROUP BY 1, 2
      |), deg AS (
      |  SELECT n, count(1) AS dg FROM (
      |    SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
      |  GROUP BY 1
      |), oriented AS (
      |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
      |           THEN a ELSE b END AS src,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
      |           THEN b ELSE a END AS dst
      |  FROM edges JOIN deg da ON da.n = a JOIN deg db ON db.n = b
      |), tris AS (
      |  SELECT e1.src, e1.dst AS x, e2.dst AS y
      |  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
      |  JOIN edges ON a = e1.dst AND b = e2.dst
      |  WHERE e1.dst < e2.dst
      |)""".stripMargin

  /** The co-purchase edge/orientation caches shared by the census,
    * clustering, and embeddedness keys. */
  /** Edge artifact only — for consumers (the k-core peel) that never
    * touch triangles: getOrCheckpoint is EAGER, so routing them through
    * [[copurchase]] used to materialize the wedge pass they throw away
    * (guide §1.2: don't compute things you discard; r17 round). */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val items = Tables.table(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .join(broadcast(Tables.table(s, d, "part")
        .filter(col("p_size") <= 10).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_partkey")
    graft.CacheRegistry.getOrCheckpoint("graph_copurchase_edges", d,
      items.groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
        .select(col("parts"), posexplode(col("parts")))
        .select(col("col").as("a"),
          explode(slice(col("parts"), col("pos") + lit(2),
            size(col("parts")))).as("b"))
        .distinct())
  }

  private def copurchase(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val edges = copurchaseEdges(s, d)
    val oriented = graft.CacheRegistry.getOrCheckpoint(
      "graph_copurchase_oriented", d, orientEdges(edges))
    // the triangle FRAME is the third shared artifact (14k rows at
    // sf0.1): census, clustering, and embeddedness all reduce from it —
    // without this cache each key re-ran the wedge pass (~1 s of
    // replanning each, measured)
    val tris = graft.CacheRegistry.getOrCheckpoint(
      "graph_copurchase_tris", d, wedgeTriangles(edges, oriented))
    (edges, tris)
  }

  /** Undirected degree table of a canonical (a < b) edge list. */
  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("n")).unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))

  /** Induced-subgraph restriction of a canonical edge list to a node
    * set — two semi joins, the k-core peel step. Both joins reference
    * the SAME `nodes` plan (condition-based, no per-side rename), so
    * the physical broadcast exchange is built once and REUSED for the
    * second join instead of collected twice per round. */
  private def induced(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val e1 = edges.join(nodes, edges("a") === nodes("n"), "left_semi")
    e1.join(nodes, e1("b") === nodes("n"), "left_semi")
  }

  /** FIXED-ROUND k-core peel over a canonical (a < b) edge list:
    * `rounds` peels of degree-<k nodes, then the final degree table of
    * the surviving induced subgraph (n, dg ≥ k). Each round cuts
    * lineage (the survivor set is referenced twice per round — an
    * unrolled chain doubles per round). The oracle key
    * `q_graph_kcore` replays these exact rounds as chained CTEs. */
  /** Personalized PageRank ([[graft.Graft.personalizedPageRank]];
    * TrustRank-style seed-biased importance): the restart mass lands
    * ONLY on the seed set, so rank measures proximity-weighted
    * influence relative to the seeds — the "expand from trusted
    * documents, importance-weighted" curation primitive, where uniform
    * [[pageRank]] measures global centrality. Same exact integer
    * contract (micro-units, floor divisions, bit-reproducible at any
    * partitioning), same fixed-round bounded plan, same size-adaptive
    * broadcast/shuffle dispatch and per-round lineage cuts as
    * [[pageRank]]; r0 = 10^12 on each seed and 0 elsewhere, each round
    * adds 0.15·10^12 restart to seeds only. Non-seed sinks keep rank 0
    * until mass reaches them, so the output is a full |V| vector (no
    * sparse drop-out — deterministic row count). */
  private[graft] def pageRankFrom(edges: DataFrame, seeds: DataFrame,
      iters: Int, degCacheKey: Option[String] = None,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"pageRankFrom runs a fixed unrolled plan per iteration; $iters is " +
        "outside the sane 1..20 range (each iteration adds two exchanges)")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    def buildDeg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val deg = degCacheKey
      .map(k => graft.CacheRegistry.getOrCheckpoint("graph_out_degrees", k, buildDeg))
      .getOrElse(buildDeg)
    def buildFused = und.join(deg, "src")
    val fused = degCacheKey
      .map(k => graft.CacheRegistry.getOrCheckpoint("graph_edges_deg", k, buildFused))
      .getOrElse(buildFused)
    val nV = deg.count()
    val small = nV <= broadcastMaxNodes
    val seedSet = pprSeeds(seeds, small)
    var ranks = pprInit(deg, seedSet, small)
    for (i <- 1 to iters) {
      ranks = pprIterate(fused, deg, seedSet, ranks, hintSmall = small)
      if (!small && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** seed restart table: |S|-sized, checkpointed once, joined per round */
  private def pprSeeds(seeds: DataFrame, small: Boolean): DataFrame =
    seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("restart", lit(150000000000L))
      .localCheckpoint(true)

  private def pprInit(deg: DataFrame, seedSet: DataFrame,
      small: Boolean): DataFrame = {
    def h(df: DataFrame) = if (small) broadcast(df) else df
    deg.select(col("src").as("node"))
      .join(h(seedSet), Seq("node"), "left")
      .select(col("node"),
        when(col("restart").isNotNull, lit(1000000000000L)).otherwise(lit(0L))
          .as("rank"))
  }

  /** One personalized-PageRank power iteration — [[iterate]] with the
    * restart mass confined to `seedSet` (a (node, restart) frame). */
  private def pprIterate(fused: DataFrame, deg: DataFrame,
      seedSet: DataFrame, ranks: DataFrame, hintSmall: Boolean): DataFrame = {
    def h(df: DataFrame) = if (hintSmall) broadcast(df) else df
    fused
      .join(h(ranks.withColumnRenamed("node", "src")), "src")
      .select(col("dst").as("node"), expr("rank div deg").as("share"))
      .unionAll(deg.select(col("src").as("node"), lit(0L).as("share")))
      .groupBy("node").agg(sum("share").as("s"))
      .join(h(seedSet), Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("restart"), lit(0L)) + expr("(85 * s) div 100"))
          .as("rank"))
  }

  /** [[pprIterate]] with the previous rank carried as `__prev` through
    * the aggregation union — the converge round (see [[iterateCarry]]
    * for why the carry must be a union, not a join: checkpoint-
    * inherited stats square under a self-join and stall planning). */
  private def pprIterateCarry(fused: DataFrame, deg: DataFrame,
      seedSet: DataFrame, ranks: DataFrame, hintSmall: Boolean): DataFrame = {
    def h(df: DataFrame) = if (hintSmall) broadcast(df) else df
    fused
      .join(h(ranks.withColumnRenamed("node", "src")), "src")
      .select(col("dst").as("node"), expr("rank div deg").as("share"),
        lit(-1L).as("old"))
      .unionAll(deg.select(col("src").as("node"), lit(0L).as("share"),
        lit(-1L).as("old")))
      .unionAll(ranks.select(col("node"), lit(0L).as("share"),
        col("rank").as("old")))
      .groupBy("node").agg(sum("share").as("s"), max("old").as("old"))
      .join(h(seedSet), Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("restart"), lit(0L)) + expr("(85 * s) div 100"))
          .as("rank"),
        col("old").as("__prev"))
  }

  /** One PPR step over a GIVEN rank vector — the GraphSpec test hook
    * that proves the converged vector is an exact fixed point (the
    * [[pageRankStep]] pattern; ~170 rounds to mix to the integer grain
    * puts full convergence past the fixed-round 20-cap, so equality
    * with "every long-enough fixed-round run" is established via
    * step-identity, not a literal long run). */
  private[graft] def pprStep(edges: DataFrame, seeds: DataFrame,
      ranks: DataFrame): DataFrame = {
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    pprIterate(und.join(deg, "src"), deg, pprSeeds(seeds, small = true),
      ranks, hintSmall = true)
  }

  /** Run-to-convergence personalized PageRank — [[pageRankFromConverge]]
    * is to [[pageRankFrom]] exactly what [[pageRankConverge]] is to
    * [[pageRank]]: iterate [[pprIterate]] to the EXACT integer fixed
    * point with the probe folded into each round's materialization,
    * loud error past `maxIters`.
    *
    * CYCLE CAVEAT the uniform variant rarely trips but PPR often does:
    * the floor map is not monotone, so on some graphs the integer
    * vector enters a PERIOD-2 oscillation one ulp wide instead of a
    * fixed point (empirically ~1 in 3 small random graphs). Each round
    * therefore also compares against the round-BEFORE-last (a narrow
    * |V| probe over materialized blocks) and raises the documented
    * 2-cycle error IMMEDIATELY — the LPA oscillation policy, but
    * detected at onset rather than discovered at the maxIters wall.
    * The fixed-round mode (iters = N) is the oracle-checked contract
    * and is always well-defined. */
  private[graft] def pageRankFromConverge(edges: DataFrame, seeds: DataFrame,
      maxIters: Int = 50,
      broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(maxIters >= 1 && maxIters <= 500,
      s"maxIters outside the sane 1..500 range: $maxIters")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val fused = und.join(deg, "src").persist()
    val nV = deg.count()
    val small = nV <= broadcastMaxNodes
    val seedSet = pprSeeds(seeds, small)
    var ranks = pprInit(deg, seedSet, small).localCheckpoint(true)
    var prevPrev: DataFrame = null
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val next = pprIterateCarry(fused, deg, seedSet, ranks,
        hintSmall = small).localCheckpoint(true)
      done = next.filter(col("rank") =!= col("__prev")).isEmpty
      if (!done && prevPrev != null) {
        // period-2 probe: both sides are one-node LogicalRDD scans, so
        // the join is a narrow extra job over materialized blocks (and
        // its plan is executed and DISCARDED — never carried, so the
        // stats-squaring hazard iterateCarry documents cannot build up)
        val pp = (if (small) broadcast(prevPrev) else prevPrev)
          .select(col("node").as("__qn"), col("rank").as("__pp"))
        val cycled = next.join(pp, col("node") === col("__qn"))
          .filter(col("rank") =!= col("__pp")).isEmpty
        if (cycled) {
          deg.unpersist(); fused.unpersist()
          sys.error("personalized PageRank oscillates with period 2 at " +
            "the integer grain (the floor map is not monotone on this " +
            "graph); use the fixed-round mode (iters = N), whose bounded " +
            "output is the oracle-checked contract")
        }
      }
      prevPrev = ranks
      ranks = next.select("node", "rank")
      i += 1
    }
    deg.unpersist(); fused.unpersist()
    if (!done) sys.error(
      s"personalized PageRank did not reach its integer fixed point in " +
        s"$maxIters rounds")
    ranks
  }

  /** Multi-source bounded-hop BFS ([[graft.Graft.bfs]]): hop distance
    * from every reachable node to its NEAREST seed, exploring at most
    * `maxHops` rounds. Returns (node, dist) — one row per node reached
    * within the horizon, dist ∈ [0, maxHops], seeds at 0.
    *
    * Engine form is frontier BFS as joins: round r joins the
    * (checkpointed, |frontier|-sized) frontier to the edge list,
    * distinct-s the neighbors, and anti-joins the visited set — so a
    * round costs one frontier-bounded shuffle, never a full-lineage
    * |E| rescan (each frontier is a one-node LogicalRDD, the same
    * replanning cut the converge loops use; pass a registry-cached
    * edge frame so the scan side is one node too). An exhausted
    * frontier short-circuits the remaining rounds (the materialized
    * frontier makes the emptiness probe free), so `maxHops` is a
    * horizon, not a forced cost. Edges must already be in the
    * orientation the caller wants distance to flow (symmetrized for
    * undirected graphs, same contract as [[pageRank]]). All-integer,
    * partitioning-independent output. */
  private[graft] def bfs(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16,
      s"bfs unrolls one join round per hop; maxHops=$maxHops is outside " +
        "the sane 1..16 range (unbounded reachability is connectedComponents)")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    var visited = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = visited.select("node")
    var r = 1
    var exhausted = false
    while (r <= maxHops && !exhausted) {
      val next = e
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionAll(next)
        frontier = next.select("node")
      }
      r += 1
    }
    visited
  }

  /** Bounded-round single-source shortest paths (Bellman-Ford
    * relaxation) from a seed set over weighted edges `(src, dst, w)`:
    * after round r, `dist` holds the exact cheapest cost over paths of
    * ≤ r edges (integer weights — no float accumulation). Each round
    * is ONE edge join + ONE min-agg over the union with the carried
    * frame, lineage-cut per round; the carried frame only ever joins
    * the STATIC edge list, so Catalyst size stats grow linearly per
    * round, never square (the converge-loop lesson). Unreached nodes
    * are absent, matching [[bfs]]'s contract. */
  private[graft] def sssp(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"sssp unrolls one relaxation per round; rounds=$rounds is outside " +
        "the sane 1..16 range")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  private[graft] def kCorePeel(edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var nodes = degrees(edges).filter(col("dg") >= k).select("n")
    for (_ <- 1 to rounds) {
      // LAZY cut: the round's broadcast collect is the only
      // materialization (the reused exchange means the second semi join
      // reads the same broadcast) — persists as a side effect
      nodes = nodes.localCheckpoint(false)
      nodes = degrees(induced(edges, nodes)).filter(col("dg") >= k)
        .select("n")
    }
    nodes = nodes.localCheckpoint(false)
    degrees(induced(edges, nodes)).filter(col("dg") >= k)
  }

  /** Run-to-convergence k-core — peel until a round removes NO node
    * (peeling is monotone, so a stable survivor count IS the exact
    * fixed point: every remaining node has induced degree ≥ k, the
    * true k-core). The per-round probe is the `count()` of the already-
    * materialized survivor set — free next to the peel itself — and
    * the result equals any sufficiently long fixed-round
    * [[kCorePeel]]; GraphSpec pins that. Raises on `maxRounds`
    * exhaustion (cannot happen below |V| rounds — each non-final round
    * removes ≥ 1 node — so hitting the cap means the cap is too small
    * for the graph's peel depth, a configuration error worth a loud
    * stop). */
  private[graft] def kCoreConverge(edges: DataFrame, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    var nodes = degrees(edges).filter(col("dg") >= k).select("n")
      .localCheckpoint(false)
    var prev = nodes.count()
    var i = 0
    var done = false
    while (!done && i < maxRounds) {
      val next = degrees(induced(edges, nodes)).filter(col("dg") >= k)
        .select("n").localCheckpoint(false)
      val cnt = next.count()
      done = cnt == prev
      prev = cnt
      nodes = next
      i += 1
    }
    if (!done) sys.error(
      s"k-core did not stabilize in $maxRounds rounds; raise maxRounds " +
        "(peel depth exceeds the cap)")
    degrees(induced(edges, nodes))
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------ PageRank
    // 3 damped power iterations over the symmetrized customer↔supplier
    // trade graph; top 20 most central nodes. The edge AND degree tables
    // build once and registry-persist across iterations; the per-round
    // execution shape is size-adaptive (see [[pageRank]]): at this |V|
    // the rank vector rides broadcast joins, so each round is two
    // broadcast hash joins over the cached edges plus ONE map-side-
    // combined |V| shuffle, and all rounds run as one job. Integer
    // micro-unit ranks make all three rounds bit-replayable.
    QueryDef("q_graph_pagerank",
      (s, d) => pageRank(tradeGraph(s, d), iters = 3, degCacheKey = Some(d))
        .select(col("node").as("node_id"), nodeType.as("node_type"),
          col("rank").as("rank_micro"))
        .orderBy(col("rank_micro").desc, col("node_id"))
        .limit(20),
      Some(s"""${duckPageRank(3)}
              |SELECT node AS node_id,
              |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
              |    AS node_type,
              |  rank AS rank_micro
              |FROM r3
              |ORDER BY rank_micro DESC, node_id
              |LIMIT 20""".stripMargin)),

    // ------------------------------------------------- label propagation
    // community detection by 3 fixed LPA rounds over the trade graph
    // ([[labelPropagation]]) — the modularity-free community primitive
    // next to connected components (which needs the ≥4-trade cut to be
    // interesting; LPA finds structure in the dense graph as-is). Every
    // round is the deterministic counts-then-argmax rewrite, so the
    // oracle replays all 3 rounds as chained CTEs bit-exactly.
    QueryDef("q_graph_labelprop",
      (s, d) => labelPropagation(tradeGraph(s, d), iters = 3)
        .select(col("node").as("node_id"), nodeType.as("node_type"),
          col("label").as("community"))
        .orderBy("node_id"),
      Some(s"""${duckLabelProp(3)}
              |SELECT node AS node_id,
              |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
              |    AS node_type,
              |  CAST(label AS BIGINT) AS community
              |FROM l3 ORDER BY node_id""".stripMargin)),

    // ------------------------------------------------- connected components
    // community structure of the REPEAT-trade graph: only (customer,
    // supplier) pairs that traded in ≥ 4 distinct orders keep an edge,
    // which makes the graph sparse enough to fall apart into real
    // components ("trading cliques" — the entity-group discovery every
    // curation pipeline runs on its relationship tables). Rides the SAME
    // size-adaptive HashMin + pointer-jumping machinery as the dedup
    // cluster resolution (ops/Dedup.scala:500-): driver union-find below
    // the volume threshold, O(log diameter) BSP rounds above — graph
    // analytics and dedup resolution are one engine component, not two.
    // component_id = min node id in the component (HashMin's label), so
    // the output is deterministic at any partitioning. The edge build
    // (count-distinct per pair) is one orderkey join + one pair-keyed
    // agg; the ≥4 cut happens BEFORE any component work touches a row.
    QueryDef("q_graph_components",
      (s, d) => {
        val e = graft.CacheRegistry.getOrCheckpoint("graph_repeat_edges", d,
          Tables.table(s, d, "orders").select("o_orderkey", "o_custkey")
            .join(Tables.table(s, d, "lineitem")
              .select("l_orderkey", "l_suppkey"),
              col("o_orderkey") === col("l_orderkey"))
            .groupBy((col("o_custkey") * 2).as("doc_a"),
              (col("l_suppkey") * 2 + 1).as("doc_b"))
            .agg(countDistinct(col("o_orderkey")).as("n_ord"))
            .filter(col("n_ord") >= 4)
            .select("doc_a", "doc_b"))
        Dedup.connectedComponents(e)._1
          .select(col("doc_id").as("node_id"),
            when(col("doc_id") % 2 === 0, "customer").otherwise("supplier")
              .as("node_type"),
            col("keep_id").as("component_id"))
          .orderBy("node_id")
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2
             |  HAVING count(DISTINCT o_orderkey) >= 4
             |), und AS (
             |  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
             |), walk(doc, reach) AS (
             |  SELECT a, a FROM (SELECT DISTINCT a FROM und) s0
             |  UNION
             |  SELECT u.b, w.reach FROM walk w JOIN und u ON u.a = w.doc
             |)
             |SELECT doc AS node_id,
             |  CASE WHEN doc % 2 = 0 THEN 'customer' ELSE 'supplier' END
             |    AS node_type,
             |  min(reach) AS component_id
             |FROM walk GROUP BY doc ORDER BY node_id""".stripMargin)),

    // ------------------------------------------------------ degree report
    // the graph-profiling companion: degree distribution of the trade
    // graph — how many nodes have k trading partners. Two tiny aggs over
    // the registry-shared edge table (the same "report over the shared
    // artifact" shape as q_dedup_cluster_stats).
    QueryDef("q_graph_degrees",
      // reads the SAME registry-persisted out-degree table the PageRank
      // iterations divide by — whichever graph key runs first builds it
      (s, d) => graft.CacheRegistry.getOrCheckpoint("graph_out_degrees", d,
          tradeGraph(s, d).groupBy("src").agg(count(lit(1)).as("deg")))
        .select(col("deg").as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree"),
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), und AS (
             |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
             |), deg AS (
             |  SELECT src, CAST(count(1) AS BIGINT) AS degree
             |  FROM und GROUP BY 1
             |)
             |SELECT degree, CAST(count(1) AS BIGINT) AS n_nodes
             |FROM deg GROUP BY degree
             |ORDER BY degree""".stripMargin)),

    // ------------------------------------------------ triangle census
    // triangle participation in the co-purchase part graph (parts linked
    // when one order contains both) — the clustering/cohesion metric the
    // trade graph cannot host (it is bipartite, triangle-free by
    // construction). The graph restricts to small parts (p_size ≤ 10)
    // so the census reads a cut, not the whole basket blow-up. Engine
    // form is the degree-ORDERED wedge join — the standard scale
    // treatment (node iterator with orientation): orient every edge from
    // its (degree, id)-smaller endpoint to the larger, so out-degrees
    // are bounded by O(√m) on ANY degree distribution and the wedge
    // self-join is Σd_out² — never the unbounded Σd² a naive star join
    // pays on a hub node. Each triangle then closes at exactly ONE apex
    // (the vertex whose two out-edges reach the other two), counted by
    // a semi-joinable equi-join against the canonical (a<b) edge set.
    // All integers; per-node participation sums the three roles.
    QueryDef("q_graph_triangles",
      (s, d) => {
        val (_, tris) = copurchase(s, d)
        triangleParticipation(tris)
          .withColumnRenamed("node", "p_partkey")
          .orderBy(col("n_tri").desc, col("p_partkey"))
          .limit(25)
      },
      Some(s"""$duckCopurchaseBase
              |SELECT node AS p_partkey, CAST(count(1) AS BIGINT) AS n_tri
              |FROM (
              |  SELECT src AS node FROM tris
              |  UNION ALL SELECT x FROM tris
              |  UNION ALL SELECT y FROM tris)
              |GROUP BY 1
              |ORDER BY n_tri DESC, p_partkey
              |LIMIT 25""".stripMargin)),

    // ----------------------------------------------- k-core peeling
    // FIXED-ROUND k-core: repeatedly peel nodes of degree < k from the
    // co-purchase graph (the dense-community / spam-ring extraction
    // primitive). Same fixed-round contract as [[pageRank]]: a bounded
    // unrolled plan, bit-replayable by the oracle's chained CTEs —
    // convergence-tested looping belongs in a driver loop (each round
    // here is two semi-joins + one degree agg over the shrinking node
    // set; the EDGE cache never rebuilds). Four peels suffice for this
    // fixture to reach the true 4-core (the spec-free proof is in the
    // oracle: DuckDB replays the identical four rounds, so a
    // non-converged fixture would still hash-match — the key pins the
    // ALGORITHM; the round count is the documented knob).
    QueryDef("q_graph_kcore",
      (s, d) => {
        val edges = copurchaseEdges(s, d)
        kCorePeel(edges, k = 4, rounds = 3)
          .select(col("n").as("p_partkey"), col("dg").as("core_degree"))
          .orderBy("p_partkey")
      },
      Some(s"""$duckCopurchaseBase
              |, n0 AS MATERIALIZED (SELECT n FROM deg WHERE dg >= 4),
              |e1 AS MATERIALIZED (SELECT a, b FROM edges
              |  WHERE a IN (SELECT n FROM n0) AND b IN (SELECT n FROM n0)),
              |d1 AS MATERIALIZED (SELECT n, count(1) AS dg FROM (
              |  SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
              |n1 AS MATERIALIZED (SELECT n FROM d1 WHERE dg >= 4),
              |e2 AS MATERIALIZED (SELECT a, b FROM e1
              |  WHERE a IN (SELECT n FROM n1) AND b IN (SELECT n FROM n1)),
              |d2 AS MATERIALIZED (SELECT n, count(1) AS dg FROM (
              |  SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
              |n2 AS MATERIALIZED (SELECT n FROM d2 WHERE dg >= 4),
              |e3 AS MATERIALIZED (SELECT a, b FROM e2
              |  WHERE a IN (SELECT n FROM n2) AND b IN (SELECT n FROM n2)),
              |d3 AS MATERIALIZED (SELECT n, count(1) AS dg FROM (
              |  SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
              |n3 AS MATERIALIZED (SELECT n FROM d3 WHERE dg >= 4),
              |e4 AS MATERIALIZED (SELECT a, b FROM e3
              |  WHERE a IN (SELECT n FROM n3) AND b IN (SELECT n FROM n3)),
              |d4 AS MATERIALIZED (SELECT n, count(1) AS dg FROM (
              |  SELECT a AS n FROM e4 UNION ALL SELECT b FROM e4) GROUP BY 1)
              |SELECT n AS p_partkey, CAST(dg AS BIGINT) AS core_degree
              |FROM d4 WHERE dg >= 4
              |ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------- clustering coefficient
    // per-node local clustering: 2·tri / (deg·(deg−1)) — how close each
    // part's co-purchase neighborhood is to a clique (the community-
    // tightness signal next to the raw census). Derives ENTIRELY from
    // the cached artifacts: triangle participation (the wedge machinery
    // above) joined to the degree table, one double division per node —
    // integers until the final ratio, deterministic everywhere. Nodes
    // of degree < 2 have no possible triangle and are excluded (the
    // 0/0 convention both engines would otherwise have to agree on).
    QueryDef("q_graph_clustering",
      (s, d) => {
        val (edges, tris) = copurchase(s, d)
        triangleParticipation(tris)
          .join(degrees(edges), col("node") === col("n"))
          .filter(col("dg") >= 2)
          .select(col("node").as("p_partkey"), col("n_tri"),
            col("dg").as("degree"),
            (lit(2.0) * col("n_tri") / (col("dg") * (col("dg") - 1)))
              .as("coeff"))
          .orderBy(col("coeff").desc, col("p_partkey"))
          .limit(25)
      },
      Some(s"""$duckCopurchaseBase
              |, node_tri AS (
              |  SELECT node, CAST(count(1) AS BIGINT) AS n_tri
              |  FROM (
              |    SELECT src AS node FROM tris
              |    UNION ALL SELECT x FROM tris
              |    UNION ALL SELECT y FROM tris)
              |  GROUP BY 1
              |)
              |SELECT node AS p_partkey, n_tri,
              |  CAST(dg AS BIGINT) AS degree,
              |  2.0 * n_tri / (dg * (dg - 1)) AS coeff
              |FROM node_tri JOIN deg ON node = n
              |WHERE dg >= 2
              |ORDER BY coeff DESC, p_partkey
              |LIMIT 25""".stripMargin)),

    // ------------------------------------------------ edge embeddedness
    // per-EDGE Jaccard of the endpoints' neighborhoods — tie strength /
    // link-prediction scoring of existing edges: common = triangles ON
    // the edge, union = (da−1) + (db−1) − common. The quadratic
    // all-pairs common-neighbor join is deliberately NOT computed —
    // restricting to existing edges keeps the output edge-grain and
    // derives common counts from the SAME triangle set (each triangle
    // contributes to its three edges, canonicalized least/greatest).
    // Integers until the final ratio.
    QueryDef("q_graph_edge_jaccard",
      (s, d) => {
        val (edges, tris) = copurchase(s, d)
        // node-grain degree attach → size-adaptive, same gate as
        // orientEdges: broadcast at fixture |V|, shuffle join on a big
        // graph (an unconditional broadcast of a billions-row degree
        // table is the 100 TB OOM this file's dispatch exists to avoid)
        val deg = degrees(edges).localCheckpoint(true)
        val nV = deg.count()
        val common = triangleEdges(tris).groupBy("a", "b")
          .agg(count(lit(1)).as("common"))
        edges.join(common, Seq("a", "b"), "inner")
          .join(hintNodeGrain(
            deg.select(col("n").as("a"), col("dg").as("da")), nV), "a")
          .join(hintNodeGrain(
            deg.select(col("n").as("b"), col("dg").as("db")), nV), "b")
          .select(col("a"), col("b"), col("common"),
            (col("da") + col("db") - 2 - col("common")).as("union_n"),
            (col("common").cast("double") /
              (col("da") + col("db") - 2 - col("common"))).as("jaccard"))
          .orderBy(col("jaccard").desc, col("a"), col("b"))
          .limit(25)
      },
      Some(s"""$duckCopurchaseBase
              |, tri_edges AS (
              |  SELECT least(src, x) AS a, greatest(src, x) AS b FROM tris
              |  UNION ALL SELECT least(src, y), greatest(src, y) FROM tris
              |  UNION ALL SELECT least(x, y), greatest(x, y) FROM tris
              |), common AS (
              |  SELECT a, b, CAST(count(1) AS BIGINT) AS common
              |  FROM tri_edges GROUP BY 1, 2
              |)
              |SELECT a, b, common,
              |  CAST(da.dg + db.dg - 2 - common AS BIGINT) AS union_n,
              |  CAST(common AS DOUBLE) / (da.dg + db.dg - 2 - common)
              |    AS jaccard
              |FROM edges JOIN common USING (a, b)
              |  JOIN deg da ON da.n = a JOIN deg db ON db.n = b
              |ORDER BY jaccard DESC, a, b
              |LIMIT 25""".stripMargin)),

    // --------------------------------------- personalized PageRank
    // seed-biased importance on the trade graph: restart mass lands
    // only on the q_graph_bfs seed suppliers, so rank = proximity-
    // weighted influence relative to the trusted set (TrustRank) —
    // [[pageRankFrom]] documents the engine form (the exact-integer
    // pageRank loop with a |S|-sized restart join per round). The
    // oracle unrolls the same three rounds as chained CTEs with the
    // identical floor divisions.
    QueryDef("q_graph_ppr",
      (s, d) => tradePpr3(s, d)
        .select(col("node").as("node_id"),
          nodeType.as("node_type"), col("rank"))
        .orderBy("node_id"),
      Some(duckPpr(3))),

    // ---------------------------------- importance-weighted sampling
    // the north star this file's header names: PageRank-weighted
    // sampling of an entity graph before curation. Each node is
    // admitted with probability ∝ its personalized-PageRank mass
    // (rank / max_rank), but DETERMINISTICALLY: the coin is the
    // portable md5 of the node id reduced mod 10^6 ([[Text.md5i]] —
    // the q_sample_stratified/reservoir admission discipline), the
    // threshold is the exact integer (rank·10^6) div max_rank, so the
    // sample is a pure function of (graph, seeds) — stable across
    // runs, engines, partitionings, and mergeable. One broadcast
    // scalar (max rank) + a row-local hash compare on top of the
    // registry-shared PPR artifacts: zero-rank nodes can never be
    // admitted, the top node always is.
    QueryDef("q_sample_importance",
      (s, d) => {
        val ranks = tradePpr3(s, d)
        val mx = ranks.agg(max("rank").as("max_rank"))
        ranks.join(broadcast(mx))
          .withColumn("admit_below", expr(
            "(CAST(rank AS DECIMAL(38,0)) * 1000000) div max_rank"))
          .withColumn("hk", expr(
            s"${Text.md5i("CAST(node AS STRING)")} % 1000000"))
          .filter(col("hk") < col("admit_below"))
          .select(col("node").as("node_id"), nodeType.as("node_type"),
            col("rank"), col("hk").as("admission_key"))
          .orderBy("node_id")
      },
      Some(duckPprChain(3) +
        s"""
           |, mx AS (SELECT max(rank) AS max_rank FROM r3)
           |SELECT node AS node_id,
           |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
           |    AS node_type,
           |  rank,
           |  CAST(${Text.md5iDuck("CAST(node AS VARCHAR)")} % 1000000
           |    AS BIGINT) AS admission_key
           |FROM r3, mx
           |WHERE ${Text.md5iDuck("CAST(node AS VARCHAR)")} % 1000000
           |  < (CAST(rank AS HUGEINT) * 1000000) // max_rank
           |ORDER BY node_id""".stripMargin)),

    // ------------------------------------------------ bounded-hop BFS
    // multi-source breadth-first distances on the trade graph: every
    // node's hop distance (≤ 4) to the nearest seed supplier — the
    // "blast radius" / influence-horizon query (and the building block
    // of seed-based corpus expansion: start from trusted documents,
    // pull in everything within k link hops). See [[bfs]] for the
    // frontier-as-joins engine form. All-integer output; the oracle
    // replays the same four frontier expansions as chained CTEs with
    // min(dist) collapsing walk lengths to true BFS distance.
    QueryDef("q_graph_bfs",
      (s, d) => {
        val edges = tradeGraph(s, d)
        val seeds = edges.select(col("src").as("node")).distinct()
          .filter(expr("node % 2 = 1 AND ((node - 1) div 2) % 7 = 1"))
        bfs(edges, seeds, maxHops = 4)
          .select(col("node").as("node_id"),
            nodeType.as("node_type"), col("dist"))
          .orderBy("node_id")
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), und AS (
             |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
             |), f0 AS (
             |  SELECT DISTINCT src AS node FROM und
             |  WHERE src % 2 = 1 AND ((src - 1) // 2) % 7 = 1
             |), f1 AS (
             |  SELECT DISTINCT u.dst AS node FROM und u JOIN f0 ON u.src = f0.node
             |), f2 AS (
             |  SELECT DISTINCT u.dst AS node FROM und u JOIN f1 ON u.src = f1.node
             |), f3 AS (
             |  SELECT DISTINCT u.dst AS node FROM und u JOIN f2 ON u.src = f2.node
             |), f4 AS (
             |  SELECT DISTINCT u.dst AS node FROM und u JOIN f3 ON u.src = f3.node
             |), lvl AS (
             |  SELECT node, 0 AS dist FROM f0
             |  UNION ALL SELECT node, 1 FROM f1
             |  UNION ALL SELECT node, 2 FROM f2
             |  UNION ALL SELECT node, 3 FROM f3
             |  UNION ALL SELECT node, 4 FROM f4
             |)
             |SELECT node AS node_id,
             |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             |    AS node_type,
             |  CAST(min(dist) AS BIGINT) AS dist
             |FROM lvl GROUP BY node
             |ORDER BY node_id""".stripMargin)),

    // ------------------------------ weighted shortest paths (SSSP)
    // BFS's cost-aware sibling: cheapest trade route (min total cents)
    // from the same seed suppliers within 4 relaxation rounds —
    // Bellman-Ford as joins, exact integer weights (min line cents per
    // edge), so no float accumulation anywhere and the oracle's
    // unrolled CTE chain is bit-exact. See [[sssp]] for the
    // stats-linear loop shape.
    QueryDef("q_graph_sssp",
      (s, d) => {
        val edges = tradeGraphWeighted(s, d)
        val seeds = edges.select(col("src").as("node")).distinct()
          .filter(expr("node % 2 = 1 AND ((node - 1) div 2) % 7 = 1"))
        sssp(edges, seeds, rounds = 4)
          .select(col("node").as("node_id"),
            nodeType.as("node_type"), col("dist").as("cost_cents"))
          .orderBy("node_id")
      },
      Some("""WITH e0 AS (
             |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2
             |), und AS (
             |  SELECT src, dst, w FROM e0
             |  UNION ALL SELECT dst, src, w FROM e0
             |), d0 AS (
             |  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
             |  FROM und WHERE src % 2 = 1 AND ((src - 1) // 2) % 7 = 1
             |), d1 AS (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d0
             |    UNION ALL SELECT u.dst AS node, p.dist + u.w AS dist
             |    FROM und u JOIN d0 p ON u.src = p.node) GROUP BY node
             |), d2 AS (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d1
             |    UNION ALL SELECT u.dst AS node, p.dist + u.w AS dist
             |    FROM und u JOIN d1 p ON u.src = p.node) GROUP BY node
             |), d3 AS (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d2
             |    UNION ALL SELECT u.dst AS node, p.dist + u.w AS dist
             |    FROM und u JOIN d2 p ON u.src = p.node) GROUP BY node
             |), d4 AS (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d3
             |    UNION ALL SELECT u.dst AS node, p.dist + u.w AS dist
             |    FROM und u JOIN d3 p ON u.src = p.node) GROUP BY node
             |)
             |SELECT node AS node_id,
             |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             |    AS node_type,
             |  CAST(dist AS BIGINT) AS cost_cents
             |FROM d4 ORDER BY node_id""".stripMargin))
  )
}
