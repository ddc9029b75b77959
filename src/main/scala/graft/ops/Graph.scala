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
    */
  private def iterate(und: DataFrame, deg: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = und
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(deg, "src")
      .select(col("dst").as("node"), expr("rank div deg").as("share"))
      .groupBy("node").agg(sum("share").as("s"))
    deg.select(col("src").as("node"))
      .join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(150000000000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
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
  private[graft] def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"pageRank runs a fixed unrolled plan per iteration; $iters is " +
        "outside the sane 1..20 range (each iteration adds two exchanges)")
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("node"), lit(1000000000000L).as("rank"))
    for (_ <- 1 to iters) ranks = iterate(und, deg, ranks)
    ranks
  }

  /** The customer↔supplier trade graph: an edge for every DISTINCT
    * (customer, supplier) pair that traded, symmetrized. Node ids are
    * namespaced (2·custkey / 2·suppkey + 1) because the synthetic keys
    * overlap numerically. Registry-cached: the graph is rebuilt once per
    * (session, sf dir), not once per iteration or per key. */
  private def tradeGraph(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrPersist("graph_trade_edges", d, {
      val e = Tables.table(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(Tables.table(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    })

  private def nodeType: Column =
    when(col("node") % 2 === 0, "customer").otherwise("supplier")

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

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------ PageRank
    // 3 damped power iterations over the symmetrized customer↔supplier
    // trade graph; top 20 most central nodes. The plan per iteration is
    // join-on-src (|E| shuffle) + agg-on-dst (map-side combined) — the
    // edge/degree tables build once and persist across iterations, so
    // 3 rounds cost 6 rank-vector-sized exchanges, not 3 graph rebuilds.
    // Integer micro-unit ranks make all three rounds bit-replayable.
    QueryDef("q_graph_pagerank",
      (s, d) => pageRank(tradeGraph(s, d), iters = 3)
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

    // ------------------------------------------------------ degree report
    // the graph-profiling companion: degree distribution of the trade
    // graph — how many nodes have k trading partners. Two tiny aggs over
    // the registry-shared edge table (the same "report over the shared
    // artifact" shape as q_dedup_cluster_stats).
    QueryDef("q_graph_degrees",
      (s, d) => tradeGraph(s, d)
        .groupBy("src").agg(count(lit(1)).as("degree"))
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
             |ORDER BY degree""".stripMargin))
  )
}
