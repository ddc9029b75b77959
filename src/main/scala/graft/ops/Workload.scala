package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryDef
import graft.warehouse.Tables

/** Composite TPC-H-shape workload keys. The reference's own example
  * workload is TPC-H (README.md:32-35 runs `dask_snowflake` against
  * TPCH_SF1, core.py:241-244 docstring), but every other key in this
  * inventory isolates one operator; these two exercise the full
  * scan → filter → multi-join → agg → top-k pipeline the reference's
  * users actually run, over the same synthetic tables.
  *
  * Scale notes (the plans the keys must produce):
  *   - filters sit directly on the scans → parquet pushdown prunes
  *     row groups before any join;
  *   - `nation` (25 rows at EVERY scale factor) is explicitly broadcast;
  *     `customer` is left to the size-based planner — it auto-broadcasts
  *     at bench scale but becomes a shuffle join at 100 TB, which is the
  *     correct plan there (3B customers do not broadcast);
  *   - the orders⋈lineitem join shuffles both sides by orderkey — the
  *     unavoidable fact-fact shuffle; everything downstream (the group-by
  *     including the join key) reuses that exchange where AQE allows;
  *   - money sums go through DECIMAL(38,6) inside the agg (exact,
  *     order-independent parallel sum), DOUBLE on the way out;
  *   - top-k ORDER BY carries a unique key tie-break so LIMIT is
  *     deterministic (o_orderkey / c_custkey are unique in the fixture).
  */
object Workload {

  private val D386 = DecimalType(38, 6)

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.table(s, d, n)

  private def revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast(D386)

  /** Qualified-keylist row count under which Q18's orders⋈qualified
    * join broadcasts; above it the forced shuffle-merge takes over.
    * ~4M × ~30 B/row ≈ 125 MB — the executor-broadcast ceiling class
    * shared with [[Text.DsirBroadcastMaxVocab]]. */
  private[graft] val Q18BroadcastMaxQual: Long = 1L << 22

  /** TPC-H Q18 with the fact-join arm MEASURED (round 16) — the same
    * measured-volume dispatch as [[Graph.hintNodeGrain]] /
    * [[graft.ops.Text.dsirSelect]]: the qualified keylist
    * localCheckpoints once (the count and the join read the same
    * blocks — no second lineitem aggregation), and its measured row
    * count picks broadcast (small keylist: the r16 100× audit measured
    * the forced-SMJ arm at 2× the broadcast arm's cost) vs shuffle-
    * merge (lenient threshold ⇒ order-count-sized keylist, where a
    * broadcast OOMs and SMJ is the only safe plan). PlanSpec pins BOTH
    * arms' plans; WorkloadSpec pins them row-identical. */
  private[graft] def tpchQ18(
      s: org.apache.spark.sql.SparkSession, d: String,
      broadcastMaxQual: Long = Q18BroadcastMaxQual): org.apache.spark.sql.DataFrame = {
    val qual = t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(D386)).as("qsum"))
      .filter(col("qsum") > lit(250).cast(D386))
      .localCheckpoint(true)
    val nQual = qual.count()
    val ord = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = t(s, d, "customer").select("c_custkey", "c_name")
    val joined =
      if (nQual <= broadcastMaxQual)
        ord.join(broadcast(qual), col("o_orderkey") === col("l_orderkey"))
      else
        ord.hint("merge")
          .join(qual, col("o_orderkey") === col("l_orderkey"))
    joined
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qsum").cast(DoubleType).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------- TPC-H Q3
    // shipping-priority shape: segment-filtered customers' orders placed
    // before the cutoff, revenue of their still-unshipped lineitems,
    // top 10 orders by revenue. (o_orderpriority stands in for the
    // synthetic schema's missing o_shippriority.)
    QueryDef("q_tpch_q3",
      (s, d) => {
        val cutoff = lit("1997-06-01").cast("timestamp")
        val cust = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < cutoff)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") > cutoff)
          .select(col("l_orderkey"), revenue.as("rev"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING'
             |  AND c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q10
    // returned-item reporting shape: customers who returned items in a
    // 6-month window, ranked by lost revenue, with their nation attached
    // via the broadcast dim join. (The synthetic customer table carries
    // no address/phone/comment; the surviving columns keep Q10's
    // customer-grain group-by.)
    QueryDef("q_tpch_q10",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1996-07-01").cast("timestamp")
        val li = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), revenue.as("rev"))
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select("o_orderkey", "o_custkey")
        val cust = t(s, d, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |  AND l_returnflag = 'R'
             |  AND c_nationkey = n_nationkey
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q1
    // pricing-summary shape: the HEAVY SCAN-AGG workload — no join at
    // all, one pass over the fact table into a 6-group aggregate. The
    // plan the key exists to pin: the date filter pushed into the
    // parquet scan, partial (map-side) aggregation before the one tiny
    // shuffle, and NO join/window anywhere. Money sums run in
    // DECIMAL(38,6) (exact, order-independent); averages are derived
    // from the decimal sums AFTER aggregation, never a float avg()
    // whose accumulation order could wiggle the hash. The oracle's
    // decimal→double casts route through VARCHAR
    // (CAST(CAST(x AS VARCHAR) AS DOUBLE)): once a sum's scaled
    // integer passes 2^53 (sum_charge did at 10× scale), DuckDB's
    // direct decimal→double DOUBLE-ROUNDS (int128→double, then ÷10^6)
    // while Spark's BigDecimal→double rounds the true rational once —
    // the string round-trip makes DuckDB parse the exact digits, which
    // is correctly rounded, matching Spark bit-for-bit at any
    // magnitude.
    QueryDef("q_tpch_q1",
      (s, d) => {
        val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val charge = disc * (lit(1.0) + col("l_tax"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast(D386)).as("dq"),
            sum(col("l_extendedprice").cast(D386)).as("dbp"),
            sum(disc.cast(D386)).as("ddp"),
            sum(charge.cast(D386)).as("dch"),
            sum(col("l_discount").cast(D386)).as("ddisc"),
            count(lit(1)).as("count_order"))
          .select(
            col("l_returnflag"), col("l_linestatus"),
            col("dq").cast(DoubleType).as("sum_qty"),
            col("dbp").cast(DoubleType).as("sum_base_price"),
            col("ddp").cast(DoubleType).as("sum_disc_price"),
            col("dch").cast(DoubleType).as("sum_charge"),
            (col("dq").cast(DoubleType) / col("count_order")).as("avg_qty"),
            (col("dbp").cast(DoubleType) / col("count_order")).as("avg_price"),
            (col("ddisc").cast(DoubleType) / col("count_order")).as("avg_disc"),
            col("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""WITH agg AS (
             |  SELECT l_returnflag, l_linestatus,
             |    sum(CAST(l_quantity AS DECIMAL(38,6))) AS dq,
             |    sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS dbp,
             |    sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(38,6))) AS ddp,
             |    sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
             |      AS DECIMAL(38,6))) AS dch,
             |    sum(CAST(l_discount AS DECIMAL(38,6))) AS ddisc,
             |    count(1) AS count_order
             |  FROM lineitem
             |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |  GROUP BY l_returnflag, l_linestatus
             |)
             |SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(dq AS VARCHAR) AS DOUBLE) AS sum_qty,
             |  CAST(CAST(dbp AS VARCHAR) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(ddp AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             |  CAST(CAST(dch AS VARCHAR) AS DOUBLE) AS sum_charge,
             |  CAST(CAST(dq AS VARCHAR) AS DOUBLE) / count_order AS avg_qty,
             |  CAST(CAST(dbp AS VARCHAR) AS DOUBLE) / count_order AS avg_price,
             |  CAST(CAST(ddisc AS VARCHAR) AS DOUBLE) / count_order AS avg_disc,
             |  count_order
             |FROM agg
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q6
    // the forecasting-revenue-change shape: ALL predicate, NO grouping —
    // the purest pushdown exercise in the suite. Every filter (date
    // range, discount band, quantity cap) sits directly on the parquet
    // scan, so row-group footer stats prune before a single row
    // decodes; what survives feeds one map-side-combinable global sum.
    // At 100 TB this query IS its scan: the plan must be scan → filter
    // → partial agg → 1-row exchange → final agg, nothing else
    // (PlanSpec pins no-join/no-window and the pushed filters). The
    // revenue sum runs in DECIMAL(38,6) like every money sum here;
    // dates use the fixture's 1996 window (synthetic shipdates span
    // 1995-2001, spec dates select nothing).
    QueryDef("q_tpch_q6",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice") * col("l_discount")).cast(D386))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT
             |  CAST(CAST(sum(CAST(l_extendedprice * l_discount
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             |  count(1) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q14
    // promo-revenue-share shape: a one-month fact slice joined to a dim
    // for a CONDITIONAL aggregate — the classic "what share of revenue
    // is X" report. The date range is the only selective predicate and
    // it sits on the parquet scan; `part` carries just (p_partkey,
    // p_type) into the join (dim-sized — the planner broadcasts it at
    // bench scale, and at 3B parts the same plan correctly
    // shuffle-joins); both sums run exact in DECIMAL(38,6) through ONE
    // map-side-combinable aggregate, so the shuffle after the join
    // carries two decimals + a count per partition, nothing row-sized.
    // The single float division happens once, identically written on
    // both engines, on the final 1-row frame. The fixture's p_type is a
    // flat category ('PROMO', not TPC-H's 'PROMO%...' prefixes), so the
    // predicate is equality rather than LIKE — same shape, same plan.
    QueryDef("q_tpch_q14",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast(D386).as("rev"))
        val pt = t(s, d, "part").select("p_partkey", "p_type")
        li.join(pt, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(lit(0).cast(D386))).as("dpromo"),
            sum(col("rev")).as("dall"),
            count(lit(1)).as("n_rows"))
          .select(
            round(lit(100.0) * col("dpromo").cast(DoubleType) /
              col("dall").cast(DoubleType), 6).as("promo_revenue"),
            col("n_rows"))
      },
      Some("""WITH agg AS (
             |  SELECT
             |    sum(CASE WHEN p_type = 'PROMO'
             |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
             |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS dpromo,
             |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS dall,
             |    count(1) AS n_rows
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |)
             |SELECT round(100.0 * CAST(CAST(dpromo AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(dall AS VARCHAR) AS DOUBLE), 6) AS promo_revenue,
             |  n_rows
             |FROM agg""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q18
    // large-volume-customer shape: orders whose total lineitem quantity
    // clears a HAVING threshold, joined back to customers, top-100 by
    // order value. The decomposition IS the scale design: the per-order
    // quantity aggregate (map-side-combinable, one fact shuffle by
    // orderkey) produces the qualified keylist WITH its total attached,
    // so lineitem is scanned once, not twice (the classic Q18 rewrite
    // of the `IN (GROUP BY ... HAVING)` subquery). The orders⋈qualified
    // join DISPATCHES ON THE MEASURED qualified-keylist size (round 16;
    // see tpchQ18): the threshold is a selectivity dial, so neither a
    // static broadcast (OOM when a lenient threshold qualifies millions
    // of orders) nor a static shuffle-merge (a measured 2× price when
    // the keylist is small — BASELINE.md round-16 audit) is right; the
    // keylist materializes once anyway, and its count makes the call.
    // `customer` stays with the size-based planner (broadcasts at bench
    // scale, correctly shuffle-joins at 3B customers), same policy as
    // q_tpch_q3.
    QueryDef("q_tpch_q18",
      (s, d) => tpchQ18(s, d),
      Some("""WITH qual AS (
             |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,6))) AS qsum
             |  FROM lineitem
             |  GROUP BY l_orderkey
             |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 250
             |)
             |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  CAST(CAST(qsum AS VARCHAR) AS DOUBLE) AS total_qty
             |FROM orders
             |JOIN qual ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 100""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q5
    // local-supplier-volume shape: the one classic shape Q3/Q10/Q18 do
    // not cover — TWO dim chains constrain the same fact rows (customer
    // AND supplier must both sit in the filtered region), tied together
    // by the non-key local-supplier equality c_nationkey = s_nationkey.
    // The plan the key pins, and why it holds at 100 TB:
    //   - region (5 rows) is explicitly broadcast into nation (25 rows),
    //     and the region-pruned nation (≤5 rows) explicitly broadcast
    //     into supplier — the dim chain collapses to a supplier-side
    //     semi-filter BEFORE any fact is touched;
    //   - orders carries the pushed date filter; lineitem⋈orders is the
    //     one fact-fact orderkey shuffle;
    //   - customer and the pruned supplier are left to the size-based
    //     planner (broadcast at bench scale; at 3B customers / 100M
    //     suppliers they correctly become shuffle joins — same policy
    //     as q_tpch_q3/q18);
    //   - the local-supplier predicate rides the supplier join as a
    //     second equi-key (suppkey, nationkey), not a post-join filter,
    //     so the join never materializes non-local pairs;
    //   - the final group-by is 5 nations — the agg is all map-side.
    QueryDef("q_tpch_q5",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1998-01-01").cast("timestamp")
        val nat = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val supp = t(s, d, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_nationkey", "n_name")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select("o_orderkey", "o_custkey")
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey
             |  AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q19
    // disjunctive-predicate shape: revenue over an OR of three
    // brand/size/quantity condition arms, each arm mixing columns from
    // BOTH join sides — the classic optimizer test that a cross-table
    // OR must not break equi-join extraction. The plan the key pins:
    // Catalyst still extracts `l_partkey = p_partkey` as the hash-join
    // key (part dim-sized → broadcast at bench scale, shuffle join at
    // 3B parts — the q3/q5/q18 policy) and evaluates the disjunction as
    // the join's residual condition, NEVER as a nested-loop or
    // cartesian plan; rows failing every arm die at the join, so the
    // aggregate sees only matches. The sum runs exact in DECIMAL(38,6)
    // (order-independent parallel agg), DOUBLE on the way out; the
    // count makes the single-row result self-evidencing. (Brand#4 /
    // quantity arms adapted to the synthetic domain: brands run
    // Brand#1..25, l_quantity 1..50.)
    QueryDef("q_tpch_q19",
      (s, d) => {
        val li = t(s, d, "lineitem").select(
          col("l_partkey"), col("l_quantity"), col("l_returnflag"),
          revenue.as("rev"))
        val pt = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
        val arms =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11) && col("l_returnflag") === "N") ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20) && col("l_returnflag") === "N") ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30))
        li.join(pt, col("l_partkey") === col("p_partkey") && arms)
          .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
             |  count(1) AS n_rows
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE
             |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             |    AND l_quantity BETWEEN 1 AND 11 AND l_returnflag = 'N')
             |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             |    AND l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'N')
             |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
             |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q4
    // order-priority-checking shape: the one classic form where the fact
    // table appears ONLY inside an EXISTS — a LEFT SEMI join, never a
    // row-multiplying inner join. (The synthetic lineitem has no
    // l_commitdate/l_receiptdate, so "committed late" is adapted to
    // "shipped >60 days after the order date" — same correlated
    // two-column predicate shape, same plan.) Why the plan holds at
    // 100 TB:
    //   - the 3-month o_orderdate window is pushed into the orders scan;
    //   - LEFT SEMI on orderkey means each order emits at most once no
    //     matter how many late lines it has — the join output is bounded
    //     by the filtered orders side, not by lineitem multiplicity;
    //   - the non-equi part (l_shipdate > o_orderdate + 60 days) rides
    //     the semi join as its residual, not a post-join filter;
    //   - the final agg is ≤5 priority groups — entirely map-side.
    QueryDef("q_tpch_q4",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val late = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        ord.join(late,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey
             |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q12
    // shipmode-priority shape: fact⋈fact join whose AGGREGATE does the
    // classification — conditional counts folding o_orderpriority into
    // high/low per lineitem class. (l_returnflag stands in for the
    // synthetic schema's missing l_shipmode; the year window sits on
    // l_shipdate for the missing l_receiptdate.) Plan at 100 TB:
    //   - the year filter is pushed into the lineitem scan, the slim
    //     3-column projections into both scans;
    //   - orders⋈lineitem is the unavoidable fact-fact orderkey shuffle
    //     (same exchange policy as Q3/Q18 — no broadcast of a fact);
    //   - both CASE sums are plain long arithmetic inside one
    //     map-side-combinable hash agg over ≤3 groups.
    QueryDef("q_tpch_q12",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select("l_orderkey", "l_returnflag")
        val ord = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q7
    // volume-shipping shape: the DOUBLE-DIM-CHAIN workload — the same
    // `nation` dim joins the fact pipeline TWICE under different roles
    // (supplier's nation, customer's nation) with a symmetric pair
    // predicate, plus a year extraction feeding the group-by. Plan
    // contract: both nation dims broadcast; supplier/customer pre-join
    // their (pre-FILTERED, two rows) nation dim so the selective
    // two-nation cut prunes each side BEFORE touching the fact-fact
    // orderkey shuffle; the ship-date window pushes into the lineitem
    // scan; the symmetric pair filter runs on the two tiny attached
    // nation columns after the joins (it needs both sides, so it cannot
    // push deeper). Revenue sums run exact in DECIMAL(38,6).
    QueryDef("q_tpch_q7",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1998-01-01").cast("timestamp")
        val two = Seq("NATION_1", "NATION_2")
        val n1 = t(s, d, "nation").filter(col("n_name").isin(two: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").filter(col("n_name").isin(two: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .select("s_suppkey", "supp_nation")
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .select("c_custkey", "cust_nation")
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            revenue.as("vol"))
        val ord = t(s, d, "orders").select("o_orderkey", "o_custkey")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum(col("vol")).cast(DoubleType).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |    CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(38,6)) AS volume
             |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
             |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
             |    AND c_custkey = o_custkey
             |    AND s_nationkey = n1.n_nationkey
             |    AND c_nationkey = n2.n_nationkey
             |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |) shipping
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q8
    // market-share shape: the FIVE-JOIN conditional-ratio workload —
    // part/region cuts prune the fact rows, every surviving lineitem
    // carries its supplier's nation, and the answer is a per-year ratio
    // of one nation's volume to all volume. Plan contract: the region→
    // nation→customer chain collapses into broadcast dims feeding the
    // customer join (region cut applied INSIDE the dim, so the ASIA
    // filter never touches a fact row); part is a dim-sized broadcast
    // with its type filter pushed to its scan; the order-date window
    // pushes into the orders scan; ONE aggregation computes both the
    // NATION_7 numerator and the total in the same pass (no second
    // scan); the single float division runs on the final per-year rows,
    // written identically on both engines.
    QueryDef("q_tpch_q8",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1998-01-01").cast("timestamp")
        val reg = t(s, d, "region").filter(col("r_name") === "ASIA")
          .select("r_regionkey")
        val natAsia = t(s, d, "nation")
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk"))
        val natAll = t(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
        val pt = t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .select("p_partkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(natAsia), col("c_nationkey") === col("c_nk"))
          .select("c_custkey")
        val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(natAll), col("s_nationkey") === col("s_nk"))
          .select("s_suppkey", "nation")
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revenue.as("vol"))
        li.join(pt, col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy("o_year")
          .agg(
            sum(when(col("nation") === "NATION_7", col("vol"))
              .otherwise(lit(0).cast(D386))).as("dn"),
            sum(col("vol")).as("dall"))
          .select(col("o_year"),
            round(col("dn").cast(DoubleType) / col("dall").cast(DoubleType), 6)
              .as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""WITH all_nations AS (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |    CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(38,6)) AS volume,
             |    n2.n_name AS nation
             |  FROM part, supplier, lineitem, orders, customer,
             |    nation n1, nation n2, region
             |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
             |    AND c_nationkey = n1.n_nationkey
             |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
             |    AND s_nationkey = n2.n_nationkey
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |    AND p_type = 'ECONOMY'
             |), agg AS (
             |  SELECT o_year,
             |    sum(CASE WHEN nation = 'NATION_7' THEN volume
             |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS dn,
             |    sum(volume) AS dall
             |  FROM all_nations GROUP BY o_year
             |)
             |SELECT o_year,
             |  round(CAST(dn AS DOUBLE) / CAST(dall AS DOUBLE), 6) AS mkt_share
             |FROM agg ORDER BY o_year""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q13
    // customer-order-distribution shape: the OUTER-JOIN double-agg
    // workload — every customer kept (including the order-less ones, the
    // rows an inner join would silently drop), orders filtered BY A JOIN
    // CONDITION (not a WHERE — the filter must not turn the outer join
    // inner), then counts-of-counts. Plan contract: one shuffle on
    // custkey for the outer join (both sides fact-sized at scale — no
    // broadcast assumption), count(o_orderkey) ignores the NULLs the
    // outer join manufactures, and the second aggregation runs on the
    // already-customer-grain frame (|customers| rows, map-side
    // combinable). The priority cut stands in for TPC-H's o_comment
    // NOT LIKE filter (no comment column in the fixture; same
    // join-condition placement, same semantics).
    QueryDef("q_tpch_q13",
      (s, d) => {
        val cust = t(s, d, "customer").select("c_custkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, CAST(count(1) AS BIGINT) AS custdist
             |FROM (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey
             |) c_orders
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q15
    // top-supplier shape: an aggregate-derived view joined against its
    // OWN maximum — the "who hit the global best" report. Plan contract:
    // the revenue view computes ONCE into the plan (Spark evaluates the
    // 1-row max aggregate as a broadcast side, not a rescan of
    // lineitem... the view subtree does appear twice in the unshared
    // plan, but both subtrees sit behind the same pushed 3-month scan —
    // the classic Q15 shape); the revenue equality compares exact
    // DECIMAL(38,6) sums, so "ties for the top" are exact on both
    // engines, never a float epsilon; supplier attaches as a broadcast
    // dim after the 1-row filter.
    QueryDef("q_tpch_q15",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1996-04-01").cast("timestamp")
        def rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(revenue).as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("mx"))
        rev.join(broadcast(mx), col("total_revenue") === col("mx"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("supplier_no") === col("s_suppkey"))
          .select(col("supplier_no"), col("s_name"),
            col("total_revenue").cast(DoubleType).as("total_revenue"))
          .orderBy("supplier_no")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supplier_no,
             |    sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(38,6))) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY 1
             |)
             |SELECT supplier_no, s_name,
             |  CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE) AS total_revenue
             |FROM rev JOIN supplier ON supplier_no = s_suppkey
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY supplier_no""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q22
    // global-customer-analysis shape: a scalar AGGREGATE SUBQUERY
    // (corpus-wide average balance) feeding a filter, an ANTI join
    // against a filtered fact subset, then a dim-grouped report. The
    // priority cut stands in for TPC-H's country-code IN list (no phone
    // column in the fixture): above-average-balance customers who never
    // placed an URGENT order. Plan contract: the average collapses to a
    // 1-row broadcast (computed as exact-decimal-sum / count, identical
    // expression text on both engines — never a float avg() whose
    // accumulation order wiggles the comparison); the anti join runs as
    // a LEFT ANTI hash join on custkey with the priority filter pushed
    // into the orders scan; nation broadcasts for the final group-by.
    QueryDef("q_tpch_q22",
      (s, d) => {
        val cust = t(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val avgRow = cust.filter(col("c_acctbal") > 0)
          .agg((sum(col("c_acctbal").cast(D386)).cast(DoubleType) /
            count(lit(1))).as("avg_bal"))
        val urgent = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        cust.join(broadcast(avgRow))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(D386)).cast(DoubleType).as("totacctbal"))
          .orderBy("n_name")
      },
      Some("""WITH avg_bal AS (
             |  SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR)
             |        AS DOUBLE)
             |      / count(1) AS avg_bal
             |  FROM customer WHERE c_acctbal > 0
             |)
             |SELECT n_name, CAST(count(1) AS BIGINT) AS numcust,
             |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR)
             |    AS DOUBLE) AS totacctbal
             |FROM customer, nation, avg_bal
             |WHERE c_nationkey = n_nationkey
             |  AND c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey
             |      AND o_orderpriority = '1-URGENT')
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q17
    // small-quantity-order revenue: a CORRELATED per-part average feeding
    // a filter on the same fact rows (the fixture has no p_container, so
    // the brand cut alone selects the part family). The classic plan
    // trap here is re-scanning lineitem for the correlated subquery; the
    // engine form computes the per-part quantity cap FROM THE SAME
    // brand-joined subset (identical semantics: the subquery's partkeys
    // are exactly the brand's partkeys) and joins it back — at 100 TB
    // that is: one broadcast of the brand-filtered part dim, one shuffle
    // of its lineitems by partkey for the cap agg, and a broadcast of
    // the caps (parts-per-brand-sized) back onto the subset. Cross-
    // engine determinism: the cap avg is exact-decimal-sum → DOUBLE /
    // count * 0.2 — identical expression text on both engines (never a
    // float avg() whose accumulation order wiggles boundary rows).
    QueryDef("q_tpch_q17",
      (s, d) => {
        val brandParts = t(s, d, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val li = t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        val caps = li.groupBy(col("l_partkey").as("cap_partkey"))
          .agg(((sum(col("l_quantity").cast(D386)).cast(DoubleType) /
            count(lit(1))) * 0.2).as("qty_cap"))
        li.join(broadcast(caps), col("l_partkey") === col("cap_partkey"))
          .filter(col("l_quantity") < col("qty_cap"))
          .agg((sum(col("l_extendedprice").cast(D386)).cast(DoubleType) / 7.0)
            .as("avg_yearly"))
      },
      Some("""WITH f AS (
             |  SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_brand = 'Brand#23'
             |), caps AS (
             |  SELECT l_partkey,
             |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
             |        AS DOUBLE)
             |      / count(1) * 0.2 AS qty_cap
             |  FROM f GROUP BY 1
             |)
             |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
             |    AS DOUBLE) / 7.0 AS avg_yearly
             |FROM f JOIN caps USING (l_partkey)
             |WHERE l_quantity < qty_cap""".stripMargin)),

    // ------------------------------------------------- market basket
    // frequent part PAIRS co-purchased in one order — the co-occurrence
    // mining shape (FP-growth's level-2 slice, also the co-citation /
    // co-click pattern). Engine form: ONE orderkey shuffle collects each
    // basket's distinct sorted parts (collect_set dedupes line-level
    // repeats in the agg buffer, map-side combined), pairs explode
    // ROW-LOCALLY from the basket array (transform×slice — C(basket, 2)
    // output per order, quadratic in BASKET SIZE, never in corpus size),
    // then the pair counts hash-aggregate and the support floor prunes
    // the unique-pair tail before the bounded top-k. Two rejected
    // shapes, both measured at sf0.1: a distinct-items SELF-JOIN by
    // orderkey (2.8 s — 5 corpus-sized exchanges; the join buys nothing
    // because one basket's pairs never need another basket's data) and
    // a nested-HOF flatten(transform(transform)) explode (1.8 s — the
    // lambda tree evaluates interpreted). The double GENERATE below
    // (posexplode anchors p1, explode(slice) yields its successors)
    // stays inside codegen and lands at ~1.0 s. The one unbounded risk
    // is a pathological mega-basket; `maxBasket` drops baskets over
    // 1000 items right after the size is known (a documented coverage
    // cut, mirrored in the oracle; fixture max is 13) so the quadratic
    // explode never runs on one. Deterministic top-k: (n desc, p1, p2)
    // is a total order.
    QueryDef("q_basket_pairs",
      (s, d) => {
        val maxBasket = 1000
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey")
          .groupBy("l_orderkey")
          .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
          .filter(size(col("parts")) <= maxBasket)
          .select(col("parts"), posexplode(col("parts")))
          .select(col("col").as("p1"),
            explode(slice(col("parts"), col("pos") + lit(2),
              size(col("parts")))).as("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 2)
          .orderBy(col("n_orders").desc, col("p1"), col("p2"))
          .limit(25)
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             |), ok AS (
             |  SELECT l_orderkey, l_partkey FROM items
             |  WHERE l_orderkey IN (
             |    SELECT l_orderkey FROM items
             |    GROUP BY 1 HAVING count(1) <= 1000)
             |)
             |SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             |  CAST(count(1) AS BIGINT) AS n_orders
             |FROM ok a JOIN ok b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |GROUP BY 1, 2 HAVING count(1) >= 2
             |ORDER BY n_orders DESC, p1, p2
             |LIMIT 25""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q2
    // minimum-cost-supplier shape: the CORRELATED MIN subquery — for each
    // qualifying part, keep only the supplier(s) whose offer hits that
    // part's regional minimum. The fixture has no partsupp table, so the
    // supply catalog derives from lineitem history: a (part, supplier)
    // pair's offered cost is its minimum observed unit price
    // (l_extendedprice / l_quantity — pure IEEE double division, bit-
    // identical in both engines; min is selection, never accumulation,
    // so the join-back EQUALITY on the min is exact). Plan contract:
    // part and the EUROPE supplier roster are dims (broadcast after
    // their pushed filters), the only fact-sized shuffle is the
    // (partkey, suppkey) min-agg, and the per-part best-cost table —
    // at most |part| rows — broadcasts back onto it. At 100 TB the
    // catalog agg is the bottleneck and it is one map-side-combinable
    // pass over lineitem; nothing downstream touches the fact again.
    QueryDef("q_tpch_q2",
      (s, d) => {
        val euSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val pp = t(s, d, "part")
          .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        val cost = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .join(broadcast(euSupp.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        val best = cost.groupBy(col("l_partkey").as("bp"))
          .agg(min(col("unit_cost")).as("best_cost"))
        cost.join(broadcast(best),
            col("l_partkey") === col("bp") && col("unit_cost") === col("best_cost"))
          .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("unit_cost").as("supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH eu_supp AS (
             |  SELECT s_suppkey, s_name, s_acctbal, n_name
             |  FROM supplier, nation, region
             |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |    AND r_name = 'EUROPE'
             |), pp AS (
             |  SELECT p_partkey, p_name FROM part
             |  WHERE p_size <= 15 AND p_type = 'STANDARD'
             |), cost AS (
             |  SELECT l_partkey, l_suppkey,
             |    min(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem JOIN pp ON p_partkey = l_partkey
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM eu_supp)
             |  GROUP BY 1, 2
             |), best AS (
             |  SELECT l_partkey AS bp, min(unit_cost) AS best_cost
             |  FROM cost GROUP BY 1
             |)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             |  unit_cost AS supplycost
             |FROM cost
             |  JOIN best ON l_partkey = bp AND unit_cost = best_cost
             |  JOIN eu_supp ON l_suppkey = s_suppkey
             |  JOIN pp ON l_partkey = p_partkey
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // ---------------------------------------------------------- TPC-H Q9
    // product-type-profit shape: the WIDEST join in the suite — lineitem
    // against part (LIKE-filtered), supplier, its nation, and orders
    // (for the year), grouped by (nation, year). The fixture carries no
    // ps_supplycost; the stand-in cost is 60% of the part's retail price
    // (a per-part constant, so the profit expression stays a row-local
    // arithmetic over the joined frame, exactly Q9's shape). Plan
    // contract: part/supplier/nation broadcast behind pushed filters,
    // the orders⋈lineitem orderkey shuffle is the one fact-fact
    // exchange, profit is summed in DECIMAL(38,6) from identical
    // per-row double expressions (cast text identical in both engines),
    // and the output group count is |nation|×|years| — tiny.
    QueryDef("q_tpch_q9",
      (s, d) => {
        val pp = t(s, d, "part")
          .filter(col("p_name").like("%gear%"))
          .select("p_partkey", "p_retailprice")
        val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        val ord = t(s, d, "orders").select("o_orderkey", "o_orderdate")
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
              lit(0.6) * col("p_retailprice") * col("l_quantity")).cast(D386))
            .cast(DoubleType).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
             |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      - 0.6 * p_retailprice * l_quantity
             |    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_profit
             |FROM part, supplier, lineitem, orders, nation
             |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
             |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
             |  AND p_name LIKE '%gear%'
             |GROUP BY 1, 2
             |ORDER BY nation, o_year DESC""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q11
    // important-stock shape: a grouped value table filtered by a SCALAR
    // subquery over ITSELF (value > fraction × grand total). Without
    // partsupp, a part's "stock value" held by NATION_7's suppliers is
    // the summed extended price of their shipments of it. Determinism
    // contract: per-part values sum in DECIMAL(38,6) (exact, order-free);
    // the grand total is the exact decimal sum-of-sums cast to DOUBLE
    // ONCE, then scaled by 0.001 in double — identical arithmetic text
    // both sides of the oracle. Plan contract: nation cut broadcasts
    // into supplier, supplier roster broadcasts into the fact scan, ONE
    // partkey shuffle builds the value table, and the 1-row total joins
    // back as a broadcast — the value table itself never re-shuffles.
    QueryDef("q_tpch_q11",
      (s, d) => {
        val supp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_7").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val vals = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("ps_partkey"))
          .agg(sum(col("l_extendedprice").cast(D386)).as("vdec"))
        // scale-invariant cut: 2× the average per-part share (a fixed
        // fraction of the total goes to zero rows as the part catalog
        // grows — TPC-H's own Q11 scales its fraction by 1/SF for the
        // same reason). count+sum ride one agg; still a 1-row broadcast.
        val total = vals.agg((sum(col("vdec")).cast(DoubleType) * lit(2.0) /
          count(lit(1))).as("threshold"))
        vals.join(broadcast(total))
          .filter(col("vdec").cast(DoubleType) > col("threshold"))
          .select(col("ps_partkey"), col("vdec").cast(DoubleType).as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some("""WITH vals AS (
             |  SELECT l_partkey AS ps_partkey,
             |    sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS vdec
             |  FROM lineitem, supplier, nation
             |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |    AND n_name = 'NATION_7'
             |  GROUP BY 1
             |)
             |SELECT ps_partkey, CAST(CAST(vdec AS VARCHAR) AS DOUBLE) AS value
             |FROM vals
             |WHERE CAST(CAST(vdec AS VARCHAR) AS DOUBLE) >
             |  (SELECT CAST(CAST(sum(vdec) AS VARCHAR) AS DOUBLE) * 2.0
             |   / count(1) FROM vals)
             |ORDER BY value DESC, ps_partkey""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q16
    // parts/supplier-relationship shape: DISTINCT-supplier counts per
    // part family, minus an excluded supplier set via NOT IN (the
    // fixture has no s_comment complaints column; suppliers in arrears —
    // negative balance — play the excluded set, same anti-join shape).
    // Plan contract: both part cuts and the size IN-list push into the
    // part scan; the exclusion list is a broadcast LEFT ANTI (its NOT IN
    // is safe to plan as anti: s_suppkey is non-null by construction);
    // count(DISTINCT) runs as the standard two-level expand-agg, keyed
    // by the (brand, type, size) family — group count is bounded by the
    // family combinatorics, not the fact.
    QueryDef("q_tpch_q16",
      (s, d) => {
        val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
        val pp = t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(sizes: _*))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        val bad = t(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
             |  AND l_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q20
    // potential-part-promotion shape: a supplier roster filtered by a
    // nested SEMI JOIN against an aggregated fact subset — "which
    // NATION_3/NATION_7 suppliers moved real volume of small parts in
    // 1996". (partsupp's availqty threshold becomes a shipped-quantity
    // threshold over the same nested-IN structure.) Plan contract: the
    // part LIKE cut broadcasts into the fact scan, the year window
    // pushes to parquet, the HAVING-filtered supplier list — at most
    // |supplier| rows — broadcasts as a LEFT SEMI onto the nation-cut
    // roster. The fact is touched once, pre-aggregated by suppkey
    // before any join against supplier.
    QueryDef("q_tpch_q20",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1997-01-01").cast("timestamp")
        val smallParts = t(s, d, "part")
          .filter(col("p_name").like("small%")).select("p_partkey")
        val movers = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .select("l_partkey", "l_suppkey", "l_quantity")
          .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(sum(col("l_quantity").cast(D386)).as("qty"))
          .filter(col("qty") > 100)
          .select("l_suppkey")
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name").isin("NATION_3", "NATION_7"))
            .select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(movers), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select("s_suppkey", "s_name", "s_acctbal")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal
             |FROM supplier, nation
             |WHERE s_nationkey = n_nationkey
             |  AND n_name IN ('NATION_3', 'NATION_7')
             |  AND s_suppkey IN (
             |    SELECT l_suppkey
             |    FROM lineitem JOIN part ON p_partkey = l_partkey
             |    WHERE p_name LIKE 'small%'
             |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |    GROUP BY 1
             |    HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 100)
             |ORDER BY s_suppkey""".stripMargin)),

    // --------------------------------------------------------- TPC-H Q21
    // suppliers-who-kept-orders-waiting shape: the DOUBLE-CORRELATED
    // exists/not-exists over the same fact — blame the supplier who was
    // the SOLE straggler on a multi-supplier finished order. The fixture
    // has no receipt/commit dates, so "late" is defined on l_shipdate:
    // a supplier is blamed for an order iff the order is 'F', at least
    // one OTHER supplier fed it (the EXISTS), and no other supplier
    // shipped as late as they did (the NOT EXISTS — i.e. they alone hit
    // the order's max ship date). Engine form replaces the two
    // correlated probes with order-grain aggregates: per-(order,
    // supplier) max ship date (ONE fact shuffle), then per-order
    // (max, supplier count, winner count) — order-grain tables that
    // join back on orderkey. At 100 TB every post-shuffle frame is
    // order- or supplier-grain; the correlated-subquery form would
    // rescan lineitem twice. Exact timestamp equality stands in for
    // the correlation predicates — selection, not arithmetic.
    QueryDef("q_tpch_q21",
      (s, d) => {
        val os = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("l_shipdate")).as("s_max"))
        // the per-order facts (max, supplier count, winner count) come
        // from WINDOW aggregates over the (order, supplier)-grain frame
        // — one orderkey partitioning serves all three; the first
        // formulation joined three separate aggregations of `os` and
        // re-ran the lineitem⋈orders build each time (measured 1.6 s →
        // this shape 3 windows, one exchange). Partitions are per-order
        // (bounded by suppliers-per-order), so no skew risk.
        val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
        os.withColumn("o_max", max(col("s_max")).over(w))
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_win",
            sum(when(col("s_max") === col("o_max"), 1L).otherwise(0L)).over(w))
          .filter(col("s_max") === col("o_max") && col("n_supp") >= 2 &&
            col("n_win") === 1)
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH os AS (
             |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  WHERE o_orderstatus = 'F'
             |  GROUP BY 1, 2
             |), per_order AS (
             |  SELECT l_orderkey AS ok, max(s_max) AS o_max,
             |    count(1) AS n_supp
             |  FROM os GROUP BY 1
             |), winners AS (
             |  SELECT os.l_orderkey AS wk, count(1) AS n_win
             |  FROM os JOIN per_order ON l_orderkey = ok AND s_max = o_max
             |  GROUP BY 1
             |)
             |SELECT s_name, CAST(count(1) AS BIGINT) AS numwait
             |FROM os
             |  JOIN per_order ON os.l_orderkey = ok AND os.s_max = o_max
             |    AND n_supp >= 2
             |  JOIN winners ON os.l_orderkey = wk AND n_win = 1
             |  JOIN supplier ON s_suppkey = os.l_suppkey
             |GROUP BY 1
             |ORDER BY numwait DESC, s_name
             |LIMIT 100""".stripMargin))
  )
}
