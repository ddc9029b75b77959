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
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
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
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |  AND l_returnflag = 'R'
             |  AND c_nationkey = n_nationkey
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin))
  )
}
