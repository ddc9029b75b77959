package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's OWN runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * `InjectRuntimeFilter` optimizer rule plants automatically when a
  * shuffle join qualifies). Spark keeps them out of the public function
  * registry because the rule is supposed to be the only caller; graft
  * registers them under `graft_` names so a query can build the SAME
  * prefilter EXPLICITLY — the 100 TB pattern where you know the dim-side
  * predicate is selective and don't want to depend on the optimizer's
  * stats-based thresholds (`runtime.bloomFilter.creationSideThreshold`,
  * `applicationSideScanSizeThreshold`) seeing through them. Both hash
  * through XxHash64 inside the builder, so callers pass raw key columns:
  *
  *   graft_bloom_agg(key, est_items, num_bits)   -- binary bloom (agg)
  *   graft_might_contain(bloom, key)             -- boolean probe
  *
  * `graft_might_contain`'s bloom argument must be CONSTANT — a literal
  * or a scalar subquery — because the expression deserializes the filter
  * once per task, not per row (Spark's own analysis-time check enforces
  * this; a join-produced bloom column is rejected at planning).
  */
object BloomPrefilter {

  private[functions] val aggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_bloom_agg expects (key, est_items, num_bits), got ${exprs.length}")
    new BloomFilterAggregate(new XxHash64(Seq(exprs.head)), exprs(1), exprs(2))
      .toAggregateExpression()
  }

  private[functions] val probeBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_might_contain expects (bloom, key), got ${exprs.length}")
    BloomFilterMightContain(exprs.head, new XxHash64(Seq(exprs(1))))
  }

  /** Register both functions on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      aggBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      probeBuilder)
  }
}
