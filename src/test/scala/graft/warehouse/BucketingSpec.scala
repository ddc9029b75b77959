package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing — the co-located-join tool from the 100 TB design contract
  * (SURVEY §2 Tier B "broadcast … bucketing for co-located joins"): two
  * tables bucketed on the join key join WITHOUT any shuffle Exchange,
  * because bucket layout already satisfies the join's distribution
  * requirement. At warehouse scale this is the difference between
  * re-shuffling 100 TB per join and reading co-located buckets. */
class BucketingSpec extends SparkSpec {

  test("join on bucketed tables runs without a shuffle Exchange") {
    val suffix = System.nanoTime()
    val ordersT = s"B_ORDERS_$suffix"
    val customerT = s"B_CUSTOMER_$suffix"
    Tables.table(spark, sfDir, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable(ordersT)
    Tables.table(spark, sfDir, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable(customerT)

    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(ordersT)
        .join(spark.table(customerT), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan should be bucket-aware:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
