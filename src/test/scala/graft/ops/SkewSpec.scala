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
}
