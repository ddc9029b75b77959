package graft.connector

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.warehouse.Tables

/** The read side of the connector — the Spark-native re-expression of
  * `read_snowflake(query, ...)` (dask_snowflake/core.py:200-302).
  *
  * The reference pushes the SQL string verbatim to the warehouse
  * (core.py:143), receives lazy Arrow batch handles, and re-packs them into
  * right-sized partitions fetched in parallel on the cluster. Here Spark is
  * both the warehouse and the cluster: `spark.sql` plans the query against
  * the parquet views, Catalyst pushes filters/projection into the scan, and
  * executors fetch their own partitions — the reference's "parallel fetch"
  * data plane is Spark's normal scan execution. What remains of the
  * connector is the partition-management surface, reproduced here:
  *
  *   - exactly-one-of `npartitions` / `partitionSize`, default "100 MiB"
  *     (core.py:164-167, 259-260) — validated by [[Partitioner.resolveSpec]]
  *   - parameterized queries (`execute_params`, core.py:143) → Spark's
  *     named-parameter SQL API (injection-safe engine-side binding)
  *   - count mode → exact partition count; size mode → partition count
  *     derived from the plan's size estimate (the analogue of the
  *     reference's sampled row width, core.py:172-179)
  *
  * Scale note: reducing partition counts uses `coalesce` (no shuffle — at
  * 100 TB a shuffle just to resize partitions would dominate the query);
  * only a genuine increase pays `repartition`'s round-robin shuffle.
  */
object Read {

  /** Execute `query` over the `sfDir` warehouse and size the result
    * partitions. Mirrors `read_snowflake`'s signature semantics.
    *
    * Empty results: the reference degrades to a ZERO-COLUMN DataFrame
    * (`dd.from_pandas(pd.DataFrame(), npartitions=1)`, core.py:277-278,
    * asserted test_core.py:78-80) because its schema is inferred from the
    * first non-empty Arrow batch and an empty result has none. Spark
    * always knows the analyzed schema, so the DELIBERATE default here is
    * schema-preserving: an empty result keeps its columns, and downstream
    * code can union/join it without special-casing. Pass
    * `emptyAsZeroColumns = true` for the reference's exact degrade (costs
    * one isEmpty probe job when enabled). Both pinned in ConnectorSpec. */
  def readTable(
      spark: SparkSession,
      sfDir: String,
      query: String,
      params: Map[String, Any] = Map.empty,
      npartitions: Option[Int] = None,
      partitionSize: Option[String] = None,
      emptyAsZeroColumns: Boolean = false): DataFrame = {
    Tables.register(spark, sfDir)
    val (countMode, sizeMode) = Partitioner.resolveSpec(npartitions, partitionSize)
    val df =
      if (params.isEmpty) spark.sql(query)
      else spark.sql(query, params)
    // repartition(1): emptyDataFrame has ZERO partitions, the reference
    // degrades to exactly npartitions=1 (core.py:278)
    if (emptyAsZeroColumns && df.isEmpty) return spark.emptyDataFrame.repartition(1)
    countMode match {
      case Some(n) => resize(df, n)
      case None    => resize(df, partitionsForBytes(df, sizeMode.get))
    }
  }

  /** Target partition count for size mode: the optimized plan's size
    * estimate over the requested partition bytes. Catalyst's estimate plays
    * the role of the reference's `meta.memory_usage()` row-width sample
    * (core.py:178) — both are approximations; the reference's own tests
    * only assert a 2× tolerance (test_core.py:301-302). */
  def partitionsForBytes(df: DataFrame, targetBytes: Long): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + targetBytes - 1) / targetBytes
    n.max(1).min(Int.MaxValue).toInt
  }

  /** Shuffle-free when shrinking; round-robin repartition only to grow. */
  private def resize(df: DataFrame, n: Int): DataFrame = {
    val cur = df.rdd.getNumPartitions
    if (n < cur) df.coalesce(n)
    else if (n > cur) df.repartition(n)
    else df
  }
}
