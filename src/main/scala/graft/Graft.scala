package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.SizeEstimator

import graft.connector.{Read, Write}

/** The user-facing API — the Spark-native twin of the reference's two
  * public functions (dask_snowflake/__init__.py:3 exports exactly
  * `read_snowflake` and `to_snowflake`):
  *
  * | reference                                         | here                       |
  * |---------------------------------------------------|----------------------------|
  * | `read_snowflake(query, connection_kwargs, ...)`   | [[read]]                   |
  * | `to_snowflake(df, name, ...)`                     | [[write]]                  |
  * | `to_snowflake(..., compute=False)`                | [[writeDeferred]]          |
  * | `arrow_options={"types_mapper": ...}` cast layer  | [[castAll]]                |
  * | `df.memory_usage_per_partition()` (test surface)  | [[memoryUsagePerPartition]]|
  * | `df.npartitions`                                  | [[npartitions]]            |
  *
  * `connection_kwargs` has no analogue: the warehouse is the local parquet
  * directory (`sfDir`), registered as views — Spark is both the cluster
  * and the SQL engine, so the reference's four network hops (SURVEY §3.1)
  * collapse into one distributed scan.
  */
object Graft {

  /** Distributed read of a SQL query result, partition-managed like
    * `read_snowflake` (exactly one of `npartitions`/`partitionSize`;
    * neither → 100 MiB size mode). */
  def read(
      spark: SparkSession,
      sfDir: String,
      query: String,
      params: Map[String, Any] = Map.empty,
      npartitions: Option[Int] = None,
      partitionSize: Option[String] = None): DataFrame =
    Read.readTable(spark, sfDir, query, params, npartitions, partitionSize)

  /** Distributed write, `to_snowflake` semantics (uppercased table,
    * schema-first DDL, parallel per-partition append). */
  def write(df: DataFrame, name: String, overwrite: Boolean = false): Unit =
    Write.toTable(df, name, overwrite)

  /** `compute=False`: the write as an unexecuted thunk; DDL still eager
    * (the reference wart, core.py:116 — preserved deliberately). */
  def writeDeferred(df: DataFrame, name: String): () => Unit =
    Write.toTableDeferred(df, name)

  /** The `arrow_options.types_mapper` analogue (test_core.py:106-123):
    * cast every column to `to` after the read. */
  def castAll(df: DataFrame, to: DataType): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c =>
      org.apache.spark.sql.functions.col(c).cast(to).as(c)): _*)

  /** Per-partition in-memory size estimate —
    * `df.memory_usage_per_partition()` (test_core.py:301). Distributed:
    * one estimate per task, only the Long sizes come back. One
    * SizeEstimator call per partition, so the shared schema object graph
    * every GenericRowWithSchema references is counted once per partition
    * (a per-row estimate would re-count it N times and grossly inflate). */
  def memoryUsagePerPartition(df: DataFrame): Seq[Long] =
    df.rdd.mapPartitions { it =>
      Iterator.single(SizeEstimator.estimate(it.toArray: AnyRef))
    }.collect().toIndexedSeq

  /** `df.npartitions` (test_core.py:88, 310). */
  def npartitions(df: DataFrame): Int = df.rdd.getNumPartitions

  /** Partner-application tagging (core.py:27-30, 49-52; 4 of the
    * reference's 10 tests): the reference injects
    * `application=dask.config.get("snowflake.partner", "dask")` into every
    * warehouse connection, resolved cluster-side. Spark's analogue of a
    * per-connection tag is the job group/description every task carries;
    * the config source is `spark.conf` (broadcast to executors), override
    * beats config beats default — same precedence as the reference. */
  val PartnerConfKey = "spark.graft.partner"
  val DefaultPartner = "graft"

  def partnerTag(spark: SparkSession, explicit: Option[String] = None): String =
    explicit.getOrElse(spark.conf.getOption(PartnerConfKey).getOrElse(DefaultPartner))

  /** Run `body` with every spawned job tagged for the warehouse audit
    * trail — the observable surface the reference's connection-counting
    * tests monkeypatch (test_core.py:149-261). */
  def withPartnerTag[T](spark: SparkSession, explicit: Option[String] = None)
      (body: => T): T = {
    val sc = spark.sparkContext
    val tag = partnerTag(spark, explicit)
    sc.setJobGroup(s"graft.partner=$tag", s"application=$tag", false)
    try body
    finally sc.clearJobGroup()
  }
}
