package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.warehouse.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in `graft.ops.*` / `graft.connector.*`;
  * each contributes a Seq[QueryDef] (Spark fn + optional DuckDB oracle SQL)
  * assembled here.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    ops.Relational.defs ++ ops.Temporal.defs ++ connector.ConnectorQueries.defs ++
      ops.Text.defs ++ ops.Dedup.defs ++ ops.Vector.defs ++ ops.Multimodal.defs ++
      ops.Workload.defs ++ ops.Graph.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter (pushed to parquet) → partial+final
    * hash aggregate → tiny sorted result.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = DecimalType(38, 6)
    Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(d)).as("sum_qty"),
        sum(col("l_extendedprice").cast(d)).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.key -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
