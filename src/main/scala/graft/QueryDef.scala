package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (optionally) the
  * DuckDB-runnable ANSI-SQL oracle that must hash-match it.
  *
  * Contract (see SURVEY.md §5.2): the Spark result and the oracle result
  * must agree on column names, column types, row values AND row order —
  * so every query ends in a total ORDER BY over a unique key, derived
  * integer columns are cast to BIGINT on both sides, and money aggregates
  * go through DECIMAL(38,6) on both sides.
  */
final case class QueryDef(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
