package graft.warehouse

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the local parquet warehouse (`sfDir`) as temp views, once per
  * (session, dir). This plays the role Snowflake plays in the reference
  * (dask_snowflake/core.py:143 passes SQL verbatim to the warehouse); here
  * the "warehouse" is Spark SQL + Catalyst over these views, so predicate
  * pushdown / column pruning reach the parquet scan natively.
  *
  * Registration reads only the parquet footer (schema), no data; repeated
  * calls with the same dir are a cheap hash-map hit — important because
  * every `SparkEntry.queries` fn calls this and Bench times each call.
  */
object Tables {

  /** All warehouse tables (TESTDATA.md / FIXTURES.md §2). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // session identity -> sfDir currently registered for it
  private val registered = new ConcurrentHashMap[Int, String]()

  def register(spark: SparkSession, sfDir: String): Unit = {
    val k = System.identityHashCode(spark)
    if (registered.get(k) != sfDir) synchronized {
      if (registered.get(k) != sfDir) {
        // events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        // rejects; read nanos as raw long and truncate to µs — exactly
        // what DuckDB (the oracle) does when it coerces ns → TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        all.foreach { t =>
          val p = s"$sfDir/$t.parquet"
          if (Files.exists(Paths.get(p))) {
            val raw = spark.read.parquet(p)
            val df =
              if (raw.schema.fields.exists(f =>
                  f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
                raw.withColumn("ts",
                  org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
              else raw
            df.createOrReplaceTempView(t)
          }
        }
        registered.put(k, sfDir) // before prestage: its table() calls re-enter
        // Stage the DSv2 write-then-read fixtures up front (idempotent).
        // This runs inside the warmup path — Bench calls register before
        // timing — so a timed DSv2 key grades its read plan, not the
        // one-time fixture write.
        graft.connector.ConnectorQueries.prestage(spark, sfDir)
      }
    }
  }

  /** Convenience: register-then-lookup. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }
}
