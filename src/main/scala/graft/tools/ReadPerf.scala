package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local perf probe for the DSv2 read path: stages a table as parquet,
  * then times full-decode scans through (a) the native parquet source and
  * (b) the graft connector, several iterations each. Not part of the
  * driver contract — run by hand while tuning the decode plane:
  *
  *   sbt "runMain graft.tools.ReadPerf /root/testdata/sf0.1 lineitem"
  */
object ReadPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val table = if (args.length > 1) args(1) else "lineitem"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = Files.createTempDirectory("graft_readperf").toString
    graft.warehouse.Tables.table(spark, sfDir, table)
      .repartition(4).write.mode("overwrite").parquet(out)

    def time(label: String)(body: => Long): Unit = {
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"$label%-10s iter$i: $ms%8.1f ms  (rows=$n)")
      }
    }

    // hash every column so the scan can't skip decode work
    def fullDecodeCount(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(sum("h")).count()

    time("parquet") { fullDecodeCount(spark.read.parquet(out)) }
    time("graft") { fullDecodeCount(
      spark.read.format("graft").option("partition_size", "32 MiB").load(out)) }

    spark.stop()
  }
}
