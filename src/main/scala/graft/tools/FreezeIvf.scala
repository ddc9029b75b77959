package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Vector

/** One-off generator for [[graft.ops.Vector.FrozenCentroids]]: fits the
  * IVF coarse quantizer on the sf0.01 `embeddings` table with the SAME
  * driver-side Lloyd's the trained API uses, then prints the centroids as
  * Scala source. The frozen constants give `q_similarity_ivf` an exact
  * DuckDB twin (both engines replay assignment from the same literals);
  * rerun this only if the synthetic embeddings fixture changes.
  *
  *   sbt "runMain graft.tools.FreezeIvf"
  */
object FreezeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sample = graft.warehouse.Tables.table(spark, sfDir, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .limit(20000)
      .collect().map(_.getSeq[Double](0).toArray)
    val cents = Vector.fitCentroids(sample, k = 8, iters = 5, seed = 42)
    println("  private[ops] val FrozenCentroids: Array[Array[Double]] = Array(")
    println(cents.map(_.map(x => "%.17e".format(x))
      .grouped(4).map(_.mkString(", ")).mkString("    Array(\n      ", ",\n      ", ")"))
      .mkString("", ",\n", ")"))
    spark.stop()
  }
}
