package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup + one-time view registration (SURVEY §6: register
    // temp views once per session; schemas are static). Without this the
    // ~5s first-job JIT cost lands on whichever query happens to run first.
    graft.warehouse.Tables.register(spark, sfDir)
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failing key must be VISIBLE in the bench output, not a -1
          // timing inside an rc=0 run — record it and keep benching the rest
          errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    // only keys that actually succeeded count toward the headline total
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_errors":${errors.size},"sf":"$sfDir"}""")
    CacheRegistry.releaseAll()
    connector.StageCache.clearAll()
    spark.stop()
  }
}
