package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump one key's result to `outDir/name`. A key that fails to
    * plan/run must be LOUD in the driver artifact, not silently absent
    * (round 10: three analysis-time failures dropped out of the
    * correctness report entirely). On error, write a one-row marker
    * parquet in the key's slot — its `__error` schema/rowcount can
    * never hash-match any oracle, so the driver reports FAIL — and
    * record the message for errors.json. VerifySpec pins both paths. */
  private[graft] def dumpOne(spark: SparkSession, sfDir: String,
      outDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      errors: scala.collection.mutable.Map[String, String]): Unit = {
    try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    catch { case e: Throwable =>
      val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
      System.err.println(s"[verify] $name failed: $msg")
      errors(name) = msg.take(2000)
      try {
        import spark.implicits._
        Seq(msg.take(2000)).toDF("__error").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case m: Throwable =>
        System.err.println(s"[verify] $name marker write failed: ${m.getMessage}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_KEYS="q_a,q_b" restricts the dump
    // to those keys (the driver never sets it, so its runs stay complete).
    val only = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ks) => SparkEntry.queries.filter { case (n, _) => ks(n) }
      case None     => SparkEntry.queries
    }
    // A key that fails to plan/run must be LOUD in the driver artifact,
    // not silently absent (round 10: three analysis-time failures dropped
    // out of the correctness report entirely). On error, write a one-row
    // marker parquet in the key's slot — its __error schema/rowcount can
    // never hash-match any oracle, so the driver reports FAIL — plus an
    // errors.json for humans.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      dumpOne(spark, sfDir, outDir, name, fn, errors)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (errors.nonEmpty) {
      val ejson = errors
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/errors.json"), ejson)
    }
    CacheRegistry.releaseAll()
    connector.StageCache.clearAll()
    spark.stop()
  }
}
