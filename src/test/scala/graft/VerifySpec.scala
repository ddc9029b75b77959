package graft

/** The correctness-dump failure contract (round-10 verdict item 5): a
  * key that throws — at analysis time or mid-job — must leave a LOUD
  * one-row `__error` marker in its output slot (which can never
  * hash-match an oracle, so the driver reports FAIL instead of silently
  * omitting the key) and an entry in the errors map. */
class VerifySpec extends SparkSpec {

  test("a healthy key dumps its rows; no error is recorded") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Verify.dumpOne(spark, sfDir, out, "ok_key",
      (s, d) => graft.warehouse.Tables.table(s, d, "region"), errors)
    assert(errors.isEmpty)
    val back = spark.read.parquet(s"$out/ok_key")
    assert(back.count() == 5 && back.columns.contains("r_name"))
  }

  test("a key that throws at PLAN time leaves the __error marker, not absence") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Verify.dumpOne(spark, sfDir, out, "broken_key",
      (s, d) => graft.warehouse.Tables.table(s, d, "region")
        .selectExpr("no_such_column + 1"), errors)
    assert(errors.contains("broken_key"), errors)
    val marker = spark.read.parquet(s"$out/broken_key")
    assert(marker.columns.toSeq == Seq("__error"))
    assert(marker.count() == 1)
    assert(marker.head.getString(0).nonEmpty)
  }

  test("a key that throws MID-JOB (runtime error) still leaves the marker") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Verify.dumpOne(spark, sfDir, out, "runtime_key",
      (s, d) => {
        import s.implicits._
        Seq(1L, 0L).toDF("x").selectExpr("CAST(assert_true(x > 0) AS STRING) AS ok")
      }, errors)
    assert(errors.contains("runtime_key"), errors)
    val marker = spark.read.parquet(s"$out/runtime_key")
    assert(marker.columns.toSeq == Seq("__error") && marker.count() == 1)
  }
}
