package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The packed-byte code representation must be lossless for the 0..255
  * code range and its integer dot must equal the BIGINT fold over the
  * unpacked lists — the oracle's cross-engine exactness rests on both. */
class CodePackSpec extends SparkSpec {

  test("pack_codes is byte-exact and code_dot equals the BIGINT fold, high bytes included") {
    CodePack.register(spark)
    // codes spanning the full unsigned range, including >127 (the values a
    // signed-byte dot would corrupt) — derived from ids, no RNG
    val df = spark.range(500).toDF("id")
      .withColumn("a", expr(
        "transform(sequence(0, 63), i -> (id * 37 + i * 11) % 256)"))
      .withColumn("b", expr(
        "transform(sequence(0, 63), i -> (id * 53 + i * 7) % 256)"))
      .withColumn("packed_dot", expr("code_dot(pack_codes(a), pack_codes(b))"))
      .withColumn("fold_dot", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s0, x) -> s0 + x)"))
    assert(df.filter(col("packed_dot") =!= col("fold_dot")).count() == 0,
      "packed dot must match the long fold for every row")
    // round-trip: unpacking the binary recovers the exact code list
    val bad = df.selectExpr("a", "pack_codes(a) AS p").collect().count { r =>
      val a = r.getSeq[Long](0)
      val p = r.getAs[Array[Byte]](1)
      p.length != a.length || !a.indices.forall(i => (p(i) & 0xff).toLong == a(i))
    }
    assert(bad == 0, s"$bad rows failed the pack round-trip")
  }

  test("null code elements and mismatched widths fail loudly, never silently corrupt") {
    CodePack.register(spark)
    // a null code packed as 0 would corrupt downstream scores invisibly
    val eNull = intercept[Exception] {
      spark.sql("SELECT pack_codes(array(1L, CAST(NULL AS BIGINT), 3L))").collect()
    }
    assert(eNull.getMessage.contains("null code element"),
      s"expected the null-element error, got: ${eNull.getMessage}")
    // a min-length truncation would mask a dimension bug and diverge from
    // the oracle's full-width fold
    val eLen = intercept[Exception] {
      spark.sql(
        "SELECT code_dot(pack_codes(array(1L, 2L)), pack_codes(array(1L)))").collect()
    }
    assert(eLen.getMessage.contains("differ in width"),
      s"expected the width-mismatch error, got: ${eLen.getMessage}")
  }

  test("both expressions participate in whole-stage codegen") {
    CodePack.register(spark)
    val df = spark.range(100).toDF("id")
      .withColumn("a", expr("transform(sequence(0, 63), i -> (id + i) % 256)"))
      .select(expr("code_dot(pack_codes(a), pack_codes(a))").as("d"))
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks an operator inside a WholeStageCodegen stage
    assert(p.linesIterator.exists(l => l.contains("code_dot") && l.contains("*(")),
      s"the code_dot projection should sit inside a codegen stage:\n$p")
    assert(df.agg(sum("d")).head.getLong(0) > 0)
  }
}
