package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.warehouse.Tables

/** The native expression must be a drop-in for the portable higher-order
  * fold: bit-identical values (the oracle depends on it) and codegen'd. */
class CosineSimilaritySpec extends SparkSpec {

  test("bit-identical to the aggregate/zip_with fold on real embeddings") {
    CosineSimilarity.register(spark)
    val e = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(2000)
      .withColumn("native", expr("cosine_similarity(va, vb)"))
      .withColumn("fold",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s0, x) -> s0 + x)")
          / (sqrt(expr("aggregate(va, CAST(0.0 AS DOUBLE), (s0, x) -> s0 + x * x)"))
            * sqrt(expr("aggregate(vb, CAST(0.0 AS DOUBLE), (s0, x) -> s0 + x * x)"))))
    val diffs = pairs.filter(col("native") =!= col("fold")).count()
    assert(diffs == 0, s"$diffs pairs differ between native expression and fold")
  }

  test("float arrays are implicitly cast (array<float> input works directly)") {
    CosineSimilarity.register(spark)
    val sim = Tables.table(spark, sfDir, "embeddings").limit(1)
      .select(expr("cosine_similarity(embedding, embedding)").as("s"))
      .head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    CosineSimilarity.register(spark)
    val df = Tables.table(spark, sfDir, "embeddings")
      .select(expr("cosine_similarity(embedding, embedding)").as("s"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expression fell out of codegen:\n$p")
  }

  test("works through the SQL surface") {
    CosineSimilarity.register(spark)
    Tables.register(spark, sfDir)
    val n = spark.sql(
      """SELECT cosine_similarity(a.embedding, b.embedding) AS s
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 3""".stripMargin).count()
    assert(n > 0)
  }
}
