package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.warehouse.Tables

/** The multimodal binary-column plumbing: schema, determinism, batch
  * shape, partition preservation. The decode itself is a documented stub
  * (no codecs in this container) — these tests pin down everything real
  * around it. */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.withPayload(
    Tables.table(spark, sfDir, "documents"))

  test("payload schema: opaque binary + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "n_bytes", "source"))
  }

  test("extractFeatures: fixed-dim float vectors, payload dropped") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    assert(feats.schema.fieldNames.toSeq == Seq("doc_id", "meta", "features"))
    val row = feats.orderBy("doc_id").head
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == 8)
  }

  test("stub decode is deterministic and payload-sensitive") {
    val a = Multimodal.stubDecode("hello".getBytes, 8)
    val b = Multimodal.stubDecode("hello".getBytes, 8)
    val c = Multimodal.stubDecode("hellp".getBytes, 8)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.forall(f => f >= -0.5f && f <= 0.5f))
  }

  test("feature pass is narrow: partitioning preserved, no shuffle") {
    val m = media.repartition(3)
    val feats = Multimodal.extractFeatures(m)
    assert(feats.rdd.getNumPartitions == 3)
    // the plan prints top-down (output first): anything textually BEFORE
    // the MapPartitions node is downstream of it — no Exchange may appear
    // there (the one after it is our explicit repartition input)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.split("MapPartitions").head.contains("Exchange"),
      s"unexpected shuffle after feature extraction:\n$plan")
  }

  test("north-star loop: media records stage through the DSv2 connector intact") {
    // the full multimodal pipeline across the connector: binary payload +
    // metadata struct staged via format("graft"), read back, features
    // extracted — identical to running the extractor on the direct path
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.repartition(2).write.format("graft").mode("overwrite").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    // Array[Byte] compares by reference inside Row equality — digest it
    def digested(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("payload", md5(col("payload")))
    assertSameRows(digested(media), digested(back))
    val direct = Multimodal.extractFeatures(media)
      .selectExpr("doc_id", "features").orderBy("doc_id")
    val staged = Multimodal.extractFeatures(back)
      .selectExpr("doc_id", "features").orderBy("doc_id")
    assertSameRows(direct, staged)
  }

  test("features join back to the vector operators' world") {
    val feats = Multimodal.extractFeatures(media)
      .select(col("doc_id"), col("features"))
    val joined = Tables.table(spark, sfDir, "embeddings")
      .join(feats, col("vec_id") === col("doc_id"))
    assert(joined.count() > 0)
  }
}
