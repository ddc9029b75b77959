package graft.interop

import graft.SparkSpec
import graft.warehouse.Tables

/** Arrow IPC roundtrip — the reference's wire format: partition →
  * IPC stream → rows, content-identical. */
class ArrowInteropSpec extends SparkSpec {

  test("orders roundtrips through Arrow IPC batches (incl. timestamps)") {
    val src = Tables.table(spark, sfDir, "orders").repartition(3)
    val batches = ArrowInterop.toArrowBatches(src)
    assert(batches.rdd.getNumPartitions == 3)
    val collected = batches.collect()
    assert(collected.length == 3, "one IPC stream per partition")
    assert(collected.map(_._1).sum == src.count())
    val back = ArrowInterop.fromArrowBatches(batches, src.schema)
    assertSameRows(src, back)
  }

  test("nulls survive the interchange") {
    import org.apache.spark.sql.functions._
    val src = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, col("c_name")).as("maybe_name"),
        when(col("c_custkey") % 2 === 0, col("c_acctbal")).as("maybe_bal"))
    val back = ArrowInterop.fromArrowBatches(
      ArrowInterop.toArrowBatches(src), src.schema)
    assertSameRows(src, back)
  }

  test("embeddings (ArrayType(Float)) roundtrip through the IPC stream") {
    val src = Tables.table(spark, sfDir, "embeddings").repartition(2)
    val back = ArrowInterop.fromArrowBatches(
      ArrowInterop.toArrowBatches(src), src.schema)
    assertSameRows(src, back)
  }

  test("null arrays and null elements survive the interchange") {
    import org.apache.spark.sql.functions._
    val src = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        when(col("vec_id") % 3 === 0,
          expr("transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS FLOAT), x))"))
          .as("maybe_vec"))
    val back = ArrowInterop.fromArrowBatches(
      ArrowInterop.toArrowBatches(src), src.schema)
    assertSameRows(src, back)
  }

  test("batches are valid standalone Arrow streams (readable out-of-band)") {
    val src = Tables.table(spark, sfDir, "region")
    val bytes = ArrowInterop.toArrowBatches(src.coalesce(1)).collect().head._2
    // decode with a fresh reader, no Spark involved — the bytes ARE the API
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    var rows = 0
    while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    reader.close(); alloc.close()
    assert(rows == 5)
  }
}
