package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.warehouse.Tables

/** Connector behavior tests mirroring the reference's own suite shape
  * (dask_snowflake/tests/test_core.py): write/read roundtrip with
  * canonical compare, empty results, deferred writes, partition sizing
  * tolerances, parameterized queries. */
class ConnectorSpec extends SparkSpec {

  test("roundtrip: write then read back preserves content (test_core.py:54-65)") {
    val df = Tables.table(spark, sfDir, "customer")
    val out = Files.createTempDirectory("graft_rt").toString
    Write.toParquet(df, out, overwrite = true)
    val back = spark.read.parquet(out)
    assertSameRows(df, back)
  }

  test("overwrite mode replaces prior content (test_core.py:126-146)") {
    val out = Files.createTempDirectory("graft_ow").toString
    val a = Tables.table(spark, sfDir, "nation")
    Write.toParquet(a, out, overwrite = true)
    Write.toParquet(a, out, overwrite = true)
    assert(spark.read.parquet(out).count() == a.count())
    // append mode doubles it
    Write.toParquet(a, out)
    assert(spark.read.parquet(out).count() == 2 * a.count())
  }

  test("empty result keeps its schema (core.py:277-278, test_core.py:68-80)") {
    // DELIBERATE divergence from the reference, pinned: dask-snowflake
    // degrades an empty result to a zero-COLUMN frame because its schema
    // comes from the first non-empty Arrow batch; Spark always knows the
    // analyzed schema, so the default preserves it
    val df = Read.readTable(spark, sfDir,
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey < 0")
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == Seq("c_custkey", "c_name"))
  }

  test("emptyAsZeroColumns reproduces the reference's zero-column degrade exactly") {
    // the reference shape: len(result.index) == 0 AND len(result.columns)
    // == 0 (test_core.py:78-80), npartitions=1 (core.py:278)
    val df = Read.readTable(spark, sfDir,
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey < 0",
      emptyAsZeroColumns = true)
    assert(df.count() == 0)
    assert(df.schema.isEmpty, s"expected zero columns, got ${df.schema.fieldNames.toSeq}")
    assert(df.rdd.getNumPartitions == 1)
    // and a NON-empty result is untouched by the flag
    val nonEmpty = Read.readTable(spark, sfDir,
      "SELECT c_custkey FROM customer WHERE c_custkey >= 0",
      emptyAsZeroColumns = true)
    assert(nonEmpty.schema.fieldNames.toSeq == Seq("c_custkey"))
    assert(nonEmpty.count() > 0)
  }

  test("npartitions mode hits the requested count ±2 (test_core.py:305-310)") {
    val df = Read.readTable(spark, sfDir,
      "SELECT * FROM lineitem", npartitions = Some(4))
    assert(math.abs(df.rdd.getNumPartitions - 4) <= 2)
    assert(df.count() > 0)
  }

  test("partition_size mode: small target yields more partitions than large") {
    val small = Read.readTable(spark, sfDir,
      "SELECT * FROM lineitem", partitionSize = Some("64 KiB"))
    val large = Read.readTable(spark, sfDir,
      "SELECT * FROM lineitem", partitionSize = Some("1 GiB"))
    assert(small.rdd.getNumPartitions > large.rdd.getNumPartitions)
    assert(large.rdd.getNumPartitions == 1)
    assert(small.count() == large.count())
  }

  test("exactly-one-of raises (test_core.py:312-319)") {
    intercept[IllegalArgumentException] {
      Read.readTable(spark, sfDir, "SELECT 1",
        npartitions = Some(2), partitionSize = Some("1 MiB"))
    }
  }

  test("parameterized query binds engine-side (test_core.py:73-74, 267-272)") {
    val maxBal = Tables.table(spark, sfDir, "customer")
      .agg(max("c_acctbal")).head.getDouble(0)
    val df = Read.readTable(spark, sfDir,
      "SELECT c_custkey FROM customer WHERE c_acctbal = :target",
      params = Map("target" -> maxBal))
    assert(df.count() >= 1)
    val none = Read.readTable(spark, sfDir,
      "SELECT c_custkey FROM customer WHERE c_acctbal > :target",
      params = Map("target" -> maxBal))
    assert(none.count() == 0)
  }

  test("deferred write: DDL eager, rows only on compute (core.py:116-124)") {
    val df = Tables.table(spark, sfDir, "region")
    val name = s"t_deferred_${System.nanoTime()}"
    val thunk = Write.toTableDeferred(df, name)
    // table exists (the reference's compute=False wart: DDL ran eagerly)
    assert(spark.catalog.tableExists(name.toUpperCase))
    assert(spark.table(name.toUpperCase).count() == 0)
    thunk()
    assert(spark.table(name.toUpperCase).count() == df.count())
  }

  test("table names are uppercased (core.py:37)") {
    val df = Tables.table(spark, sfDir, "region")
    val name = s"t_case_${System.nanoTime()}"
    Write.toTable(df, name)
    assert(spark.catalog.tableExists(name.toUpperCase))
  }

  test("compactSmallFiles: file count follows total/target, content survives, no shuffle") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    val df = (0L until 2000L).map(i => (i, s"row_$i")).toDF("id", "s")
    df.repartition(10).write.mode("overwrite").parquet(in)
    // huge target → everything glues into one file
    val (before, after) = graft.Graft.compactSmallFiles(spark, in, out,
      targetBytes = 1L << 30)
    assert(before == 10 && after == 1, s"got ($before, $after)")
    val back = spark.read.parquet(out)
    assertSameRows(back, df)
    // coalesce, not repartition: the compaction read must carry no
    // exchange (the whole point is a linear glue pass)
    val plan = spark.read.parquet(in).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
    // tiny target → more output files than one, fewer than input
    val out2 = java.nio.file.Files.createTempDirectory("graft_cmp_out2").toString
    val (_, after2) = graft.Graft.compactSmallFiles(spark, in, out2,
      targetBytes = 8 * 1024)
    assert(after2 > 1 && after2 <= 10, s"got $after2 files")
    intercept[IllegalArgumentException] {
      graft.Graft.compactSmallFiles(spark, in, out, targetBytes = 0)
    }
  }
}
