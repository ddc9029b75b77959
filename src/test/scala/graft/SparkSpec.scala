package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — mirrors the reference's fixture
  * shape (a small local cluster per test module,
  * dask_snowflake/tests/test_core.py:19-22). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  /** Canonical comparison à la dd.utils.assert_eq as the reference uses it
    * (tests/test_core.py:59-65): sort by all columns, compare row values —
    * partition order never matters. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq,
      s"columns differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cols = a.columns.sorted.toIndexedSeq
    val av = a.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val bv = b.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(av.length == bv.length, s"row counts differ: ${av.length} vs ${bv.length}")
    av.zip(bv).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs: $x vs $y")
    }
  }
}
