package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Relational.localized]] is a generic helper on the histQuantiles
  * path; since r16 it collects its input to a LocalRelation so broadcast
  * builds stop re-running the producing pipeline. The r16 verdict flagged
  * that nothing enforced the "group-count-bounded" contract — a future
  * high-cardinality caller would silently inherit an unbounded driver
  * collect. The helper now dispatches on a MEASURED row probe
  * (`take(cap + 1)`): at or below [[Relational.LocalizeMaxRows]] rows it
  * localizes, above it the frame passes through distributed. This spec
  * pins (a) both arms return the same row multiset and schema, and
  * (b) the dispatch actually fires on each side of the cap. */
class RelationalLocalizeSpec extends SparkSpec {
  import spark.implicits._

  private def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }

  test("small frames localize to a LocalRelation with identical rows") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .filter(col("k") % 3 =!= 0)
    val out = Relational.localized(df)
    assert(isLocal(out), "frame under the cap should become a LocalRelation")
    assert(out.schema == df.schema)
    assertSameRows(out, df)
  }

  test("frames above the cap pass through distributed, rows unchanged") {
    val n = Relational.LocalizeMaxRows + 57
    val df = spark.range(n.toLong).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    val out = Relational.localized(df)
    assert(!isLocal(out),
      "frame over the cap must stay distributed (no unbounded collect)")
    assert(out.schema == df.schema)
    assert(out.count() == n.toLong)
    assert(out.agg(sum("v")).head.getLong(0) ==
      df.agg(sum("v")).head.getLong(0))
  }

  test("exactly-at-cap frames still localize") {
    val df = spark.range(Relational.LocalizeMaxRows.toLong).toDF("id")
    assert(isLocal(Relational.localized(df)))
  }
}
