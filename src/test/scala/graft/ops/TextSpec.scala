package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Edge semantics of the text-analysis columns beyond the SQL oracle
  * (the synthetic corpus never hits these shapes). */
class TextSpec extends SparkSpec {

  test("repetition ratio: short docs 0, looping docs high, unique docs 0") {
    graft.functions.Shingles3.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"),                     // < 3 tokens: no 3-grams → 0
      (2L, "x y z x y z x y z x y z"), // 12 tokens → 10 shingles, 3 distinct
      (3L, "one two three four five")  // all shingles distinct → 0
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Text.repetitionE6.as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L, "a doc too short to shingle must score 0")
    // 1 - 3/10 = 0.7 → 700000 exactly (floor of an exact double)
    assert(got(2L) == 700000L, s"looping doc scored ${got(2L)}, expected 700000")
    assert(got(3L) == 0L, "an all-distinct doc must score 0")
  }
}
