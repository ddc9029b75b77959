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

  test("selectTokenBudget is bucketWidth-invariant (the decomposition never changes the answer)") {
    def rows(w: Long) =
      graft.Graft.selectTokenBudget(spark, sfDir, budget = 20000L, bucketWidth = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = rows(64L)
    assert(base.nonEmpty)
    // budget binds: admitted tokens stay within it and the selection is
    // a strict subset of the corpus
    assert(base.forall(_._3 <= 20000L))
    for (w <- Seq(1L, 16L, 1000000L)) // 1e6 → ONE bucket = the naive plan
      assert(rows(w) == base, s"bucketWidth=$w changed the selection")
  }

  test("chunked sequence packing: per-chunk contiguous math, dense numbering, parallel plan") {
    import spark.implicits._
    // ONE dominant source (the 100 TB worst case for the contiguous
    // default) with irregular doc lengths; budget 10 tokens, chunks of
    // 8 doc_ids → the heavy cumsum runs per (source, chunk), not per
    // source
    val docs = (0L until 64L).map { i =>
      (i, "web", Seq.fill((i % 7 + 1).toInt)("t").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budget = 10L
    val contiguous = Text.packAssignments(docs, budget, None)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val chunkedDf = Text.packAssignments(docs, budget, Some(8L))
    val chunked = chunkedDf.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // exact driver replay of the documented semantics: contiguous
    // packing applied independently per chunk, buckets numbered densely
    // by the chunks' ceil(tokens/budget) counts
    var off = 0L
    val expected = chunked.groupBy(_._1 / 8).toSeq.sortBy(_._1).flatMap {
      case (_, rows) =>
        var cum = 0L
        var lastB = 0L
        val assigned = rows.sortBy(_._1).map { case (id, n, _) =>
          val b = off + cum / budget
          lastB = b
          cum += n
          id -> b
        }
        off = lastB + 1 // next chunk numbers from the first unused bucket
        assigned
    }.toMap
    assert(chunked.map(t => t._1 -> t._3).toMap == expected,
      "chunked packing must be contiguous-per-chunk with dense global numbering")
    // buckets are dense 0..max (no gaps — level-2 offsets are exact)
    val buckets = chunked.map(_._3).distinct.sorted.toSeq
    assert(buckets == (0L until off).toSeq,
      s"bucket ids must be dense: $buckets")
    // differs from contiguous ONLY by the fresh-bucket-per-boundary
    // resets: a chunk whose first doc would CONTINUE a contiguous bucket
    // shifts, one that starts budget-aligned doesn't — first chunk
    // always agrees
    val chunkedMap = chunked.map(t => t._1 -> t._3).toMap
    assert((0L until 8L).forall(id => chunkedMap(id) == contiguous(id)),
      "the first chunk must match contiguous packing exactly")
    // a rangeWidth spanning all doc_ids IS contiguous packing
    val oneChunk = Text.packAssignments(docs, budget, Some(1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(oneChunk == contiguous,
      "one covering chunk must reproduce the contiguous assignment")
    // the corpus-sized window partitions by (source, chunk) — the plan
    // carries __chunk into the exchange, so one source ≠ one task
    val p = chunkedDf.queryExecution.executedPlan.toString
    assert(p.contains("__chunk"),
      s"the heavy cumsum must partition by the doc_id chunk:\n$p")
  }
}
