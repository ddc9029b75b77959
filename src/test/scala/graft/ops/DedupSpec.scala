package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Cluster-resolution consistency: the keep-list must be a fixpoint of the
  * label propagation (an early-stopped iteration would break every one of
  * these invariants). */
class DedupSpec extends SparkSpec {

  private lazy val resolved =
    SparkEntry.queries("q_dedup_resolve")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  private lazy val pairs =
    SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("every doc's survivor is itself or a smaller doc, and survivors self-map") {
    assert(resolved.nonEmpty)
    resolved.foreach { case (doc, keep, isSurvivor) =>
      assert(keep <= doc, s"survivor $keep > doc $doc")
      assert(isSurvivor == (keep == doc))
    }
    val keepSet = resolved.map(_._2).toSet
    val survivorDocs = resolved.filter(_._3).map(_._1).toSet
    assert(keepSet == survivorDocs,
      "every referenced survivor must itself resolve as a survivor")
  }

  test("both endpoints of every candidate pair land in the same component") {
    val keepOf = resolved.map(r => r._1 -> r._2).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(keepOf(a) == keepOf(b),
        s"pair ($a, $b) split across components ${keepOf(a)} / ${keepOf(b)}")
    }
  }

  test("components are genuine: at least one multi-doc cluster resolves") {
    val sizes = resolved.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.max >= 2, "expected at least one near-dup cluster")
  }
}
