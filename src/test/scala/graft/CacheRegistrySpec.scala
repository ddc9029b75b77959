package graft

/** The operator-internal persist discipline: the three LSH-candidate
  * dedup keys share ONE persisted bands table, and releaseAll leaves no
  * cached blocks behind. */
class CacheRegistrySpec extends SparkSpec {

  test("dedup keys share one persisted bands copy; releaseAll drops it") {
    // track persisted-RDD IDS, not counts: other suites' localCheckpoint
    // RDDs are GC'd asynchronously by the ContextCleaner, so an absolute
    // count can shrink between snapshots — new ids only appear from OUR
    // actions, which is the invariant under test
    def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    CacheRegistry.releaseAll()
    val before = ids

    SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    assert(CacheRegistry.size == 1, "first candidate build registers the bands")
    val fromFirst = ids -- before
    assert(fromFirst.size == 1,
      s"exactly one cached RDD from the first dedup key, got $fromFirst")

    SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    SparkEntry.queries("q_dedup_levenshtein")(spark, sfDir).count()
    assert(CacheRegistry.size == 1,
      "sibling keys must reuse the registered copy, not persist their own")
    assert((ids -- before -- fromFirst).isEmpty,
      "sibling keys must not add cached RDDs of their own")

    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)
    assert(ids.intersect(fromFirst).isEmpty,
      "the bands cache must not survive releaseAll")
  }
}
