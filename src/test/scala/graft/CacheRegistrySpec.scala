package graft

/** The operator-internal persist discipline: the three LSH-candidate
  * dedup keys share ONE persisted bands table, and releaseAll leaves no
  * cached blocks behind. */
class CacheRegistrySpec extends SparkSpec {

  test("dedup keys share persisted band copies; releaseAll drops them") {
    // track persisted-RDD IDS, not counts: other suites' localCheckpoint
    // RDDs are GC'd asynchronously by the ContextCleaner, so an absolute
    // count can shrink between snapshots — new ids only appear from OUR
    // actions, which is the invariant under test
    def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    CacheRegistry.releaseAll()
    val before = ids

    SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    // two registered frames since the hot-bucket guard landed: the RAW
    // bands (so the guard's count aggregate and its join both read cached
    // ids instead of re-running shingle+md5+minhash) and the SALTED bands
    // the self-join consumes
    assert(CacheRegistry.size == 2,
      "first candidate build registers raw + salted bands")
    val fromFirst = ids -- before
    assert(fromFirst.size == 2,
      s"exactly two cached RDDs from the first dedup key, got $fromFirst")

    SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    SparkEntry.queries("q_dedup_levenshtein")(spark, sfDir).count()
    assert(CacheRegistry.size == 2,
      "sibling keys must reuse the registered copies, not persist their own")
    assert((ids -- before -- fromFirst).isEmpty,
      "sibling keys must not add cached RDDs of their own")

    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)
    assert(ids.intersect(fromFirst).isEmpty,
      "the bands caches must not survive releaseAll")
  }
}
