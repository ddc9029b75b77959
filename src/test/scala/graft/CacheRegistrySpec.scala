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

  test("releaseAll frees checkpoint-backed entries' executor blocks") {
    // getOrCheckpoint entries are localCheckpoint-backed (LogicalRDD):
    // Dataset.unpersist only touches the CacheManager, so without the
    // tracked-RDD release the blocks would linger until GC (round-13
    // ADVICE, medium). The invariant: the persistent-RDD id that appears
    // at registration is GONE right after releaseAll, not eventually.
    def ids: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    CacheRegistry.releaseAll()
    val before = ids
    val df = CacheRegistry.getOrCheckpoint("spec_ckpt_release", "t",
      spark.range(1000).toDF("id"))
    assert(df.count() == 1000)
    val added = ids -- before
    assert(added.nonEmpty,
      "a checkpoint registration must pin at least one persistent RDD")
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)
    assert(ids.intersect(added).isEmpty,
      s"checkpoint blocks $added must not survive releaseAll")
  }
}
