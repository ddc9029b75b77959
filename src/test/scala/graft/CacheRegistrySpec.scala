package graft

/** The operator-internal persist discipline: the three LSH-candidate
  * dedup keys share ONE persisted bands table, and releaseAll leaves no
  * cached blocks behind. */
class CacheRegistrySpec extends SparkSpec {

  test("dedup keys share one persisted bands copy; releaseAll drops it") {
    CacheRegistry.releaseAll()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size

    SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    assert(CacheRegistry.size == 1, "first candidate build registers the bands")
    SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    SparkEntry.queries("q_dedup_levenshtein")(spark, sfDir).count()
    assert(CacheRegistry.size == 1,
      "sibling keys must reuse the registered copy, not persist their own")
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore + 1,
      "exactly one cached RDD for all three dedup keys")

    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "no cached blocks may survive releaseAll")
  }
}
