package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted DataFrames.
  *
  * Some operators (the LSH dedup family) persist a small intermediate so a
  * self-join doesn't recompute an expensive pipeline twice. A bare
  * `.persist()` inside a query builder leaks: Spark's CacheManager holds
  * the blocks until an explicit unpersist, and three sibling query keys
  * would each persist their own copy. This registry fixes both —
  * [[getOrPersist]] shares one copy per key across operators and repeated
  * invocations, and [[releaseAll]] drops every registered block (the
  * Verify/Bench mains call it after their run; long-lived sessions call it
  * whenever the staged inputs change).
  */
object CacheRegistry {

  private val entries = TrieMap.empty[(String, String), DataFrame]

  /** The persisted DataFrame for `(operator, input)`, building and
    * persisting it on first use. An entry bound to a STOPPED SparkSession
    * (long-lived JVM, session recycled) is dropped and rebuilt against the
    * live session instead of being returned dead. */
  def getOrPersist(operator: String, input: String, build: => DataFrame): DataFrame = {
    val key = (operator, input)
    entries.get(key) match {
      case Some(df) if !df.sparkSession.sparkContext.isStopped => df
      case stale =>
        stale.foreach(_ => entries.remove(key))
        // resolve the registration race BEFORE persisting: both racers'
        // plans are sameResult, so CacheManager would share ONE cache entry
        // between them — the loser's unpersist would silently drop the
        // winner's blocks too. Only the insert winner persists.
        val df = build
        entries.putIfAbsent(key, df) match {
          case Some(winner) => winner
          case None => df.persist(); df
        }
    }
  }

  /** Like [[getOrPersist]], but materializes the frame with an EAGER
    * `localCheckpoint` instead of a lazy persist: the registered frame's
    * logical plan collapses to a `LogicalRDD` scan. For artifacts that
    * feed ITERATIVE loops (the graph family) this is the difference
    * between re-ANALYZING the artifact's full build tree every round and
    * analyzing a one-node scan — the build tree is paid once, here.
    * No CacheManager entry is involved, so the registration race is
    * benign (the loser's materialization is discarded and GC'd). */
  def getOrCheckpoint(operator: String, input: String,
      build: => DataFrame): DataFrame = {
    val key = (operator, input)
    entries.get(key) match {
      case Some(df) if !df.sparkSession.sparkContext.isStopped => df
      case stale =>
        stale.foreach(_ => entries.remove(key))
        val df = build.localCheckpoint(true)
        entries.putIfAbsent(key, df).getOrElse(df)
    }
  }

  /** Unpersist (blocking) and forget every registered DataFrame. */
  def releaseAll(): Unit = {
    entries.values.foreach(_.unpersist(blocking = true))
    entries.clear()
  }

  /** Number of live registered entries (test surface). */
  def size: Int = entries.size
}
