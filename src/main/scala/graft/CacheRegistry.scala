package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

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
  * whenever the staged inputs change). Checkpoint-backed entries
  * ([[getOrCheckpoint]]) track their materialized RDD alongside the frame,
  * because `Dataset.unpersist` only talks to the CacheManager and would
  * leave a localCheckpoint's executor blocks behind until GC.
  */
object CacheRegistry {

  /** A registered frame plus, for checkpoint-backed entries, the
    * materialized RDD whose storage blocks `releaseAll` must free. */
  private final case class Entry(df: DataFrame, rdd: Option[RDD[_]])

  private val entries = TrieMap.empty[(String, String), Entry]

  /** The persisted DataFrame for `(operator, input)`, building and
    * persisting it on first use. An entry bound to a STOPPED SparkSession
    * (long-lived JVM, session recycled) is dropped and rebuilt against the
    * live session instead of being returned dead. */
  def getOrPersist(operator: String, input: String, build: => DataFrame): DataFrame = {
    val key = (operator, input)
    entries.get(key) match {
      case Some(e) if !e.df.sparkSession.sparkContext.isStopped => e.df
      case stale =>
        stale.foreach(_ => entries.remove(key))
        // resolve the registration race BEFORE persisting: both racers'
        // plans are sameResult, so CacheManager would share ONE cache entry
        // between them — the loser's unpersist would silently drop the
        // winner's blocks too. Only the insert winner persists.
        val df = build
        entries.putIfAbsent(key, Entry(df, None)) match {
          case Some(winner) => winner.df
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
    * No CacheManager entry is involved, so the registration race cannot
    * corrupt the winner — but the loser HAS already materialized its
    * checkpoint's executor storage blocks, so losing the insert eagerly
    * unpersists them instead of leaving them to linger until GC (the
    * same leak class releaseAll exists to close).
    *
    * CAVEAT (single-process / bench assumption): localCheckpoint blocks
    * are non-replicated and NON-RECOMPUTABLE — the lineage is cut, so on
    * a multi-executor cluster losing an executor after registration fails
    * every dependent query for the session instead of transparently
    * recomputing. A cluster deployment that must survive executor loss
    * should use [[getOrPersist]] (recomputable) or reliable
    * `checkpoint()` against a durable checkpoint dir for these artifacts. */
  def getOrCheckpoint(operator: String, input: String,
      build: => DataFrame): DataFrame = {
    val key = (operator, input)
    entries.get(key) match {
      case Some(e) if !e.df.sparkSession.sparkContext.isStopped => e.df
      case stale =>
        stale.foreach(_ => entries.remove(key))
        val df = build.localCheckpoint(true)
        // extract the materialized RDD behind the LogicalRDD scan so
        // releaseAll can free its storage blocks: Dataset.unpersist only
        // clears CacheManager entries, which a checkpoint never has
        val rdd = df.queryExecution.analyzed match {
          case lr: LogicalRDD => Some(lr.rdd)
          case _ => None
        }
        entries.putIfAbsent(key, Entry(df, rdd)) match {
          case Some(winner) =>
            // insert lost: this racer's checkpoint blocks are already on
            // the executors — free them now rather than at GC
            rdd.foreach(_.unpersist(blocking = false))
            winner.df
          case None => df
        }
    }
  }

  /** Unpersist (blocking) and forget every registered DataFrame —
    * including the executor blocks of checkpoint-backed entries. */
  def releaseAll(): Unit = {
    entries.values.foreach { e =>
      e.rdd.foreach(_.unpersist(blocking = true))
      e.df.unpersist(blocking = true)
    }
    entries.clear()
  }

  /** Number of live registered entries (test surface). */
  def size: Int = entries.size
}
