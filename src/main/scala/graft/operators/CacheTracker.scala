package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Session-scoped registry of operator/query-INTERNAL persisted frames.
  *
  * Operators that persist a multi-consumer intermediate (band tables,
  * prefix tables, verify sets) but return their result lazily cannot
  * unpersist it after the consuming action — the action happens in the
  * caller. Before r14 those persists had no release path at all: a
  * long-lived session accumulated cached blocks until GC-driven
  * ContextCleaner cleanup (r13 ADVICE). Tracking hands their lifecycle
  * to the session sweep: `Staged.release` calls [[release]], so every
  * bench pass / repeated invocation starts from a clean cache state.
  *
  * Keyed by session IDENTITY (WeakHashMap) like Staged's memo — a dead
  * session's entries are unreachable and the map entry is GC-collected
  * with the session.
  */
object CacheTracker {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayList[DataFrame]]()

  /** Register an (already persisted) frame for release with its
    * session; returns it for inline use at the persist site.
    */
  def track(df: DataFrame): DataFrame = perSession.synchronized {
    var l = perSession.get(df.sparkSession)
    if (l == null) {
      l = new java.util.ArrayList[DataFrame]()
      perSession.put(df.sparkSession, l)
    }
    l.add(df)
    df
  }

  /** Release every tracked frame of `s` — via [[Dedup.release]], which
    * frees BOTH persisted caches and localCheckpoint leaf RDD blocks
    * (plain unpersist() misses the latter).
    */
  def release(s: SparkSession): Unit = perSession.synchronized {
    val l = perSession.remove(s)
    if (l != null) l.forEach { d => Dedup.release(d); () }
  }
}
