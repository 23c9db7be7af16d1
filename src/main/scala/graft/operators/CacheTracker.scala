package graft.operators

import java.lang.ref.WeakReference

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
  * Keyed by session IDENTITY (WeakHashMap) like Staged's memo. Values
  * hold WeakReference[DataFrame] (r15, ADVICE): a strong value ref
  * would pin the frame — and, since every Dataset strongly references
  * its SparkSession, the map KEY too — so neither the WeakHashMap
  * entry nor ContextCleaner's GC-driven block cleanup could ever fire
  * for a session that skips Staged.release. With weak refs, a frame
  * the caller has dropped becomes GC-reclaimable and its cached blocks
  * fall to ContextCleaner as they did pre-r14; frames still reachable
  * (the normal case — the consuming query holds them) are released
  * explicitly by the session sweep.
  */
object CacheTracker {
  private val perSession = new java.util.WeakHashMap[
    SparkSession, java.util.ArrayList[WeakReference[DataFrame]]]()

  /** Register an (already persisted) frame for release with its
    * session; returns it for inline use at the persist site.
    */
  def track(df: DataFrame): DataFrame = perSession.synchronized {
    var l = perSession.get(df.sparkSession)
    if (l == null) {
      l = new java.util.ArrayList[WeakReference[DataFrame]]()
      perSession.put(df.sparkSession, l)
    }
    // drain entries whose frames were GC-reclaimed (ContextCleaner
    // owns their blocks now) so the list can't grow unboundedly in a
    // long-lived session that tracks many short-lived frames
    l.removeIf(r => r.get() == null)
    l.add(new WeakReference(df))
    df
  }

  /** Release every tracked frame of `s` — via [[Dedup.release]], which
    * frees BOTH persisted caches and localCheckpoint leaf RDD blocks
    * (plain unpersist() misses the latter).
    */
  def release(s: SparkSession): Unit = perSession.synchronized {
    val l = perSession.remove(s)
    if (l != null) l.forEach { r =>
      val d = r.get()
      if (d != null) { Dedup.release(d); () }
    }
  }
}
