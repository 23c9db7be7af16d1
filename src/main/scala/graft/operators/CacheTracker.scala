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
  * Keyed by session IDENTITY (WeakHashMap) like Staged's memo. Values
  * are STRONG references, and [[release]] (via Staged.release) is the
  * ONLY cleanup path — deliberately (r15): between a query's action
  * and the session sweep the tracker is often the only live reference
  * to a tracked frame, and a WeakReference variant measured exactly
  * the failure that implies — GC cleared refs before release, the
  * frames' CacheManager entries survived the sweep, and the NEXT
  * bench pass silently reused the previous pass's caches (11 queries
  * went metrics-unstable run-to-run; with strong refs only the one
  * known range-sampling row is). The cost is that a session which
  * never calls Staged.release keeps its tracked frames and their
  * blocks alive for the session's lifetime — bounded by the tracked
  * set, and every long-running surface here (Bench, Verify,
  * DeterminismCheck) releases per pass. There is NO GC fallback; do
  * not rely on ContextCleaner for tracked frames.
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
