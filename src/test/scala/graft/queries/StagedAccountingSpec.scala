package graft.queries

import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** Pins the staging-accounting contract the round-12 self-review
  * fixed, so the three bugs it found cannot regress:
  *   1. per-key seconds are SELF time — a nested build's wall must be
  *      subtracted from its parent's entry (summing the map equals the
  *      depth-0 wall; double-counting inflated staging_total);
  *   2. a build that throws bills NOTHING and is NOT memoized (the
  *      next call retries);
  *   3. builders memoize: the second call must not rebuild.
  * Keys are unique to this suite so parallel suites touching Staged
  * cannot interfere (assertions never read the global counter).
  */
class StagedAccountingSpec extends SparkTestBase {

  test("nested staged builds bill self time, not wall (no double count)") {
    val inner = s"spec:acct:inner:${System.identityHashCode(this)}"
    val outer = s"spec:acct:outer:${System.identityHashCode(this)}"
    Staged.cachedAny(spark, outer) {
      // nested build sleeps 2 s; the outer adds ~50 ms of its own.
      // The inner sleep is deliberately LARGE relative to plausible
      // GC/CI pauses: the leak assertion below only needs outer-self
      // to land clearly under the child's wall, so a few-hundred-ms
      // pause inside the outer build cannot flake it.
      val i = Staged.cachedAny(spark, inner) { Thread.sleep(2000); 7 }
      Thread.sleep(50)
      i + 1
    }
    val selfInner = Staged.stagingByKey(inner)
    val selfOuter = Staged.stagingByKey(outer)
    assert(selfInner >= 1.9, s"inner self=$selfInner")
    // if the child's 2 s wall leaked into the outer entry this would
    // be >= 2.0; self-time keeps it near the outer's own 0.05 s, with
    // a 1 s pause budget before the assertion could falsely fail
    assert(selfOuter < 1.0, s"outer self=$selfOuter (child wall leaked in)")
    assert(selfOuter >= 0.04, s"outer self=$selfOuter")
  }

  test("a failed build bills nothing and is not memoized") {
    val key = s"spec:acct:fail:${System.identityHashCode(this)}"
    intercept[RuntimeException] {
      Staged.cachedAny[Int](spark, key) { Thread.sleep(20); throw new RuntimeException("boom") }
    }
    assert(!Staged.stagingByKey.contains(key), "failed build left a staging entry")
    // retry succeeds — the failure must not have been cached
    val v = Staged.cachedAny(spark, key) { 42 }
    assert(v == 42)
    assert(Staged.stagingByKey.contains(key))
  }

  test("builders memoize: second call returns the cached value without rebuilding") {
    val key = s"spec:acct:memo:${System.identityHashCode(this)}"
    var builds = 0
    def get() = Staged.cached(spark, key) {
      builds += 1
      spark.range(3).select(col("id"))
    }
    val a = get(); val b = get()
    assert(builds == 1, s"built $builds times")
    assert(a.count() == 3 && b.count() == 3)
    // cached() persists and staged() force-materializes at build
    assert(a.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }
}
