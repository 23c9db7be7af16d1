package graft.operators

import graft.core.SparkTestBase

/** SemDedup semantics on hand-checkable geometry (expected sets pinned
  * by an independent step-by-step model of the exact-integer chain:
  * quantize → seeded Lloyd → floor-mean → dominance prune): parallel
  * near-duplicates prune to the member farthest from the centroid,
  * orthogonal members coexist, ties keep the lower id, the threshold
  * gates the prune, cross-cluster similarity is ignored, and chain
  * pruning is one-shot (a~b~c with a!~c can drop both a and b).
  */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Array[Float])], k: Int = 2,
                  tauNum: Int = 19, tauDen: Int = 20): Set[Long] =
    SemDedup.semDedup(rows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", dims = 2, k = k, iters = 2,
        tauNum = tauNum, tauDen = tauDen)
      .collect().map(_.getLong(0)).toSet

  test("parallel trio prunes to the farthest-from-centroid member") {
    // ids 0..2 are parallel (pairwise cos = 1) at growing length; the
    // longest sits farthest from the cluster mean and dominates both
    // others. (0,10) seeds/keeps a second cluster, untouched.
    val rows = Seq[(Long, Array[Float])](
      0L -> Array(10f, 0f),
      1L -> Array(10.4f, 0f),
      2L -> Array(20f, 0f),
      3L -> Array(0f, 10f))
    assert(run(rows) == Set(2L, 3L))
  }

  test("orthogonal members of one cluster both survive") {
    val rows = Seq[(Long, Array[Float])](
      0L -> Array(10f, 0f),
      1L -> Array(0f, 10f),
      2L -> Array(100f, 100f))
    assert(run(rows) == Set(0L, 1L, 2L))
  }

  test("identical vectors: distance tie keeps the lower id") {
    val rows = Seq[(Long, Array[Float])](
      0L -> Array(10f, 0f),
      1L -> Array(10f, 0f),
      2L -> Array(0f, 10f))
    assert(run(rows) == Set(0L, 2L))
  }

  test("similar vectors in DIFFERENT clusters are not pruned across") {
    // two tight parallel groups far apart along one ray: cos = 1
    // between the groups, but k-means separates them and SemDeDup only
    // prunes within a cluster — one survivor per group, no cross-group
    // pruning.
    // magnitudes stay within the documented overflow bound for
    // cosScale = 100 (den^2*(2*dot)^2 < 2^63)
    val rows = Seq[(Long, Array[Float])](
      0L -> Array(1f, 0f),
      1L -> Array(1.01f, 0f),
      2L -> Array(50f, 0f),
      3L -> Array(50.5f, 0f))
    assert(run(rows) == Set(0L, 2L))
  }

  test("threshold gates the prune") {
    // cos((10,0),(10,3)) = 10/sqrt(109) ~ 0.958: pruned at tau = 0.95,
    // kept at tau = 0.975.
    val rows = Seq[(Long, Array[Float])](
      0L -> Array(10f, 0f),
      1L -> Array(10f, 3f),
      2L -> Array(0f, 10f))
    assert(run(rows, tauNum = 19, tauDen = 20) == Set(0L, 2L))
    assert(run(rows, tauNum = 39, tauDen = 40) == Set(0L, 1L, 2L))
  }

  test("one-shot chain: a~b, b~c, a!~c drops BOTH a and b") {
    // unit-length vectors at 40/55/70 degrees: adjacent pairs cos 15deg
    // ~ 0.966 >= tau, ends cos 30deg ~ 0.866 < tau. Two anchors near 0
    // degrees pull the centroid low so distance grows with angle:
    // 2 dominates 1, 1 dominates 0 — one-shot pruning drops 0 even
    // though its only dominator 1 is itself dropped (documented
    // SemDeDup semantics, not transitive-closure clustering). The
    // anchor pair (cos ~ 0.9994) prunes to its lower id 3; (-100,-100)
    // anchors the second k-means cell.
    def ang(deg: Double, len: Double) = Array(
      (len * math.cos(math.toRadians(deg))).toFloat,
      (len * math.sin(math.toRadians(deg))).toFloat)
    val rows = Seq[(Long, Array[Float])](
      0L -> ang(40, 10), 1L -> ang(55, 10), 2L -> ang(70, 10),
      3L -> ang(0, 10), 4L -> ang(2, 10), 5L -> Array(-100f, -100f))
    assert(run(rows) == Set(2L, 3L, 5L))
  }
}
