package graft.operators

import graft.core.SparkTestBase

/** Exact-integer k-means semantics: separated clusters are recovered,
  * the result is deterministic, and empty cells carry forward.
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  // three well-separated groups of 2-d points around (0,0), (10,10), (-10,5);
  // ids interleaved so the lowest-3-id seeds span all three groups
  private val centers = Seq((0f, 0f), (10f, 10f), (-10f, 5f))
  private def fixture = (0 until 30).map { i =>
    val (cx, cy) = centers(i % 3)
    val jx = (i * 7 % 5) * 0.1f
    val jy = (i * 11 % 5) * 0.1f
    (i.toLong, Array(cx + jx, cy + jy))
  }.toDF("vec_id", "embedding")

  test("kmeans recovers separated groups and is deterministic") {
    def run() = Clustering.kmeansAssign(fixture, "vec_id", "embedding",
      k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run()
    // every group lands in one cluster; groups land in distinct clusters
    val byGroup = (0 until 3).map(g => (0 until 30).filter(_ % 3 == g)
      .map(i => got(i.toLong)).toSet)
    assert(byGroup.forall(_.size == 1), s"group split across clusters: $byGroup")
    assert(byGroup.flatten.toSet.size == 3, s"groups merged: $byGroup")
    assert(got == run(), "non-deterministic assignment")
  }

  test("empty cell carries its previous centroid forward") {
    // k=3 seeds from ids 0,1,2 = one point per group, but all points of
    // group 2 sit at one coordinate — shrink to 2 real groups so one
    // seed goes hungry only if ties collapse; force it with k > groups
    val twoGroups = (0 until 20).map { i =>
      val (cx, cy) = if (i % 2 == 0) (0f, 0f) else (10f, 10f)
      (i.toLong, Array(cx, cy))
    }.toDF("vec_id", "embedding")
    // seeds: ids 0,1,2 -> (0,0), (10,10), (0,0). Cell 2 duplicates cell 0
    // and loses every tie (lowest cell wins) -> empty from iteration 1.
    val out = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 3, iters = 2).collect()
    val clusters = out.map(_.getLong(1)).toSet
    assert(clusters == Set(0L, 1L), s"expected cells {0,1} only, got $clusters")
    assert(out.forall(_.getLong(2) == 0L), "points must sit on their centroid")
  }
}
