package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style link centrality (Brin & Page 1998, public) over a
  * weighted edge list — the
  * corpus-curation prior (rank domains by citation structure to weight
  * crawl data) and the classic iterative-join workload.
  *
  * Exactness design: integer fixed-point. Ranks are scaled LONGs
  * (`scale`), the damped contribution is `floor(dampNum·r·w / (dampDen·
  * out(u)))` via integral `div` on positive longs, and the teleport
  * term is `floor(dampNum-complement·scale / (dampDen·N))` — every step
  * exact, so an unrolled SQL oracle reproduces the ranks bit-for-bit
  * (float PageRank would diverge across engines in last-ulp sums).
  * Overflow bound: `dampNum·r·w` must stay < 2^63 — r ≤ scale, so edge
  * weights up to ~9e16/(dampNum·scale) are safe (~1e9 at the default
  * scale; aggregate-before-rank keeps w at "distinct citing pages", not
  * raw occurrences).
  *
  * Scale shape per iteration: ONE hash join of edges with the (node,
  * rank) table on src (both sides partition by the join key; AQE picks
  * broadcast when ranks are dimension-sized) + ONE map-side-combining
  * aggregation on dst. Nothing driver-side except the node count (a
  * scalar). Dangling mass is dropped, not redistributed — documented
  * simplification, mirrored by the oracle.
  */
object GraphRank {

  /** Run `iters` exact damped-rank iterations over `edges`.
    *
    * EXECUTES EAGERLY (r15, ADVICE): the teleport term needs the node
    * count as a scalar, so construction runs the edge-staging
    * checkpoint jobs and one count before returning — the returned
    * frame is lazy only in its iteration joins. Callers that build
    * plans without consuming them (plan audits) pay those jobs.
    *
    * @param edges  (srcCol, dstCol, wCol) weighted edge list; weights
    *               positive LONGs; self-loops allowed (caller filters
    *               if undesired)
    * @return (node, rank) — every node in src ∪ dst, scaled-integer rank
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  wCol: String, iters: Int, scale: Long = 1000000L,
                  dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0 && scale > 0 && dampDen > 0 && dampNum >= 0 &&
      dampNum <= dampDen, s"bad config iters=$iters scale=$scale damp=$dampNum/$dampDen")
    // the edge list is read 2× per iteration plus twice at setup —
    // stage it once (at 100 TB recomputing the upstream edge
    // aggregation per reference would dominate the iterations); both
    // frames stay cached for the returned lazy plan, session teardown
    // (or the caller) cleans up
    // localCheckpoint, not persist (r14): every iteration re-analyzes
    // the edge lineage (for t15 that is the URL-extraction expression
    // tree — a ~50 KB plan measured before truncation); the checkpoint
    // hands the loop leaves. Tracked so session release frees the
    // leaf blocks (plain persist had no release path here at all).
    val e = CacheTracker.track(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .localCheckpoint())
    val nodes = CacheTracker.track(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .localCheckpoint())
    val n = nodes.count() // one scalar job; the only driver-side value
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val teleport = (dampDen - dampNum) * scale / (dampDen * n)
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 0 until iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outw, "src")
        .select(col("dst").as("node"),
          expr(s"($dampNum * rank * w) div ($dampDen * outw)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("c"), lit(0L))).as("rank"))
    }
    ranks
  }
}
