package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join (both sides are interval sets).
  *
  * Reference analog: the range/slice machinery of the reference operates
  * on index intervals per array axis (reference `array_dataclass.py` —
  * slicing semantics); joining two interval SETS on overlap is the
  * relational generalization a 100-TB pipeline needs (e.g. joining time
  * ranges of two event families). The naive plan is a theta join — a
  * broadcast-nested-loop O(|L|·|R|) scale-killer. This operator is the
  * classic binned decomposition that turns it into an equi shuffle join:
  *
  *   1. Decompose each interval `[lo, hi]` into the bins of width `W`
  *      it covers: `explode(sequence(lo div W, hi div W))`. Row growth
  *      is `len/W + 1` per interval — bounded by choosing W near the
  *      median interval length.
  *   2. Equi-join on the bin id (plus any optional equi keys). The
  *      shuffle partitions by bin — at 100 TB this scales like any
  *      hash join; AQE handles calendar hot-spots (skewed bins).
  *   3. Keep a pair only where it FIRST overlaps: an overlapping pair
  *      shares the bin containing `greatest(l.lo, r.lo)` (that point
  *      lies in both intervals), and matches the overlap predicate in
  *      exactly that one bin — so no global `distinct` pass is needed
  *      to dedup multi-bin matches.
  *
  * Inclusive endpoints on both sides (`[lo, hi]`, touching counts as
  * overlap), matching the SQL predicate `l.lo <= r.hi AND r.lo <= l.hi`.
  */
object IntervalJoin {

  /** Join `left` and `right` on interval overlap.
    *
    * @param left      frame with `lLo`/`lHi` LONG columns (caller
    *                  converts dates/timestamps to a numeric axis first)
    * @param right     frame with `rLo`/`rHi` LONG columns; column names
    *                  must not collide with `left`'s
    * @param binWidth  bin width on the shared axis (choose ≈ median
    *                  interval length; larger ⇒ fewer replicas but
    *                  bigger bins)
    * @return one row per overlapping (left, right) pair carrying all
    *         columns of both sides — exactly once per pair
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lb = binned(left, lLo, lHi, binWidth, "__lbin")
    val rb = binned(right, rLo, rHi, binWidth, "__rbin")
    val firstBin = expr(floorDivSql(s"greatest(`$lLo`, `$rLo`)", binWidth))
    lb.join(rb, col("__lbin") === col("__rbin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__lbin") === firstBin)
      .drop("__lbin", "__rbin")
  }

  /** Overlap-pair STATISTICS without materializing pairs — the scale
    * path when the caller wants aggregates over overlapping pairs, not
    * the pairs themselves. [[overlapJoin]]'s output is one row per
    * pair, and at fixed axis length the pair count grows quadratically
    * with interval density (the round-8 q43 scale-killer: 19.8× time
    * on 10× data). This operator compresses each side to its DAY GRID
    * first — distinct `(lo, hi)` cells with multiplicities — so the
    * join runs over O(axisLen × distinct-lengths) grid cells per side
    * regardless of row count, and every pair-level aggregate is
    * recovered by weighting each cell pair by `nl × nr`:
    *
    *   1. `groupBy(lo, hi).count` per side — one map-side-combining
    *      shuffle, O(n) in rows, output bounded by the grid.
    *   2. [[overlapJoin]] on the two GRIDS (same binned equi-join,
    *      now over cells; pair count = distinct overlapping cell
    *      combos, independent of density).
    *   3. Group by `(ostart, oend)` summing `nl × nr`.
    *
    * Total cost O(n + grid²/bins) — linear in data, constant-bounded
    * join. Returns one row per distinct overlap span:
    * `(ostart, oend, n_pairs)` where `n_pairs` is the EXACT number of
    * interval pairs overlapping on `[ostart, oend]` — any downstream
    * aggregate of pair counts / overlap lengths derives from it.
    */
  def gridOverlapStats(left: DataFrame, right: DataFrame,
                       lLo: String, lHi: String, rLo: String, rHi: String,
                       binWidth: Long): DataFrame = {
    val gl = left.groupBy(col(lLo), col(lHi)).agg(count(lit(1)).as("__nl"))
    val gr = right.groupBy(col(rLo), col(rHi)).agg(count(lit(1)).as("__nr"))
    overlapJoin(gl, gr, lLo, lHi, rLo, rHi, binWidth)
      .groupBy(greatest(col(lLo), col(rLo)).as("ostart"),
        least(col(lHi), col(rHi)).as("oend"))
      .agg(sum(col("__nl") * col("__nr")).as("n_pairs"))
  }

  /** floor(x / w) for possibly-negative x, in EXACT long arithmetic —
    * the operator's contract is a generic LONG axis, and nanosecond
    * epochs (~1.7e18) exceed double's 2^53 exact range, so a
    * floor(double) round-trip would mis-bin. `pmod(x, w)` is the
    * non-negative remainder, making `x - pmod(x, w)` an exact multiple
    * of w; `DIV` (truncating) on an exact multiple IS floor division.
    * Precondition: x - pmod(x, w) must not underflow, i.e.
    * x >= Long.MinValue + w — trivially true for any real time axis.
    */
  private def floorDivSql(x: String, w: Long): String =
    s"(($x - pmod($x, ${w}L)) DIV ${w}L)"

  private def binned(df: DataFrame, lo: String, hi: String, w: Long,
                     binCol: String): DataFrame =
    df.withColumn(binCol,
      explode(sequence(expr(floorDivSql(s"`$lo`", w)),
        expr(floorDivSql(s"`$hi`", w)))))
}
