package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch: keep the k smallest
  * DISTINCT hash values per group; the estimate is
  * `(k-1) * H / kth_min` (H = hash space size), or the exact distinct
  * count when fewer than k distinct hashes exist.
  *
  * Why this sketch (vs HLL, `q24_approx_distinct`): the whole
  * computation is exact integer arithmetic over a portable hash, so a
  * DuckDB oracle reproduces the ESTIMATE bit-for-bit — an
  * approximate-distinct operator with an exact cross-engine check
  * (`q33_kmv_distinct`). Same scale shape as HLL: O(k) state per
  * group, associative+commutative merge, one shuffle of k-value
  * buffers.
  */
final case class KmvState(mins: List[Long])

class KMinAgg(k: Int) extends Aggregator[Long, KmvState, KmvSummary] {
  private def insert(buf: List[Long], h: Long): List[Long] =
    KMinAgg.insert(k, buf, h)

  override def zero: KmvState = KmvState(Nil)
  override def reduce(b: KmvState, h: Long): KmvState = KmvState(insert(b.mins, h))
  override def merge(a: KmvState, b: KmvState): KmvState =
    KmvState(b.mins.foldLeft(a.mins)(insert))
  override def finish(b: KmvState): KmvSummary =
    KmvSummary(b.mins.length.toLong,
      if (b.mins.length >= k) b.mins(k - 1) else Long.MaxValue)
  override def bufferEncoder: Encoder[KmvState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[KmvSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** [[KMinAgg]]'s list-output variant: the FULL sorted min-value buffer
  * (ascending, distinct, ≤ k values) instead of the (count, kth-min)
  * summary. This is the form set-operation estimation needs
  * (`q69_kmv_setops`): two sketches merge into the union's sketch by
  * list merge, and the intersection estimate counts values present in
  * both source buffers — neither is recoverable from a KmvSummary.
  * Same O(k) mergeable-state scale shape.
  */
class KMinListAgg(k: Int) extends Aggregator[Long, KmvState, Array[Long]] {
  override def zero: KmvState = KmvState(Nil)
  override def reduce(b: KmvState, h: Long): KmvState =
    KmvState(KMinAgg.insert(k, b.mins, h))
  override def merge(a: KmvState, b: KmvState): KmvState =
    KmvState(b.mins.foldLeft(a.mins)(KMinAgg.insert(k, _, _)))
  override def finish(b: KmvState): Array[Long] = b.mins.toArray
  override def bufferEncoder: Encoder[KmvState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** (number of distinct hashes seen, capped at k; k-th smallest hash or
  * Long.MaxValue when fewer than k).
  */
final case class KmvSummary(nDistinct: Long, kthMin: Long)

object KMinAgg {
  /** Insert keeping the buffer sorted ascending, distinct, bounded at
    * k — the ONE buffer-maintenance rule shared by both aggregators
    * AND the streaming twin ([[graft.streaming.EventStream]]'s
    * streamingKmvDistinct folds with the identical rule, which is what
    * makes stream == batch provable).
    */
  private[graft] def insert(k: Int, buf: List[Long], h: Long): List[Long] = {
    if (buf.contains(h)) buf
    else {
      val (front, back) = buf.span(_ < h)
      val merged = front ::: h :: back
      if (merged.length > k) merged.take(k) else merged
    }
  }

  /** Estimate from a summary: exact below k, else (k-1)*H div kth —
    * integer floor division, identical to DuckDB `//`.
    */
  def estimate(s: KmvSummary, k: Int, hashSpace: Long): Long =
    if (s.nDistinct < k) s.nDistinct else ((k - 1).toLong * hashSpace) / s.kthMin

  /** Engine-portable scrambling mix on [0, 1e9+7): two rounds of
    * multiply-mod-p + xor-shift. KMV's uniformity assumption fails on
    * raw polynomial hashes (short similar strings cluster near low
    * values — measured 224% estimate error); after this mix the
    * estimate lands within ~2/sqrt(k) (5-13% measured at k=64).
    *
    * NOT injective: x^(x>>15) widens the domain past p, so the
    * following mult-mod-p can collapse pairs (≈2^-15 per pair — e.g.
    * scramble(0) == scramble(465384372)). Negligible for estimation,
    * but it means distinct-ness must be established AFTER scrambling
    * on BOTH engines (the q33 oracle dedups on the scrambled value,
    * matching the aggregator's buffer dedup) — deduping pre-scramble
    * on one side would diverge on a collision. Every op exists in
    * DuckDB BIGINT arithmetic (`xor`, `>>`, `%`) with no int64
    * overflow (max product 2.66e18 < 2^63).
    */
  def scramble(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val p = 1000000007L
    val x1 = pmod(h * lit(2654435761L), lit(p))
    val x2 = x1.bitwiseXOR(shiftright(x1, 15))
    val x3 = pmod(x2 * lit(48271L), lit(p))
    x3.bitwiseXOR(shiftright(x3, 13))
  }
}
