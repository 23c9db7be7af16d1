package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: single-pass bounded top-k by score within a group.
  *
  * `groupBy(key).agg(TopKAgg(k).toColumn)` keeps only k (score, id)
  * pairs per partition and merges k-sized buffers — O(k) state, one
  * shuffle of k-row buffers per group. At scale this replaces the
  * `row_number().over(Window.partitionBy(key).orderBy(score))` + filter
  * pattern, which must shuffle and SORT every candidate row; for
  * top-k-of-millions-per-key the window sort is the bottleneck, the
  * aggregator is linear.
  *
  * Ordering: score DESC, id ASC tiebreak — identical to the window
  * formulation used by [[graft.operators.Similarity.bruteForceTopK]].
  */
final case class ScoredId(id: Long, score: Double)

class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    val (front, back) = buf.span(e => better(e, x))
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = insert(buf, x)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf
  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
