package graft.core

import Shape.Shape

/** numpy basic-indexing normalization, ported from
  * `_to_absolute_indices` (`array_dataclass.py:1006-1035`) plus Python
  * slice semantics: int / slice (incl. negative start/stop/step) /
  * ellipsis / newaxis. Pure driver-side logic — property-tested
  * against a local oracle (see IndexingSpec).
  */
object Indexing {

  /** User-facing index item (one per batch axis). */
  sealed trait Ix
  object Ix {
    final case class I(i: Long) extends Ix                               // p[3]
    final case class S(start: Option[Long] = None, stop: Option[Long] = None,
                       step: Long = 1L) extends Ix                       // p[a:b:c]
    final case class A(indices: Seq[Long]) extends Ix                    // p[[4,0,4]]
    case object Ellipsis extends Ix                                      // p[...]
    case object NewAxis extends Ix                                       // p[None]
    val All: S = S()
  }

  /** Resolved per-axis action against a concrete dim length. */
  sealed trait Resolved
  object Resolved {
    /** Select one element: axis disappears. */
    final case class Int(i: Long) extends Resolved
    /** Keep axis with python-slice (start, step, newLen); element k of
      * the new axis maps to old index start + k*step.
      */
    final case class Slice(start: Long, step: Long, newLen: Long) extends Resolved
    /** Integer-array gather on this axis (indices already resolved
      * non-negative); repeats allowed, order preserved — numpy "single
      * advanced index" semantics, which compose with the basic items as
      * sequential application.
      */
    final case class Gather(indices: Vector[Long]) extends Resolved
    /** Insert a new length-1 axis. */
    case object New extends Resolved
  }

  /** Expand `...`, validate arity, pad with full slices; then resolve
    * each item against its dim. Errors mirror the reference: double
    * ellipsis and too-many-indices raise.
    */
  def resolve(items: Seq[Ix], shape: Shape): Vector[(Option[Long], Resolved)] = {
    val nEll = items.count(_ == Ix.Ellipsis)
    require(nEll <= 1, "an index can only have a single ellipsis ('...')")
    val nReal = items.count(i => i != Ix.Ellipsis && i != Ix.NewAxis)
    require(nReal <= shape.length,
      s"too many indices for array: array is ${shape.length}-dimensional, but $nReal were indexed")
    // expand ellipsis to the missing full slices
    val expanded: Seq[Ix] = {
      val fill = Seq.fill(shape.length - nReal)(Ix.All)
      if (nEll == 1) items.flatMap { case Ix.Ellipsis => fill; case x => Seq(x) }
      else items ++ fill
    }
    // walk axes: NewAxis consumes no input dim
    var axis = 0
    expanded.iterator.map {
      case Ix.NewAxis => (Option.empty[Long], Resolved.New: Resolved)
      case ix =>
        val dim = shape(axis); axis += 1
        (Some(dim.toLong): Option[Long], resolveOne(ix, dim))
    }.toVector
  }

  private def resolveOne(ix: Ix, dim: Long): Resolved = ix match {
    case Ix.I(i0) =>
      val i = if (i0 < 0) i0 + dim else i0
      require(i >= 0 && i < dim, s"index $i0 is out of bounds for axis with size $dim")
      Resolved.Int(i)
    case Ix.S(startOpt, stopOpt, step) =>
      require(step != 0, "slice step cannot be zero")
      if (step > 0) {
        val start = clamp(startOpt.map(n => if (n < 0) n + dim else n).getOrElse(0L), 0L, dim)
        val stop  = clamp(stopOpt.map(n => if (n < 0) n + dim else n).getOrElse(dim), 0L, dim)
        val len   = math.max(0L, ceilDiv(stop - start, step))
        Resolved.Slice(start, step, len)
      } else {
        val start = clamp(startOpt.map(n => if (n < 0) n + dim else n).getOrElse(dim - 1), -1L, dim - 1)
        val stop  = stopOpt.map(n => if (n < 0) n + dim else n).map(clamp(_, -1L, dim - 1)).getOrElse(-1L)
        val len   = math.max(0L, ceilDiv(stop - start, step))
        Resolved.Slice(start, step, len)
      }
    case Ix.A(idxs) =>
      val resolvedIdx = idxs.toVector.zipWithIndex.map { case (i0, k) =>
        val i = if (i0 < 0) i0 + dim else i0
        require(i >= 0 && i < dim,
          s"index $i0 (position $k) is out of bounds for axis with size $dim")
        i
      }
      Resolved.Gather(resolvedIdx)
    case Ix.Ellipsis | Ix.NewAxis =>
      throw new IllegalStateException("unreachable: expanded earlier")
  }

  /** Resulting batch shape after applying resolved indices. With
    * `gatherKeepsDim=true`, gather axes keep their FULL input dim —
    * the intermediate shape before the gathers apply (used by
    * `DcaFrame.apply`, which runs the basic items first).
    */
  def resultShape(resolved: Seq[(Option[Long], Resolved)],
                  gatherKeepsDim: Boolean = false): Shape =
    resolved.collect {
      case (_, Resolved.Slice(_, _, len)) => len
      case (Some(dim), Resolved.Gather(_)) if gatherKeepsDim => dim
      case (_, Resolved.Gather(idxs))     => idxs.length.toLong
      case (_, Resolved.New)              => 1L
    }.toVector

  private def clamp(v: Long, lo: Long, hi: Long): Long = math.max(lo, math.min(hi, v))
  private def ceilDiv(a: Long, b: Long): Long = {
    // ceil(a/b) for the python-slice length formula; works for b<0 too
    val q = a / b
    if (q * b != a && ((a ^ b) >= 0)) q + 1 else q
  }
}
