package graft.core

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

import Shape.Shape

/** Driver-local EAGER twin of [[DcaFrame]] — the toy-scale fast path.
  *
  * BASELINE.md's honest comparison shows the distributed plans pay a
  * ~100× constant (scheduling + codegen + exchange setup per op)
  * against the reference's in-process numpy model at sizes that fit one
  * address space. This class closes that gap WITHOUT touching the
  * distributed plans: a frame small enough to collect runs the same
  * index algebra eagerly over a driver-resident row vector (reshape is
  * O(1) metadata, slice/gather/mask are array walks), then re-enters
  * the distributed world via [[toFrame]] when the data grows.
  *
  * Semantics parity is BY CONSTRUCTION where it matters: indexing goes
  * through the same [[Indexing.resolve]] resolver and the same
  * advanced-index placement rule as `DcaFrame.apply`
  * (array_dataclass_test.py:459-494 numpy semantics), and einops
  * reshape goes through the same [[Einops]] parser/resolver.
  * LocalDcaSpec fuzzes the two paths cell-by-cell against each other.
  *
  * Invariant: `rows` is the payload in ROW-MAJOR batch order and
  * `rows.length == shape.product` — the eager analog of the dense
  * `__idx*` lattice.
  */
final case class LocalDca(
    rows: Vector[Row],
    schema: StructType,
    shape: Shape,
    statics: Map[String, Any] = Map.empty) {

  require(rows.length.toLong == Shape.size(shape),
    s"row count ${rows.length} != shape product ${Shape.size(shape)}")

  def ndim: Int = shape.length
  def size: Long = Shape.size(shape)

  /** len(p) — first batch dim (`array_dataclass.py:404-410`). */
  def length: Long = {
    require(ndim > 0, "len() of unsized object (scalar shape)")
    shape.head
  }

  /** bool(p) guard — same contract as [[DcaFrame.nonEmptyOrThrow]]. */
  def nonEmptyOrThrow(): Boolean = {
    require(ndim == 0 || shape.head != 0,
      "The truth value of an empty array is ambiguous")
    true
  }

  // -------------------------------------------------------------------
  // Shape algebra: reshape/flatten are O(1) — the numpy-view property
  // the distributed path cannot have (it recomputes __idx* columns).
  // -------------------------------------------------------------------

  def reshape(to: Long*): LocalDca = reshapeTo(to)

  /** Row-major reshape = metadata swap: the flat order is the identity
    * the distributed reshape recomputes per row.
    */
  def reshapeTo(to: Seq[Long]): LocalDca =
    copy(shape = Shape.resolveReshape(shape, to))

  def flatten: LocalDca = reshapeTo(Seq(-1L))

  /** einops reshape — same parser/resolver as the distributed path;
    * permutations materialize a reordered vector (numpy would too:
    * a permuted view is no longer row-major contiguous).
    */
  def reshapeEinops(pattern: String, axesLength: (String, Long)*): LocalDca = {
    val p = Einops.expandEllipsis(Einops.parse(pattern), ndim)
    val (sizes, newShape) = Einops.resolve(p, shape, axesLength.toMap)
    val srcStrides = Shape.strides(shape)
    val dstStrides = Shape.strides(newShape)
    val out = new Array[Row](rows.length)
    var lin = 0L
    while (lin < rows.length) {
      // source group coords, then per-name indices from the left groups
      val nameVal = scala.collection.mutable.Map.empty[String, Long]
      p.left.zipWithIndex.foreach { case (group, gi) =>
        val coord = (lin / srcStrides(gi)) % math.max(1L, shape(gi))
        val dims = group.map(sizes)
        val gst = dims.scanRight(1L)(_ * _).tail
        group.zip(gst).zip(dims).foreach { case ((n, st), d) =>
          nameVal(n) = (coord / st) % math.max(1L, d)
        }
      }
      // destination linear via the right groups
      var dlin = 0L
      p.right.zipWithIndex.foreach { case (group, gi) =>
        val dims = group.map(sizes)
        val gst = dims.scanRight(1L)(_ * _).tail
        val coord = group.zip(gst).map { case (n, st) => nameVal(n) * st }.sum
        dlin += coord * dstStrides(gi)
      }
      out(dlin.toInt) = rows(lin.toInt)
      lin += 1
    }
    LocalDca(out.toVector, schema, newShape, statics)
  }

  /** broadcast_to — same alignment rule as [[DcaFrame.broadcastTo]]
    * (new LEADING axes, dim-1 axes replicate).
    */
  def broadcastTo(target: Seq[Long]): LocalDca = {
    val t = target.toVector
    require(t.length >= ndim, s"broadcast_to target rank ${t.length} < current $ndim")
    val pad = t.length - ndim
    val padded = Vector.fill[Long](pad)(1L) ++ shape
    padded.zip(t).zipWithIndex.foreach { case ((o, n), i) =>
      require(o == n || o == 1L, s"cannot broadcast dim $i: $o -> $n")
    }
    if (t == shape) this
    else {
      val srcStrides = Shape.strides(shape)
      val n = Shape.size(t)
      require(n <= Int.MaxValue,
        s"broadcastTo refused: $n rows exceed the local 2^31 array bound — " +
          "use the distributed DcaFrame path for frames this size")
      val dstStrides = Shape.strides(t)
      val out = new Array[Row](n.toInt)
      var lin = 0L
      while (lin < n) {
        var src = 0L
        var i = pad
        while (i < t.length) {
          if (padded(i) != 1L)
            src += ((lin / dstStrides(i)) % t(i)) * srcStrides(i - pad)
          i += 1
        }
        out(lin.toInt) = rows(src.toInt)
        lin += 1
      }
      LocalDca(out.toVector, schema, t, statics)
    }
  }

  // -------------------------------------------------------------------
  // Indexing (S6/S8): same resolver, same placement rule as
  // DcaFrame.apply — eager coordinate walk instead of filters + joins.
  // -------------------------------------------------------------------

  def apply(items: Indexing.Ix*): LocalDca = {
    val resolved = Indexing.resolve(items, shape)
    val srcStrides = Shape.strides(shape)
    // basic stage over INTER axes (gather axes keep their full dim,
    // exactly like DcaFrame.apply's first pass); Ints fold into `base`.
    final case class InterAxis(len: Long, srcAxis: Int, start: Long, step: Long)
    var axis = 0
    var base = 0L
    val interB = Vector.newBuilder[InterAxis]
    val gathersB = Vector.newBuilder[(Int, Vector[Long])]
    var outPos = 0
    resolved.foreach {
      case (_, Indexing.Resolved.New) =>
        interB += InterAxis(1L, -1, 0L, 0L); outPos += 1
      case (_, Indexing.Resolved.Int(i)) =>
        base += i * srcStrides(axis); axis += 1
      case (_, Indexing.Resolved.Gather(idxs)) =>
        interB += InterAxis(shape(axis), axis, 0L, 1L)
        gathersB += ((outPos, idxs))
        axis += 1; outPos += 1
      case (_, Indexing.Resolved.Slice(start, step, len)) =>
        interB += InterAxis(len, axis, start, step)
        axis += 1; outPos += 1
    }
    val inter = interB.result()
    val gs = gathersB.result()
    def srcLinear(coords: IndexedSeq[Long]): Long = {
      var s = base
      var i = 0
      while (i < inter.length) {
        val a = inter(i)
        if (a.srcAxis >= 0) s += (a.start + coords(i) * a.step) * srcStrides(a.srcAxis)
        i += 1
      }
      s
    }
    def enumerate(outShape: Shape, toInter: IndexedSeq[Long] => IndexedSeq[Long]): LocalDca = {
      val n = Shape.size(outShape)
      require(n <= Int.MaxValue,
        s"apply refused: gather/slice output of $n rows exceeds the local " +
          "2^31 array bound — use the distributed DcaFrame path for frames this size")
      val dstStrides = Shape.strides(outShape)
      val out = new Array[Row](n.toInt)
      var lin = 0L
      while (lin < n) {
        val coords = outShape.indices.map(i => (lin / dstStrides(i)) % outShape(i))
        out(lin.toInt) = rows(srcLinear(toInter(coords)).toInt)
        lin += 1
      }
      LocalDca(out.toVector, schema, outShape, statics)
    }
    if (gs.isEmpty)
      enumerate(inter.map(_.len).toVector, identity)
    else {
      // numpy placement rule — IDENTICAL decision to DcaFrame.apply:
      // advanced items (ints count) separated by a slice/newaxis send
      // the zipped dim to the FRONT; adjacent ones insert in place.
      val advancedAt = resolved.zipWithIndex.collect {
        case ((_, Indexing.Resolved.Int(_)), i)    => i
        case ((_, Indexing.Resolved.Gather(_)), i) => i
      }
      val separated = advancedAt.size >= 2 &&
        resolved.slice(advancedAt.head + 1, advancedAt.last).exists {
          case (_, Indexing.Resolved.Slice(_, _, _)) => true
          case (_, Indexing.Resolved.New)            => true
          case _                                     => false
        }
      val positions = gs.map(_._1)
      val lists = gs.map(_._2)
      val non1 = lists.map(_.length).filter(_ != 1).distinct
      require(non1.size <= 1,
        "shape mismatch: indexing arrays could not be broadcast together " +
          s"with lengths ${lists.map(_.length).mkString(", ")}")
      val len = non1.headOption.getOrElse(1)
      val expanded = lists.map(l => if (l.length == len) l else Vector.fill(len)(l.head))
      if (!separated)
        require(positions.zip(positions.tail).forall { case (a, b) => b == a + 1 },
          s"internal: non-separated advanced indices must be adjacent, got $positions")
      val posSet = positions.toSet
      val kept = inter.indices.filterNot(posSet).toVector
      val insertAt = if (separated) 0 else kept.count(_ < positions.head)
      val keptBefore = kept.take(insertAt)
      val keptAfter = kept.drop(insertAt)
      val outShape: Shape =
        (keptBefore.map(i => inter(i).len) :+ len.toLong) ++ keptAfter.map(i => inter(i).len)
      enumerate(outShape, coords => {
        val interCoords = new Array[Long](inter.length)
        keptBefore.zipWithIndex.foreach { case (ax, i) => interCoords(ax) = coords(i) }
        val z = coords(insertAt)
        positions.zip(expanded).foreach { case (ax, l) => interCoords(ax) = l(z.toInt) }
        keptAfter.zipWithIndex.foreach { case (ax, i) => interCoords(ax) = coords(insertAt + 1 + i) }
        interCoords.toIndexedSeq
      })
    }
  }

  /** Boolean mask (S7): per-row predicate over the FLATTENED batch,
    * 1-D dense re-indexed result — same contract as [[DcaFrame.mask]].
    */
  def mask(pred: Row => Boolean): LocalDca = {
    val kept = rows.filter(pred)
    LocalDca(kept, schema, Vector(kept.length.toLong), statics)
  }

  /** Integer-array gather along axis 0 (S8). */
  def gather(indices: Seq[Long]): LocalDca = apply(Indexing.Ix.A(indices))

  /** Per-first-dim decomposition (S9) — contiguous row-major blocks. */
  def iterFirstDim(): Iterator[LocalDca] = {
    require(ndim > 0, "iteration over a 0-d array")
    val sub = shape.tail
    val block = Shape.size(sub).toInt
    (0L until shape.head).iterator.map { i =>
      LocalDca(rows.slice(i.toInt * block, (i.toInt + 1) * block), schema, sub, statics)
    }
  }

  // -------------------------------------------------------------------
  // Payload / statics
  // -------------------------------------------------------------------

  /** Eager per-element map (S11's driver analog — the reference's numpy
    * fn per field; typed Column math stays on the distributed path).
    */
  def mapRows(fn: Row => Row, newSchema: StructType = schema): LocalDca =
    copy(rows = rows.map(fn), schema = newSchema)

  def replaceStatic(name: String, value: Any): LocalDca =
    copy(statics = statics + (name -> value))

  /** Re-enter the distributed world: same payload, same shape, statics
    * carried — the crossover point when the data outgrows the driver.
    */
  def toFrame(spark: SparkSession): DcaFrame = {
    val f = DcaFrame.fromLocal(spark, rows, schema,
      shape = if (shape == Vector(rows.length.toLong)) null else shape)
    statics.foldLeft(f) { case (acc, (k, v)) => acc.replaceStatic(k, v) }
  }
}

object LocalDca {

  /** Eager twin of [[DcaFrame.stack]] (M1): new axis at `axis`. */
  def stack(frames: Seq[LocalDca], axis: Int = 0): LocalDca = {
    require(frames.nonEmpty, "stack of zero frames")
    val h = frames.head
    frames.tail.foreach { f =>
      require(f.shape == h.shape,
        s"stack shapes differ: ${h.shape} vs ${f.shape}")
      require(f.schema == h.schema,
        s"stack field schemas differ: ${h.schema} vs ${f.schema}")
    }
    val ax = Shape.toAbsoluteAxisInsert(axis, h.ndim)
    val newShape: Shape =
      (h.shape.take(ax) :+ frames.length.toLong) ++ h.shape.drop(ax)
    // row-major walk: outer = dims before ax, then frame id, then rest
    val outerN = Shape.size(h.shape.take(ax))
    val innerN = Shape.size(h.shape.drop(ax)).toInt
    val out = Vector.newBuilder[Row]
    var o = 0L
    while (o < outerN) {
      frames.foreach { f =>
        val off = o.toInt * innerN
        var i = 0
        while (i < innerN) { out += f.rows(off + i); i += 1 }
      }
      o += 1
    }
    LocalDca(out.result(), h.schema, newShape, h.statics)
  }

  /** Eager twin of [[DcaFrame.concat]] (M2): along existing `axis`. */
  def concat(frames: Seq[LocalDca], axis: Int = 0): LocalDca = {
    require(frames.nonEmpty, "concat of zero frames")
    val h = frames.head
    val ax = Shape.toAbsoluteAxis(axis, h.ndim)
    frames.tail.foreach { f =>
      require(f.ndim == h.ndim &&
        f.shape.zipWithIndex.forall { case (d, i) => i == ax || d == h.shape(i) },
        s"concat shapes differ off-axis: ${h.shape} vs ${f.shape}")
      require(f.schema == h.schema,
        s"concat field schemas differ: ${h.schema} vs ${f.schema}")
    }
    val newShape: Shape = h.shape.updated(ax, frames.map(_.shape(ax)).sum)
    val outerN = Shape.size(h.shape.take(ax))
    val innerN = Shape.size(h.shape.drop(ax + 1)).toInt
    val out = Vector.newBuilder[Row]
    var o = 0L
    while (o < outerN) {
      frames.foreach { f =>
        val block = f.shape(ax).toInt * innerN
        val off = o.toInt * block
        var i = 0
        while (i < block) { out += f.rows(off + i); i += 1 }
      }
      o += 1
    }
    LocalDca(out.result(), h.schema, newShape, h.statics)
  }
}
