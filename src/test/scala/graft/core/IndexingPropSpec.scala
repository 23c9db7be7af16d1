package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck oracle differencing for the indexing core (SURVEY §5
  * port strategy): random (dim, start, stop, step) slices compared
  * against a direct python-semantics model over Vector indices.
  */
object IndexingPropSpec extends Properties("Indexing") {
  import Indexing._

  // 1000 generated cases per property (round-8 VERDICT task: widen the
  // fixed oracle grids) — every property here is driver-only index
  // arithmetic, so the whole object stays in CI budget.
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val dimGen = Gen.choose(0L, 40L)
  private val boundGen: Gen[Option[Long]] =
    Gen.option(Gen.choose(-50L, 50L))
  private val stepGen = Gen.oneOf(Gen.choose(1L, 7L), Gen.choose(-7L, -1L))

  /** Reference model: python slice via explicit index walk. */
  private def model(n: Long, start: Option[Long], stop: Option[Long], step: Long): Seq[Long] = {
    def norm(v: Long) = if (v < 0) v + n else v
    if (step > 0) {
      val a = math.max(0L, math.min(n, start.map(norm).getOrElse(0L)))
      val b = math.max(0L, math.min(n, stop.map(norm).getOrElse(n)))
      (a until b by step).toVector
    } else {
      val a = math.max(-1L, math.min(n - 1, start.map(norm).getOrElse(n - 1)))
      val b = stop.map(v => math.max(-1L, math.min(n - 1, norm(v)))).getOrElse(-1L)
      (a until b by step).toVector
    }
  }

  property("slice matches python semantics") =
    forAll(dimGen, boundGen, boundGen, stepGen) { (n, start, stop, step) =>
      val Vector((_, r)) = resolve(Seq(Ix.S(start, stop, step)), Vector(n))
      val got = r match {
        case Resolved.Slice(s0, st, len) => (0L until len).map(j => s0 + j * st)
        case other => throw new IllegalStateException(other.toString)
      }
      val want = model(n, start, stop, step)
      Prop(got == want) :| s"n=$n slice($start,$stop,$step): got $got want $want"
    }

  property("int indexing resolves negatives and bounds-checks") =
    forAll(Gen.choose(1L, 40L), Gen.choose(-60L, 60L)) { (n, i) =>
      val inRange = i >= -n && i < n
      try {
        val Vector((_, Resolved.Int(r))) = resolve(Seq(Ix.I(i)), Vector(n))
        Prop(inRange && r == (if (i < 0) i + n else i))
      } catch {
        case _: IllegalArgumentException => Prop(!inRange)
      }
    }

  property("reshape round-trips linear order") =
    forAll(Gen.choose(1L, 6L), Gen.choose(1L, 6L), Gen.choose(1L, 6L)) { (a, b, c) =>
      val s = Vector(a * b, c)
      val t = Shape.resolveReshape(s, Seq(a, b, c))
      Prop(t == Vector(a, b, c) && Shape.size(t) == Shape.size(s))
    }

  property("int-array index resolves negatives, keeps order+repeats, bounds-checks") =
    forAll(Gen.choose(1L, 20L), Gen.nonEmptyListOf(Gen.choose(-25L, 25L))) { (n, idxs) =>
      val allIn = idxs.forall(i => i >= -n && i < n)
      try {
        val Vector((_, Resolved.Gather(got))) = resolve(Seq(Ix.A(idxs)), Vector(n))
        val want = idxs.map(i => if (i < 0) i + n else i).toVector
        Prop(allIn && got == want) :| s"n=$n idxs=$idxs got=$got want=$want"
      } catch {
        case _: IllegalArgumentException => Prop(!allIn)
      }
    }

  // ---- full-expression fuzz: random shapes × random expressions ----

  /** One index item valid for axis size d (0-dim axes get slices only,
    * everything else in range so resolution must succeed).
    */
  private def itemGen(d: Long): Gen[Ix] = {
    val sliceG = for {
      start <- Gen.option(Gen.choose(-d - 2, d + 2))
      stop <- Gen.option(Gen.choose(-d - 2, d + 2))
      step <- Gen.oneOf(Gen.choose(1L, 3L), Gen.choose(-3L, -1L))
    } yield Ix.S(start, stop, step)
    if (d == 0) sliceG
    else Gen.frequency(
      3 -> Gen.choose(-d, d - 1).map(Ix.I(_)),
      4 -> sliceG,
      3 -> Gen.nonEmptyListOf(Gen.choose(-d, d - 1)).map(l => Ix.A(l.take(5))))
  }

  /** Random shape plus a random expression over it: k ≤ ndim explicit
    * items, optional ellipsis at any position (items after it bind to
    * TRAILING axes), 0-2 newaxes sprinkled in.
    */
  private val fullExprGen: Gen[(Vector[Long], List[Ix])] = for {
    ndim <- Gen.choose(1, 4)
    shape <- Gen.listOfN(ndim, Gen.choose(0L, 6L)).map(_.toVector)
    k <- Gen.choose(0, ndim)
    useEll <- Gen.oneOf(true, false)
    p <- Gen.choose(0, k) // ellipsis position among the k items
    headItems <- Gen.sequence[List[Ix], Ix](
      (0 until (if (useEll) p else k)).map(ax => itemGen(shape(ax))))
    tailItems <- Gen.sequence[List[Ix], Ix](
      (if (useEll) (ndim - (k - p)) until ndim else Seq.empty[Int])
        .map(ax => itemGen(shape(ax))))
    base = if (useEll) headItems ++ (Ix.Ellipsis :: tailItems) else headItems
    nNew <- Gen.choose(0, 2)
    positions <- Gen.listOfN(nNew, Gen.choose(0, base.length))
  } yield {
    val withNew = positions.sorted.reverse.foldLeft(base.toList) { (acc, pos) =>
      acc.take(pos) ::: (Ix.NewAxis :: acc.drop(pos))
    }
    (shape, withNew)
  }

  property("full expressions: expansion, per-axis resolution, and both result shapes") =
    forAll(fullExprGen) { case (shape, items) =>
      // independent expectation: expand ellipsis to full slices, walk
      // axes skipping newaxis, resolve each item with the local model
      val nReal = items.count(i => i != Ix.Ellipsis && i != Ix.NewAxis)
      val fill: List[Ix] = List.fill(shape.length - nReal)(Ix.S(None, None, 1L))
      val expanded: List[Ix] =
        if (items.contains(Ix.Ellipsis))
          items.flatMap { case Ix.Ellipsis => fill; case x => List(x) }
        else items ++ fill
      var axis = 0
      val want = expanded.map {
        case Ix.NewAxis => (None, None, Some(1L), None)
        case Ix.I(i0) =>
          val d = shape(axis); axis += 1
          (Some(if (i0 < 0) i0 + d else i0), None, None, Some(d))
        case Ix.S(a, b, st) =>
          val d = shape(axis); axis += 1
          (None, Some(model(d, a, b, st).toVector), None, Some(d))
        case Ix.A(idxs) =>
          val d = shape(axis); axis += 1
          (None, Some(idxs.toVector.map(i => if (i < 0) i + d else i)), None, Some(d))
        case Ix.Ellipsis => throw new IllegalStateException("expanded")
      }
      val got = resolve(items, shape)
      val pairwise = got.length == want.length && got.zip(want).forall {
        case ((dim, Resolved.New), (None, None, Some(1L), None)) => dim.isEmpty
        case ((dim, Resolved.Int(i)), (Some(wi), None, None, wd)) =>
          i == wi && dim == wd
        case ((dim, Resolved.Slice(s0, st, len)), (None, Some(widx), None, wd)) =>
          dim == wd && (0L until len).map(j => s0 + j * st).toVector == widx
        case ((dim, Resolved.Gather(idx)), (None, Some(widx), None, wd)) =>
          dim == wd && idx == widx
        case _ => false
      }
      // result shapes: gather dims count their index length (final) or
      // the ORIGINAL axis dim (intermediate, gatherKeepsDim); the
      // per-entry expectation was already verified above, so deriving
      // the shape expectation from `got`'s entries still checks
      // resultShape's own aggregation logic independently
      val finalShape = got.collect {
        case (_, Resolved.New) => 1L
        case (_, Resolved.Slice(_, _, len)) => len
        case (_, Resolved.Gather(idx)) => idx.length.toLong
      }.toVector
      val interShape = got.collect {
        case (_, Resolved.New) => 1L
        case (_, Resolved.Slice(_, _, len)) => len
        case (d, Resolved.Gather(_)) => d.get
      }.toVector
      Prop(pairwise &&
        resultShape(got) == finalShape &&
        resultShape(got, gatherKeepsDim = true) == interShape) :|
        s"shape=$shape items=$items got=$got"
    }

  property("mixed gather+slice result shape composes per numpy") =
    forAll(Gen.choose(1L, 12L), Gen.choose(1L, 12L),
        Gen.nonEmptyListOf(Gen.choose(0L, 11L)), boundGen, boundGen, stepGen) {
      (d0, d1, rawIdxs, start, stop, step) =>
        val idxs = rawIdxs.map(_ % d0)
        val resolved = resolve(Seq(Ix.A(idxs), Ix.S(start, stop, step)), Vector(d0, d1))
        val sliceLen = model(d1, start, stop, step).length.toLong
        val shape = resultShape(resolved)
        val inter = resultShape(resolved, gatherKeepsDim = true)
        Prop(shape == Vector(idxs.length.toLong, sliceLen) &&
          inter == Vector(d0, sliceLen)) :| s"shape=$shape inter=$inter"
    }
}
