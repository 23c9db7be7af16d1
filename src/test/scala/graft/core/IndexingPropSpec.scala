package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck oracle differencing for the indexing core (SURVEY §5
  * port strategy): random (dim, start, stop, step) slices compared
  * against a direct python-semantics model over Vector indices.
  */
object IndexingPropSpec extends Properties("Indexing") {
  import Indexing._

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
