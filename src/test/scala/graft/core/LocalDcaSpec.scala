package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Parity of the driver-local eager twin ([[LocalDca]]) with the
  * distributed [[DcaFrame]] path — the round-13 toy-scale fast path.
  * The local twin shares the resolver ([[Indexing.resolve]]) and the
  * einops parser, so these tests pin the EXECUTION (coordinate walks
  * vs filters + joins), cell-by-cell, over seeded random shapes and
  * index expressions. Unlike IndexingFuzzSpec's independent model
  * (limited to one advanced index), parity fuzzing covers MULTIPLE
  * advanced indices too — both placement cases.
  */
class LocalDcaSpec extends SparkTestBase {

  private val payloadSchema = StructType(Seq(StructField("x", DoubleType)))

  private def linFrame(shape: Vector[Long]): DcaFrame = {
    val n = shape.product
    val flat = DcaFrame.fromLocal(spark,
      (0L until n).map(i => Row(i.toDouble)), payloadSchema)
    if (shape == Vector(n)) flat else flat.reshapeTo(shape)
  }

  private def localOf(shape: Vector[Long]): LocalDca = {
    val n = shape.product
    LocalDca((0L until n).map(i => Row(i.toDouble)).toVector, payloadSchema,
      Vector(n)).reshapeTo(shape)
  }

  /** (shape, payload xs in row-major order) of a distributed frame. */
  private def cellsOf(f: DcaFrame): (Vector[Long], Seq[Double]) =
    (f.shape, f.collectOrdered().toSeq.map(_.getDouble(0)))

  private def cellsOf(l: LocalDca): (Vector[Long], Seq[Double]) =
    (l.shape, l.rows.map(_.getDouble(0)))

  private def genShape(rng: Random): Vector[Long] =
    Vector.fill(1 + rng.nextInt(3))(1L + rng.nextInt(4))

  private def genItems(rng: Random, shape: Vector[Long]): Seq[Indexing.Ix] = {
    import Indexing.Ix
    val nIndexed = rng.nextInt(shape.length + 1)
    val base = (0 until nIndexed).map { ax =>
      val d = shape(ax)
      rng.nextInt(4) match {
        case 0 => Ix.I(rng.between(-d, d))
        case 1 => Ix.A(Vector.fill(1 + rng.nextInt(3))(rng.between(-d, d)))
        case _ =>
          val bound = () => if (rng.nextBoolean()) None
            else Some(rng.between(-d - 2, d + 3))
          val step = if (rng.nextBoolean()) 1L + rng.nextInt(3)
            else -(1L + rng.nextInt(3))
          Ix.S(bound(), bound(), step)
      }
    }
    val withEll =
      if (rng.nextBoolean() && base.nonEmpty) {
        val p = rng.nextInt(base.length + 1)
        (base.take(p) :+ Ix.Ellipsis) ++ base.drop(p)
      } else base
    if (rng.nextInt(3) == 0) {
      val p = rng.nextInt(withEll.length + 1)
      (withEll.take(p) :+ Ix.NewAxis) ++ withEll.drop(p)
    } else withEll
  }

  test("collectLocal round-trips payload order, shape, and statics") {
    val f = linFrame(Vector(3, 4)).replaceStatic("k", 7)
    val l = f.collectLocal()
    assert(l.shape == Vector(3L, 4L) && l.statics("k") == 7)
    assert(l.rows.map(_.getDouble(0)) == (0 until 12).map(_.toDouble))
    val back = l.toFrame(spark)
    assert(cellsOf(back) == cellsOf(f) && back.statics("k") == 7)
    // the guard: a frame above the threshold refuses to collect
    intercept[IllegalArgumentException](linFrame(Vector(64)).collectLocal(maxRows = 10))
  }

  test("fuzz: indexing parity with the distributed path (seeded, 120 cases, multi-advanced included)") {
    val rng = new Random(20260815)
    var multiAdvanced = 0
    (1 to 120).foreach { trial =>
      val shape = genShape(rng)
      val items = genItems(rng, shape)
      val f = linFrame(shape)
      val l = localOf(shape)
      val dist = scala.util.Try(cellsOf(f.apply(items: _*)))
      val loc = scala.util.Try(cellsOf(l.apply(items: _*)))
      (dist, loc) match {
        case (scala.util.Success(d), scala.util.Success(g)) =>
          assert(d == g, s"trial $trial shape=$shape items=$items: dist=$d local=$g")
          if (items.count(_.isInstanceOf[Indexing.Ix.A]) >= 2) multiAdvanced += 1
        case (scala.util.Failure(_), scala.util.Failure(_)) => () // both reject
        case (d, g) =>
          fail(s"trial $trial shape=$shape items=$items: dist=$d local=$g diverge on error")
      }
    }
    assert(multiAdvanced >= 3, s"generator drift: only $multiAdvanced multi-advanced cases")
  }

  test("fuzz: reshape / flatten / broadcast parity (seeded, 40 cases)") {
    val rng = new Random(42)
    (1 to 40).foreach { _ =>
      val shape = genShape(rng)
      val f = linFrame(shape)
      val l = localOf(shape)
      // random factorization reshape of the same size
      val n = shape.product
      val d = (1L to n).filter(n % _ == 0)
      val a = d(rng.nextInt(d.length))
      assert(cellsOf(f.reshape(a, -1L)) == cellsOf(l.reshape(a, -1L)))
      assert(cellsOf(f.flatten) == cellsOf(l.flatten))
      // broadcast: prepend a fresh dim and expand a dim-1 axis if any
      val target = (2L + rng.nextInt(2)) +: shape
      assert(cellsOf(f.broadcastTo(target)) == cellsOf(l.broadcastTo(target)))
    }
  }

  test("einops parity: split, merge, permute, unit axes") {
    for ((shape, pattern, axes) <- Seq(
        (Vector(6L), "(a b) -> a b", Seq("a" -> 2L)),
        (Vector(2L, 3L), "a b -> (a b)", Nil),
        (Vector(2L, 3L), "a b -> b a", Nil),
        (Vector(2L, 3L, 4L), "a b c -> c (a b)", Nil),
        (Vector(4L, 3L), "(a b) c -> b (c a)", Seq("a" -> 2L)))) {
      val f = linFrame(shape).reshapeEinops(pattern, axes: _*)
      val l = localOf(shape).reshapeEinops(pattern, axes: _*)
      assert(cellsOf(f) == cellsOf(l), s"$shape $pattern")
    }
  }

  test("stack / concat / mask / iter parity") {
    val shapes = Seq(Vector(3L, 2L), Vector(3L, 2L))
    val fs = shapes.map(linFrame)
    val ls = shapes.map(localOf)
    for (axis <- Seq(0, 1, -1)) {
      assert(cellsOf(DcaFrame.stack(fs, axis)) == cellsOf(LocalDca.stack(ls, axis)),
        s"stack axis=$axis")
      assert(cellsOf(DcaFrame.concat(fs, axis)) == cellsOf(LocalDca.concat(ls, axis)),
        s"concat axis=$axis")
    }
    val f = linFrame(Vector(4L, 3L))
    val l = localOf(Vector(4L, 3L))
    assert(cellsOf(f.mask(col("x") % 3 === 0)) ==
      cellsOf(l.mask(_.getDouble(0) % 3 == 0)))
    val fIter = f.iterFirstDim().map(cellsOf).toSeq
    val lIter = l.iterFirstDim().map(cellsOf).toSeq
    assert(fIter == lIter)
  }

  test("the fast path is driver-speed: chained index algebra with zero Spark jobs") {
    val l = localOf(Vector(100L, 60L))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val r = l.reshape(6000L)
      .apply(Indexing.Ix.S(Some(10L), Some(5000L), 7L))
      .mask(_.getDouble(0) % 2 == 0)
      .gather(Seq(4L, 0L, 4L))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "local ops must launch no Spark jobs")
    assert(r.shape == Vector(3L) && r.rows.map(_.getDouble(0)) == Seq(66.0, 10.0, 66.0))
  }
}
