package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial edge cases on the index algebra: scalar (0-d) frames,
  * multi-dim masks, simultaneous multi-axis strided slices, axis-1
  * concat, gather on 2-D frames — the shape classes the reference's
  * matrix tests sweep (`array_dataclass_test.py:289-390`).
  */
class EdgeCaseSpec extends SparkTestBase {
  import Indexing.Ix

  private val schema = StructType(Seq(StructField("x", DoubleType)))
  private def points(n: Int): DcaFrame =
    DcaFrame.fromLocal(spark, (0 until n).map(i => Row(i.toDouble)), schema)
  private def xs(f: DcaFrame): Seq[Double] =
    f.collectOrdered().map(_.getDouble(0)).toSeq

  test("scalar (0-d) frame: int-index to scalar, broadcast back up, reshape") {
    val s = points(5)(Ix.I(2)) // shape ()
    assert(s.shape == Vector() && s.size == 1L)
    assert(xs(s) == Seq(2.0))
    val up = s.broadcastTo(Seq(4))
    assert(up.shape == Vector(4L) && xs(up) == Seq(2.0, 2.0, 2.0, 2.0))
    val r = s.reshapeTo(Seq(1, 1))
    assert(r.shape == Vector(1L, 1L) && xs(r) == Seq(2.0))
    intercept[IllegalArgumentException](s.length) // len() of unsized
  }

  test("stack of scalar frames makes a 1-d batch") {
    val a = points(5)(Ix.I(1))
    val b = points(5)(Ix.I(3))
    val s = DcaFrame.stack(Seq(a, b))
    assert(s.shape == Vector(2L) && xs(s) == Seq(1.0, 3.0))
  }

  test("2-d mask flattens in row-major order") {
    val p = points(6).reshape(3, 2)
    val m = p.mask(col("x") =!= 2.0 && col("x") =!= 3.0)
    assert(m.shape == Vector(4L))
    assert(xs(m) == Seq(0.0, 1.0, 4.0, 5.0)) // row-major survivor order
  }

  test("simultaneous multi-axis strided slice p[::2, 1:]") {
    val p = points(12).reshape(4, 3)
    val s = p(Ix.S(None, None, 2), Ix.S(Some(1), None))
    assert(s.shape == Vector(2L, 2L))
    // rows 0,2; cols 1,2 -> x = r*3+c
    assert(xs(s) == Seq(1.0, 2.0, 7.0, 8.0))
  }

  test("concat along axis 1") {
    val a = points(4).reshape(2, 2)
    val b = points(6).reshape(2, 3).mapField(_ + 100)
    val c = DcaFrame.concat(Seq(a, b), axis = 1)
    assert(c.shape == Vector(2L, 5L))
    val byIdx = c.df.orderBy("__idx0", "__idx1").select("x").collect().map(_.getDouble(0)).toSeq
    assert(byIdx == Seq(0.0, 1.0, 100.0, 101.0, 102.0, 2.0, 3.0, 103.0, 104.0, 105.0))
    intercept[IllegalArgumentException](DcaFrame.concat(Seq(a, points(6).reshape(3, 2)), axis = 1))
  }

  test("gather on a 2-d frame gathers whole rows along axis 0") {
    val p = points(6).reshape(3, 2)
    val g = p.gather(Seq(2L, 0L))
    assert(g.shape == Vector(2L, 2L))
    assert(xs(g) == Seq(4.0, 5.0, 0.0, 1.0))
  }

  test("newaxis in the middle and trailing ellipsis") {
    val p = points(6).reshape(3, 2)
    val n = p(Ix.All, Ix.NewAxis, Ix.Ellipsis)
    assert(n.shape == Vector(3L, 1L, 2L))
    assert(xs(n.flatten) == (0 until 6).map(_.toDouble))
  }

  test("random reshape chains preserve row-major order (seeded)") {
    val rnd = new scala.util.Random(42)
    val n = 24
    val factorizations = Seq(
      Vector(24L), Vector(2L, 12L), Vector(3L, 8L), Vector(4L, 6L),
      Vector(2L, 3L, 4L), Vector(2L, 2L, 6L), Vector(3L, 2L, 2L, 2L))
    for (_ <- 0 until 10) {
      val chain = Seq.fill(3)(factorizations(rnd.nextInt(factorizations.size)))
      val p = chain.foldLeft(points(n))((f, shape) => f.reshapeTo(shape))
      assert(p.shape == chain.last)
      // flatten must always recover the original order: reshape is pure
      // index re-factoring, never a permutation
      assert(xs(p.flatten) == (0 until n).map(_.toDouble),
        s"chain $chain broke order")
    }
  }

  test("einops with three-way regroup and permutation") {
    // (a b c) with a=2,b=3,c=2 -> c (a b): full permute+regroup
    val p = points(12).reshapeEinops("(a b c) -> c (a b)", "a" -> 2L, "b" -> 3L, "c" -> 2L)
    assert(p.shape == Vector(2L, 6L))
    // element (c, a*3+b) = a*6 + b*2 + c
    val got = p.df.orderBy("__idx0", "__idx1").select("x").collect().map(_.getDouble(0)).toSeq
    val want = for (c <- 0 until 2; a <- 0 until 2; b <- 0 until 3)
      yield (a * 6 + b * 2 + c).toDouble
    assert(got == want)
  }
}
