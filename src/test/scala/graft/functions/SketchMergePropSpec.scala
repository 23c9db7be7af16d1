package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Merge-algebra differencing for the native sketch aggregates
  * (round-11 VERDICT task 5): random partition splits + random merge
  * TREES through the real TypedImperativeAggregate code path
  * (update -> serialize -> deserialize -> merge -> eval, exactly the
  * stages Spark's partial aggregation runs) must be bit-for-bit equal
  * to the sequential typed reference folds ([[KMinAgg]]/[[TopKAgg]]),
  * whatever the split or merge order. This is the same one-semantic /
  * many-execution-orders idea as the reference's cross-backend test
  * matrix (array_dataclass_test.py:248-258) — here the "backends" are
  * shuffle topologies.
  *
  * Runs driver-only (BoundReference + InternalRow, no SparkSession),
  * so 300 generated cases per property stay in CI budget.
  */
object SketchMergePropSpec extends Properties("SketchMerge") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  // --- generators -------------------------------------------------------

  /** Split `xs` into 1..8 contiguous segments (some possibly empty). */
  private def split[A](xs: Vector[A], cuts: List[Int]): Vector[Vector[A]] = {
    val pts = cuts.map(c => if (xs.isEmpty) 0 else math.abs(c) % (xs.size + 1))
      .sorted.distinct
    val bounds = (0 :: pts ::: List(xs.size)).distinct.sorted
    val segs = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }.toVector
    if (segs.isEmpty) Vector(Vector.empty) else segs
  }

  /** Merge buffers in a random binary-tree order driven by `seed`:
    * repeatedly pick two random elements, merge, push back — covers
    * left-fold, right-fold, and balanced topologies.
    */
  private def mergeTree[B](bufs: Vector[B], seed: Long, merge: (B, B) => B): B = {
    val rnd = new scala.util.Random(seed)
    var pool = scala.collection.mutable.ArrayBuffer.from(bufs)
    while (pool.size > 1) {
      val i = rnd.nextInt(pool.size)
      val a = pool.remove(i)
      val j = rnd.nextInt(pool.size)
      val b = pool.remove(j)
      pool.append(merge(a, b))
    }
    pool.head
  }

  private val kGen = Gen.choose(1, 40)
  private val cutsGen = Gen.listOfN(7, Gen.choose(0, Int.MaxValue))
  private val seedGen = Gen.choose(Long.MinValue, Long.MaxValue)

  // --- kmin_sketch ------------------------------------------------------

  // narrow value domain => heavy duplication across segments, the case
  // where distinct-merge semantics can break
  private val kminValsGen: Gen[Vector[Long]] =
    Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 120L)).map(_.toVector))

  property("kmin_sketch merge tree == sequential KMinAgg fold") =
    forAll(kminValsGen, kGen, cutsGen, seedGen) { (vals, k, cuts, seed) =>
      val agg = KMinSketch(BoundReference(0, LongType, nullable = false), k)
      val segBufs = split(vals, cuts).map { seg =>
        val b = agg.createAggregationBuffer()
        seg.foreach(v => agg.update(b, InternalRow(v)))
        // exercise the exact shuffle serde Spark would run
        agg.deserialize(agg.serialize(b))
      }
      val merged = mergeTree(segBufs, seed, (a: KMinBuffer, b: KMinBuffer) => agg.merge(a, b))
      val got = agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toList
      val want = vals.foldLeft(List.empty[Long])((buf, h) => KMinAggTestAccess.insert(k, buf, h))
      got == want
    }

  // --- topk_sketch ------------------------------------------------------

  // scores from a tiny grid (forces id tiebreaks) plus occasional NaN;
  // ids drawn small enough to collide across segments
  private val topkRowsGen: Gen[Vector[(Long, Double)]] = {
    val score = Gen.frequency(
      8 -> Gen.choose(0, 6).map(_.toDouble / 3.0),
      1 -> Gen.const(Double.NaN),
      1 -> Gen.oneOf(Double.NegativeInfinity, Double.PositiveInfinity, -0.0d))
    val row = Gen.zip(Gen.choose(0L, 300L), score)
    Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, row).map(_.toVector))
  }

  property("topk_sketch merge tree == sequential TopKAgg fold (incl. NaN rejection)") =
    forAll(topkRowsGen, kGen, cutsGen, seedGen) { (rows, k, cuts, seed) =>
      val agg = TopKSketch(
        BoundReference(0, LongType, nullable = false),
        BoundReference(1, DoubleType, nullable = false), k)
      val segBufs = split(rows, cuts).map { seg =>
        val b = agg.createAggregationBuffer()
        seg.foreach { case (id, s) => agg.update(b, InternalRow(id, s)) }
        agg.deserialize(agg.serialize(b))
      }
      val merged = mergeTree(segBufs, seed, (a: TopKBuffer, b: TopKBuffer) => agg.merge(a, b))
      val arr = agg.eval(merged).asInstanceOf[ArrayData]
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getLong(0), r.getDouble(1))
      }.toList
      // row_number semantics need unique ids per distinct (id, score)
      // observation — dedup like the re-rank callers do, keeping first
      val fold = rows.foldLeft(new TopKAgg(k).zero) { case (buf, (id, s)) =>
        new TopKAgg(k).reduce(buf, ScoredId(id, s))
      }
      val want = new TopKAgg(k).finish(fold).map(e => (e.id, e.score)).toList
      // bit-for-bit: compare raw bits so -0.0 vs 0.0 and NaN payloads count
      got.map { case (i, s) => (i, java.lang.Double.doubleToRawLongBits(s)) } ==
        want.map { case (i, s) => (i, java.lang.Double.doubleToRawLongBits(s)) } &&
        got.forall(!_._2.isNaN)
    }
}
