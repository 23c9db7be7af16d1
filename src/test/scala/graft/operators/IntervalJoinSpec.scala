package graft.operators

import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** IntervalJoin semantics: the binned equi-join must produce exactly
  * the brute-force overlap pair set, each pair exactly once, for every
  * bin width — and its plan must be a shuffle join, never a BNLJ.
  */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic interval fixtures: mixed lengths (0-length points,
  // spans crossing many bins), duplicates, negative coordinates
  private def mk(n: Int, seed: Int, pref: String) = {
    val rows = (0 until n).map { i =>
      val lo = ((i * 37 + seed * 11) % 83) - 20L      // negatives included
      val len = (i * 13 + seed) % 17                   // 0..16
      (i.toLong + seed * 1000, lo, lo + len)
    }
    rows.toDF(s"${pref}_id", s"${pref}_lo", s"${pref}_hi")
  }

  private def bruteForce(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame) =
    a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq

  test("overlapJoin equals brute force, once per pair, across bin widths") {
    val a = mk(40, 1, "a")
    val b = mk(35, 2, "b")
    val expect = bruteForce(a, b)
    assert(expect.nonEmpty && expect.size < 40 * 35, "fixture must be non-trivial")
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == expect.sorted, s"binWidth=$w: pair set mismatch")
      assert(got.size == got.distinct.size, s"binWidth=$w: duplicate pairs")
    }
  }

  test("gridOverlapStats recovers exact pair counts per overlap span without materializing pairs") {
    // includes duplicate (lo, hi) cells on both sides (mk's modular
    // fixtures repeat) — the nl × nr weighting must count every
    // underlying pair, matching the pair-materializing path exactly.
    val a = mk(40, 1, "a")
    val b = mk(35, 2, "b")
    val viaPairs = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7L)
      .groupBy(greatest(col("a_lo"), col("b_lo")).as("ostart"),
        least(col("a_hi"), col("b_hi")).as("oend"))
      .agg(count(lit(1)).as("n_pairs"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val viaGrid = IntervalJoin.gridOverlapStats(
          a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(viaGrid == viaPairs, s"binWidth=$w: grid stats diverge from pair path")
    }
  }

  test("overlapJoin plan is an equi join on the bin, not a BNLJ") {
    val a = mk(40, 1, "a")
    val b = mk(35, 2, "b")
    val plan = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join must not fall back to a nested loop:\n$plan")
  }

  test("exact binning beyond 2^53 (nanosecond-epoch axis)") {
    // floor(double)-based binning would mis-bin here: 2^53 + 1 and
    // 2^53 + 3 are distinct longs but the same double. Intervals at
    // ±(2^53 + k) with width-3 bins must land in exact bins, and the
    // negative side must floor (not truncate toward zero).
    val big = (1L << 53) + 1L // not representable as double (rounds to 2^53)
    val a = Seq((1L, big, big), (2L, -big, -big)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, big - 1L, big + 1L), // same bin as +big for w=3
                (11L, big + 2L, big + 4L), // adjacent bin, still overlaps? no: lo > a_hi
                (12L, -big - 1L, -big + 1L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 3L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 12L)), s"got $got")
  }

  test("touching endpoints count as overlap; disjoint do not") {
    val a = Seq((1L, 0L, 5L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 9L), (11L, 6L, 9L)).toDF("b_id", "b_lo", "b_hi")
    val got = IntervalJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .select("b_id").as[Long].collect().toSeq
    assert(got == Seq(10L))
  }
}
