package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** RankStats must reproduce the single-task window functions it
  * replaces EXACTLY — rank arithmetic, tie handling, group scoping —
  * while planning no window over more than nBuckets rows. Fixtures
  * deliberately stress ties (heavily repeated values) and tiny
  * nBuckets (so multi-bucket offset stitching is exercised even on
  * small data).
  */
class RankStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // (grp, v, key) — v repeats within and across groups
    ("a", 5L, 1L), ("a", 5L, 2L), ("a", 3L, 3L), ("a", 9L, 4L),
    ("a", 3L, 5L), ("a", 5L, 6L), ("a", 1L, 7L),
    ("b", 2L, 8L), ("b", 2L, 9L), ("b", 2L, 10L), ("b", 7L, 11L),
    ("b", 4L, 12L), ("b", 7L, 13L))

  test("cumulativeHistogram matches rank() arithmetic per group, asc and desc") {
    val df = rows.toDF("grp", "v", "key")
    for (asc <- Seq(true, false); nb <- Seq(2, 4096)) {
      val got = RankStats
        .cumulativeHistogram(df, Seq("grp"), "v", ascending = asc, nBuckets = nb)
        .as[(String, Long, Long, Long)].collect().toSet
      // local model: cnt = tie-block size, cum = rank of the block's
      // LAST row in the requested order
      val want = rows.groupBy(r => (r._1, r._2)).map { case ((g, v), block) =>
        val peers = rows.filter(_._1 == g)
        val cum = peers.count(r => if (asc) r._2 <= v else r._2 >= v)
        (g, v, block.size.toLong, cum.toLong)
      }.toSet
      assert(got == want, s"asc=$asc nBuckets=$nb")
    }
  }

  test("cumulativeHistogram with no group cols covers the whole frame") {
    val df = rows.toDF("grp", "v", "key")
    val got = RankStats.cumulativeHistogram(df, Seq.empty, "v", nBuckets = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._2).map { case (v, block) =>
      (v, block.size.toLong, rows.count(_._2 <= v).toLong)
    }.toSet
    assert(got == want)
  }

  test("rowNumberByValue == row_number() OVER (ORDER BY v DESC, key) exactly") {
    val df = rows.toDF("grp", "v", "key")
    for (nb <- Seq(2, 4096)) {
      val got = RankStats
        .rowNumberByValue(df, "v", "key", "r", nBuckets = nb)
        .select("key", "r").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("r",
          row_number().over(Window.orderBy(col("v").desc, col("key"))).cast("long"))
        .select("key", "r").as[(Long, Long)].collect().toMap
      assert(got == want, s"nBuckets=$nb")
    }
  }

  test("rowNumberByValue ascending matches the ascending window") {
    val df = rows.toDF("grp", "v", "key")
    val got = RankStats
      .rowNumberByValue(df, "v", "key", "r", ascendingValue = true, nBuckets = 2)
      .select("key", "r").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("r",
        row_number().over(Window.orderBy(col("v").asc, col("key"))).cast("long"))
      .select("key", "r").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("all-ties input (one value) still ranks 1..n by key") {
    val df = (1L to 50L).map(k => (0L, k)).toDF("v", "key")
    val got = RankStats.rowNumberByValue(df, "v", "key", "r", nBuckets = 4)
      .select("key", "r").as[(Long, Long)].collect().toMap
    assert(got == (1L to 50L).map(k => k -> k).toMap)
  }

  test("randomized differencing vs the window functions (5 seeds x 2 domains)") {
    // seeded random datasets, heavy-tie (domain 20) and sparse (domain
    // 10^9) value distributions, compared against row_number AND the
    // ntile arithmetic — the operating envelope of every RankStats
    // consumer (q93/q100/t51/q116/q115/t48)
    for (seed <- 1 to 5; domain <- Seq(20L, 1000000000L)) {
      val rnd = new scala.util.Random(seed)
      val n = 300 + rnd.nextInt(200)
      val rows = (1 to n).map { i =>
        (math.abs(rnd.nextLong()) % domain, i.toLong)
      }
      val df = rows.toDF("v", "key")
      val got = RankStats.rowNumberByValue(df, "v", "key", "r", nBuckets = 7)
        .withColumn("tile", expr(RankStats.ntileExprFromRank("r", n, 10)))
        .select("key", "r", "tile").as[(Long, Long, Long)]
        .collect().map { case (k, r, t) => k -> (r, t) }.toMap
      val want = df
        .withColumn("r", row_number()
          .over(Window.orderBy(col("v").desc, col("key"))).cast("long"))
        .withColumn("tile", ntile(10)
          .over(Window.orderBy(col("v").desc, col("key"))).cast("long"))
        .select("key", "r", "tile").as[(Long, Long, Long)]
        .collect().map { case (k, r, t) => k -> (r, t) }.toMap
      assert(got == want, s"seed=$seed domain=$domain n=$n")
    }
  }

  test("negative values and explicit bounds agree with the probe path") {
    val df = Seq(-9L, -3L, -3L, 0L, 12L, 12L, 40L).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "key")
    val probed = RankStats
      .cumulativeHistogram(df, Seq.empty, "v", nBuckets = 3)
      .as[(Long, Long, Long)].collect().toSet
    val bounded = RankStats
      .cumulativeHistogram(df, Seq.empty, "v", nBuckets = 3,
        bounds = Some((-9L, 40L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(probed == bounded)
    assert(probed.contains((-3L, 2L, 3L))) // two -3s, cum = 3 rows <= -3
  }
}
