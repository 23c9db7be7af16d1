package graft.functions

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.SparkTestBase
import graft.sources.GraftIO

/** Z-order key correctness and the layout property it exists for:
  * files written z-ordered cover narrow ranges in EVERY clustered
  * dimension, where a single-column sort leaves the others unpruned.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue matches the driver-side reference interleave") {
    val rows = for (x <- 0L until 40L; y <- 0L until 40L if (x + y) % 7 == 0)
      yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == ZOrder.zValueLocal(Seq(x, y), 16),
        s"mismatch at ($x, $y)")
    }
    // interleave structure: (1,0) -> bit 0, (0,1) -> bit 1
    assert(ZOrder.zValueLocal(Seq(1L, 0L), 16) == 1L)
    assert(ZOrder.zValueLocal(Seq(0L, 1L), 16) == 2L)
    assert(ZOrder.zValueLocal(Seq(3L, 5L), 16) == 39L) // 3=11, 5=101 -> 100111
  }

  test("masking keeps only the low bits; 63-bit budget is enforced") {
    assert(ZOrder.zValueLocal(Seq(65536L + 3L, 0L), 16) ==
      ZOrder.zValueLocal(Seq(3L, 0L), 16))
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(lit(1L), lit(1L)), 32)
    }
  }

  test("z-ordered files have narrow per-file ranges in BOTH dims; single-sort does not") {
    // uniform 64x64 grid, 4096 rows -> 8 files of 512
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val zdir = Files.createTempDirectory("zorder").toString
    val sdir = Files.createTempDirectory("singlesort").toString
    GraftIO.writeZOrdered(grid, zdir, Seq("x", "y"), bits = 6, nFiles = 8)
    grid.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sdir)

    def perFileSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .select("span").as[Long].collect()
      spans.sum.toDouble / spans.length
    }
    // x-sorted layout: x-spans tiny, y-spans full (63). Z-order: BOTH
    // spans must be well under the full extent — that is the pruning
    // property (any 2-d predicate then skips most files' stats ranges).
    val (zx, zy) = (perFileSpan(zdir, "x"), perFileSpan(zdir, "y"))
    val sy = perFileSpan(sdir, "y")
    assert(sy > 60.0, s"single-sort control should span y fully, got $sy")
    assert(zx < 40.0 && zy < 40.0,
      s"z-order per-file spans should be narrow in both dims, got x=$zx y=$zy")
  }
}
