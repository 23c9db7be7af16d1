package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §7.3 minimum end-to-end slice — the reference README's
  * flagship pipeline (`README.md:45-68`): build a Ray frame
  * {pos: f32[*,3], dir: f32[*,3]}, mask on norm(dir) > eps, reshape,
  * apply a vectorized scalar method (normalize dir), and compare the
  * result against a driver-side Scala oracle.
  */
class RaySliceSpec extends SparkTestBase {

  private val raySchema = StructType(Seq(
    StructField("pos", ArrayType(DoubleType)),
    StructField("dir", ArrayType(DoubleType))))

  private def norm3(v: Seq[Double]): Double = math.sqrt(v.map(x => x * x).sum)

  test("flagship: construct -> mask -> reshape -> vectorized normalize -> oracle") {
    // 12 rays; every 4th has a near-zero direction (to be masked out)
    val raw = (0 until 12).map { i =>
      val dir = if (i % 4 == 3) Seq(1e-9, 0.0, 0.0)
                else Seq(i + 1.0, i + 2.0, i + 3.0)
      (Seq(i * 1.0, i * 2.0, i * 3.0), dir)
    }
    val rows = raw.map { case (p, d) => Row(p, d) }
    val rays = DcaFrame.fromLocal(spark, rows, raySchema)
    assert(rays.shape == Vector(12L))

    // ray = ray[norm(ray.dir) > 1e-7]  (README.md:53)
    val dirNorm = sqrt(aggregate(transform(col("dir"), x => x * x), lit(0.0), _ + _))
    val masked = rays.mask(dirNorm > 1e-7)
    assert(masked.shape == Vector(9L))

    // reshape to (3, 3)
    val grid = masked.reshape(3, 3)
    assert(grid.shape == Vector(3L, 3L))

    // vectorized scalar method over the batch: dir / norm(dir)
    val normalized = grid.replaceField("dir",
      transform(col("dir"), x => x / dirNorm))

    // oracle: same pipeline driver-side
    val want = raw.filter { case (_, d) => norm3(d) > 1e-7 }
      .map { case (_, d) => d.map(_ / norm3(d)) }
    val got = normalized.collectOrdered()
      .map(_.getSeq[Double](normalized.arrayCols.indexOf("dir")).toSeq).toSeq
    got.zip(want).foreach { case (g, w) =>
      g.zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
    // unit norm
    got.foreach(d => assert(math.abs(norm3(d) - 1.0) < 1e-12))
  }

  test("nested struct payload + static fields survive reshape/mask/stack") {
    val schema = StructType(Seq(
      StructField("x", DoubleType),
      StructField("iso", StructType(Seq(
        StructField("r", ArrayType(DoubleType)), StructField("t", DoubleType))))))
    val rows = (0 until 6).map(i => Row(i.toDouble, Row(Seq(i * 1.0, i * 2.0), i * 10.0)))
    val f = DcaFrame.fromLocal(spark, rows, schema)
      .replaceStatic("origin", "sensor-7")

    val g = f.reshape(3, 2).mask(col("iso.t") >= 20.0)
    assert(g.shape == Vector(4L))
    assert(g.statics == Map("origin" -> "sensor-7")) // statics untouched by every op
    val vals = g.df.orderBy("__idx0").selectExpr("iso.t").collect().map(_.getDouble(0)).toSeq
    assert(vals == Seq(20.0, 30.0, 40.0, 50.0))

    val stacked = DcaFrame.stack(Seq(g, g))
    assert(stacked.shape == Vector(2L, 4L))
    assert(stacked.statics == Map("origin" -> "sensor-7")) // from first element
  }
}
