package graft.testing

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.core.{DcaFrame, SparkTestBase}
import graft.testing.FrameAssertions._

/** graft.testing semantics vs the reference's test utilities
  * (`testing.py:38-85`): structure check first, allclose on float
  * leaves, exact elsewhere, statics and shape pinned.
  */
class FrameAssertionsSpec extends SparkTestBase {

  private val raySchema = StructType(Seq(
    StructField("pos", ArrayType(DoubleType)),
    StructField("dir", ArrayType(DoubleType))))

  /** testing.py's own fixture: a Ray batch (pos, dir float vectors). */
  private def rays(n: Int, jitter: Double = 0.0): DcaFrame =
    DcaFrame.fromLocal(spark,
      (0 until n).map(i => Row(
        Seq(i * 1.0 + jitter, i * 2.0, i * 3.0),
        Seq(1.0, 0.0, jitter))),
      raySchema)

  test("equal frames pass; a float perturbation fails with the diverging path") {
    assertFrameEqual(rays(4), rays(4))
    val e = intercept[FrameMismatch](assertFrameEqual(rays(4), rays(4, jitter = 1e-3)))
    assert(e.getMessage.contains("element[") && e.getMessage.contains("pos"),
      s"message should carry the tree path: ${e.getMessage}")
  }

  test("atol/rtol admit small drift, reject beyond tolerance (numpy allclose rule)") {
    assertFrameEqual(rays(4), rays(4, jitter = 1e-9), atol = 1e-6)
    intercept[FrameMismatch](
      assertFrameEqual(rays(4), rays(4, jitter = 1e-3), atol = 1e-6))
    // rtol scales with the RIGHT operand's magnitude
    assertAllClose(100.0000001, 100.0, rtol = 1e-8)
    intercept[FrameMismatch](assertAllClose(100.0000001, 100.0, rtol = 1e-11))
  }

  test("shape, schema, and statics mismatches are each named") {
    val p = rays(4)
    val eShape = intercept[FrameMismatch](assertFrameEqual(p, rays(6)))
    assert(eShape.getMessage.contains("shape mismatch"))
    val intSchema = StructType(Seq(
      StructField("pos", ArrayType(LongType)),
      StructField("dir", ArrayType(LongType))))
    val q = DcaFrame.fromLocal(spark,
      (0 until 4).map(i => Row(Seq(i.toLong, 0L, 0L), Seq(1L, 0L, 0L))), intSchema)
    val eSchema = intercept[FrameMismatch](assertFrameEqual(p, q))
    assert(eSchema.getMessage.contains("schema mismatch"))
    val eStatics = intercept[FrameMismatch](
      assertFrameEqual(p, p.copy(statics = Map("frame" -> "world"))))
    assert(eStatics.getMessage.contains("statics mismatch"))
  }

  test("tree comparison recurses through nested structs and maps; NaN equals NaN") {
    val inner = StructType(Seq(
      StructField("v", DoubleType),
      StructField("tags", MapType(StringType, DoubleType))))
    val schema = StructType(Seq(StructField("payload", inner)))
    def mk(v: Double) = DcaFrame.fromLocal(spark,
      Seq(Row(Row(v, Map("a" -> 1.0, "b" -> Double.NaN)))), schema)
    assertFrameEqual(mk(Double.NaN), mk(Double.NaN)) // NaN leaf, nested map
    val e = intercept[FrameMismatch](assertFrameEqual(mk(1.0), mk(2.0)))
    assert(e.getMessage.contains("payload.v"),
      s"nested path expected: ${e.getMessage}")
  }

  test("frames reaching the same values through different plans compare equal") {
    // the round-trip laws DcaFrameSpec pins by hand, via the public API:
    // reshape/flatten and broadcast/slice recover the source frame
    val p = rays(6)
    assertFrameEqual(p.reshape(2, 3).flatten, p)
    assertFrameEqual(p.reshape(3, 2).reshape(6), p)
  }
}
