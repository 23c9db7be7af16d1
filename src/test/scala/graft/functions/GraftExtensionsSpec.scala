package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must be instantiable by Spark's
  * `spark.sql.extensions` loader (no-arg constructor, applies cleanly
  * to a fresh SparkSessionExtensions). Full end-to-end function use is
  * covered by DedupSpec/SimilaritySpec via
  * [[VectorExpressions.register]] on the live session.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions applies its injections to a fresh extensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registers dot_f32
  }

  test("builder rejects wrong arity") {
    intercept[IllegalArgumentException](VectorExpressions.dotF32Builder(Seq.empty))
  }
}
