package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split cannot help (e.g. a single hot key inside one task):
  * the left (large, skewed) side gets a random-but-deterministic salt
  * in [0, salts); the right side is replicated once per salt value; the
  * join key becomes (key, salt), spreading the hot key over `salts`
  * tasks. Output is identical to the plain join.
  *
  * The salt is derived from stable row content (hash of all left
  * columns), not rand(), so re-execution of a failed task produces the
  * same rows — a correctness requirement under Spark's recompute-based
  * fault tolerance at 1000-executor scale.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val saltArr = array((0 until salts).map(lit): _*)
    val r = right.withColumn("__salt", explode(saltArr))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
