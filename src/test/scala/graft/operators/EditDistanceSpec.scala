package graft.operators

import org.apache.spark.sql.functions._
import graft.core.SparkTestBase

/** FastSS deletion-neighborhood join must equal brute-force
  * levenshtein <= 1 on every pair class: substitution, insertion,
  * deletion, identical strings, and unrelated strings.
  */
class EditDistanceSpec extends SparkTestBase {
  import spark.implicits._

  private val fixture = Seq(
    1L -> "ring", 2L -> "rings", // insertion at end
    3L -> "ping",                // substitution
    4L -> "rin",                 // deletion
    5L -> "ring",                // identical -> lev 0
    6L -> "wrench",              // unrelated
    7L -> "sring",               // insertion at front
    8L -> "x",                   // short string
    9L -> "",                    // empty: lev("", "x") = 1
    10L -> "wrendh"              // substitution inside longer word
  ).toDF("k", "s")

  test("editDistanceJoin equals brute-force levenshtein <= 1") {
    val got = EditDistance.editDistanceJoin(fixture, "k", "s")
      .select("ka", "kb", "dist").as[(Long, Long, Long)].collect().toSet
    val expect = fixture.as("a").crossJoin(fixture.as("b"))
      .filter(col("a.k") < col("b.k") &&
        levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.k"), col("b.k"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(expect.exists(_._3 == 0L) && expect.exists(_._3 == 1L),
      "fixture must exercise both distances")
    assert(got == expect)
  }

  test("plan joins on variant hashes, not a cartesian product") {
    val plan = EditDistance.editDistanceJoin(fixture, "k", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
