package graft.operators

import graft.core.SparkTestBase

/** GraphRank semantics: hand-computed integer fixed-point values, the
  * symmetric-cycle invariant, and dangling-node behavior.
  */
class GraphRankSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int) =
    GraphRank.pageRankInt(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("symmetric cycle is a fixed point of the integer iteration") {
    // A->B->C->A: r0 = 333333; 50000 + floor(85*333333/100) = 333333
    val got = ranks(Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L)), 3)
    assert(got == Map("A" -> 333333L, "B" -> 333333L, "C" -> 333333L))
  }

  test("chain with dangling sink matches hand-computed values") {
    // A->B (w1), A->C (w1), B->C (w1); C dangling
    // iter1: B = 50000+floor(85*333333/200)=191666
    //        C = 50000+141666+floor(85*333333/100)=474999, A = 50000
    // iter2: B = 50000+floor(85*50000/200)=71250
    //        C = 50000+21250+floor(85*191666/100)=234166, A = 50000
    val e = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "C", 1L))
    assert(ranks(e, 1) == Map("A" -> 50000L, "B" -> 191666L, "C" -> 474999L))
    val r2 = ranks(e, 2)
    assert(r2 == Map("A" -> 50000L, "B" -> 71250L, "C" -> 234166L))
    assert(r2 == ranks(e, 2), "non-deterministic ranks")
  }

  test("edge weights steer mass") {
    // A cites B 9x and C 1x -> B gets ~9x C's citation mass
    val got = ranks(Seq(("A", "B", 9L), ("A", "C", 1L)), 1)
    // contrib(B) = floor(85*333333*9/1000) = 254999, C = floor(.../10 of it) = 28333
    assert(got("B") == 50000L + 254999L && got("C") == 50000L + 28333L)
  }
}
