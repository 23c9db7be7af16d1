package graft.operators

import graft.core.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference greedy merge: one left-to-right non-overlapping pass —
    * the classic BPE merge order the string replace must reproduce.
    */
  private def foldMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  test("train: hand-computed merges, early stop, final segmentation") {
    val vocab = Seq(("abab", 2L), ("ab", 1L)).toDF("word", "freq")
    val (merges, seg) = Bpe.train(vocab, 5)
    // round 1: (a,b) weight 2*2+1 = 5 beats (b,a) weight 2
    // round 2: (ab,ab) weight 2; round 3: no pairs left -> early stop
    assert(merges == Seq(Bpe.Merge(1, "a", "b", 5L), Bpe.Merge(2, "ab", "ab", 2L)))
    val got = seg.orderBy("word").select("word", "seg").as[(String, String)]
      .collect().toList
    assert(got == List(("ab", "|ab|"), ("abab", "|abab|")))
    seg.unpersist()
  }

  test("tie-break: equal counts resolve by (lhs, rhs) lexicographic order") {
    // 'ba' and 'ab' each once: pairs (b,a) and (a,b) both weight 1
    val vocab = Seq(("ba", 1L), ("ab", 1L)).toDF("word", "freq")
    val (merges, seg) = Bpe.train(vocab, 1)
    assert(merges.head == Bpe.Merge(1, "a", "b", 1L))
    seg.unpersist()
  }

  test("anchored replace merge equals the reference fold on adversarial words") {
    // runs of the same pair (overlap greed), symbol-suffix collisions
    // ('xa' must not match the '|a||b|' pattern), and multi-round chains
    val words = Seq("aaaa", "aaa", "ababab", "xaab", "bbaab", "a", "")
    val df = words.toDF("word").select(col("word"), Bpe.initSeg(col("word")).as("seg"))
    for ((a, b) <- Seq(("a", "a"), ("a", "b"))) {
      val merged = df.withColumn("seg",
        call_function("replace", col("seg"), lit(s"|$a||$b|"), lit(s"|$a$b|")))
      val got = merged.select(col("word"), Bpe.symbols(col("seg")))
        .as[(String, Seq[String])].collect().toMap
      words.foreach { w =>
        val want = foldMerge(w.toList.map(_.toString), a, b)
        assert(got(w) == want, s"word=$w pair=($a,$b): ${got(w)} vs $want")
      }
    }
  }

  test("weighted argmax: frequency outvotes raw pair multiplicity") {
    // 'cd' appears 10x (one (c,d) pair each); 'abab' once (two (a,b))
    val vocab = Seq(("cd", 10L), ("abab", 1L)).toDF("word", "freq")
    val (merges, seg) = Bpe.train(vocab, 1)
    assert(merges.head == Bpe.Merge(1, "c", "d", 10L))
    seg.unpersist()
  }
}
