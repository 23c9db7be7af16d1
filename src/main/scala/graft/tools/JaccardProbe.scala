package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.queries.Staged

/** Sizing probe for the prefix-filter jaccard join — calls the SHIPPED
  * candidate pipeline ([[Dedup.ngramJaccardCandidates]]) so the numbers
  * it reports cannot drift from the operator. Not part of the library
  * surface.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = Staged.docShingles(spark, dir)
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val nTok = timed("tokens")(
      sh.select(explode(col("__sh"))).count())
    // persist so the verify timing measures ONLY the verify join, not
    // a silent second pass of the candidate stage
    val cands = Dedup.ngramJaccardCandidates(sh, "doc_id", "__sh", num = 1, den = 2)
      .persist()
    val nCand = timed("candidate pairs")(cands.count())
    val nOut = timed("verified pairs")(
      Dedup.verifyJaccard(cands, sh, "doc_id", "__sh", num = 1, den = 2).count())
    println(s"[probe] tokens=$nTok cands=$nCand verified=$nOut")
    cands.unpersist()
    spark.stop()
  }
}
