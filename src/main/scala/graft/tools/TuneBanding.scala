// LSH banding auto-tuner CLI: measures each candidate geometry on the
// corpus (or a deterministic 1-in-<den> sample) and prints the choice
// table, best first.
//
//   sbt "runMain graft.tools.TuneBanding /root/testdata/sf0.1"
//   sbt "runMain graft.tools.TuneBanding <dir> <budget> <recallAt> <sampleDen>"
package graft.tools

import graft.operators.Dedup
import graft.queries.Staged

object TuneBanding {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val budget = if (args.length > 1) args(1).toLong else 1000L
    val recallAt = if (args.length > 2) args(2).toDouble else 0.9
    val den = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hashed0 = Staged.docShingleHashes(spark, dir)
    val hashed = if (den > 1) Dedup.deterministicDocSample(hashed0, den) else hashed0
    val scale = den.toLong * den
    val choices = Dedup.tuneBanding(hashed, candidateBudget = budget / scale,
      recallAt = recallAt)
    println(f"[tune] dir=$dir budget=$budget recallAt=$recallAt sampleDen=$den")
    println(f"[tune] ${"bands"}%6s ${"rows"}%5s ${"cands"}%10s ${"extrap"}%10s " +
      f"${"recall"}%8s ${"j0"}%9s  ok?")
    choices.foreach { c =>
      println(f"[tune] ${c.bands}%6d ${c.rows}%5d ${c.candidates}%10d " +
        f"${c.candidates * scale}%10d ${c.recall}%8.4f ${c.impliedJ0}%9.5f  " +
        (if (c.recallOk && c.withinBudget) "BEST-FIRST"
         else if (!c.recallOk) "recall-miss" else "over-budget"))
    }
    spark.stop()
  }
}
