package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for named queries to files —
  * the plan-evidence artifact the optimization rounds commit under
  * plans/rNN/. Run:
  *   sbt "runMain graft.tools.ExplainDump <outDir> <suffix> q1 q2 ..."
  * writes <outDir>/<query>_<suffix>.txt for each query.
  * SPARK_GRAFT_SF_DIR selects the data directory (plan shapes are
  * scale-independent; file sizes in scan nodes are not).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
