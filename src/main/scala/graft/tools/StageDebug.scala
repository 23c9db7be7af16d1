package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage work breakdown for ONE query — the drill-down companion to
  * BenchSome's per-query counters: prints every completed stage's task
  * count, input/shuffle bytes and name so a query-level metric anomaly
  * (e.g. a scan whose bytes vanish from the totals) can be located.
  *   sbt "runMain graft.tools.StageDebug [--sf=DIR] [--cpus=N] <query>"
  */
object StageDebug {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    def flag(k: String, envK: String, dflt: String): String =
      flags.collectFirst { case f if f.startsWith(s"--$k=") => f.drop(k.length + 3) }
        .orElse(sys.env.get(envK)).getOrElse(dflt)
    val sfDir = flag("sf", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = flag("cpus", "SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println(s"[job ${j.jobId}] stages=${j.stageIds.mkString(",")}")
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        println(f"[stage ${si.stageId}%3d] ${wall}%6.2fs tasks=${si.numTasks}%4d " +
          f"cpu=${m.executorCpuTime / 1e9}%6.2fs " +
          f"input=${m.inputMetrics.bytesRead}%10d " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead}%9d " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten}%9d  ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000).selectExpr("sum(id)", "upper('x')")
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      println(s"== $name ==")
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.BusFlush.drain(spark.sparkContext)
    }
    spark.stop()
  }
}
