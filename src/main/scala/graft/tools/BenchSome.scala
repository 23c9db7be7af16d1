// Quick single-query timing harness:
//   sbt "runMain graft.tools.BenchSome [--sf=DIR] [--cpus=N] q1 q2 ..."
// Flags beat env (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS): under
// `run / fork := true` a forked JVM inherits the SBT SERVER's
// environment, so env set on an `sbt --client` command line silently
// does not reach here — pass flags instead.
package graft.tools

object BenchSome {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    def flag(k: String, envK: String, dflt: String): String =
      flags.collectFirst { case f if f.startsWith(s"--$k=") => f.drop(k.length + 3) }
        .orElse(sys.env.get(envK)).getOrElse(dflt)
    val sfDir = flag("sf", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = flag("cpus", "SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    // scaling experiments: vary shuffle parallelism independently of
    // cores (a fixed partition count is the usual local super-linear
    // suspect — per-partition volume grows with SF until sorts spill)
    flags.collectFirst { case f if f.startsWith("--shuffle=") => f.drop(10) }
      .foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    spark.sparkContext.setLogLevel("WARN")
    println(s"[bench] sf=$sfDir cpus=$cpus shuffle=" +
      spark.conf.get("spark.sql.shuffle.partitions"))
    // warm-up, then noop sink per query (count() would let Catalyst
    // prune output expressions and under-measure — same as Bench).
    // upper() forces the one-time ICU case-mapping load (~14 s) out of
    // the first measured query — same warm-up as Bench.
    spark.range(1000).selectExpr("sum(id)", "upper('x')").write.format("noop").mode("overwrite").save()
    val wm = graft.WorkMetricsListener.install(spark)
    names.foreach { name =>
      val snap0 = wm.snapshotAfterDrain(spark)
      // time fn() AND the sink, like Bench: queries that stage or
      // prune driver-side (e.g. q93's Fagin candidate passes) do real
      // work inside fn — timing the write alone under-measures them.
      // Staged first-touch is split out exactly like Bench does, so a
      // standalone row here is directly comparable to a Bench net row.
      val st0 = graft.queries.Staged.stagingNanos.get()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val staging = (graft.queries.Staged.stagingNanos.get() - st0) / 1e9
      val net = (System.nanoTime() - t0) / 1e9 - staging
      val w = wm.snapshotAfterDrain(spark) - snap0
      println(f"[bench] $name%-20s ${net}%8.2f s" +
        (if (staging > 0.0005) f" (+ ${staging}%.2f s staging)" else "") +
        f"  [tasks=${w.tasks} shufR=${w.shuffleRead} shufW=${w.shuffleWrite}" +
        f" input=${w.inputBytes} spill=${w.memSpill}/${w.diskSpill}]")
    }
    spark.stop()
  }
}
