// Quick single-query timing harness: sbt "runMain graft.tools.BenchSome q1 q2 ..."
package graft.tools

import org.apache.spark.sql.SparkSession

object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up, then noop sink per query (count() would let Catalyst
    // prune output expressions and under-measure — same as Bench).
    // upper() forces the one-time ICU case-mapping load (~14 s) out of
    // the first measured query — same warm-up as Bench.
    spark.range(1000).selectExpr("sum(id)", "upper('x')").write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[bench] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
