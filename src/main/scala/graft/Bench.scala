package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM once so the first measured query is not billed for
    // one-time init: codegen, parquet reader, broadcast + shuffle
    // machinery (worth ~3-8 s on whichever query runs first otherwise)
    locally {
      import org.apache.spark.sql.functions.broadcast
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(broadcast(r.limit(1)), r.columns.headOption.toSeq)
        .groupBy(r.columns.head).count()
        .write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column (count() would let
      // Catalyst prune payload expressions and under-measure)
      val failed = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); true }
      // a failed query records NEGATIVE elapsed — a sentinel so the
      // bench json can never pass off a crash as a fast success
      val elapsed = (System.nanoTime() - t0) / 1e9
      name -> (if (failed) -elapsed else elapsed)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
