// Times BASELINE.md's structural-op table three ways on sf0.1 lineitem:
// the distributed DcaFrame plan (warm), the LocalDca driver-local fast
// path (the round-13 short-circuit), and — for the honest numpy row —
// see tools/ref_compare.py. Usage:
//   sbt -batch "runMain graft.tools.LocalBench [--sf=DIR] [--cpus=N]"
package graft.tools

import org.apache.spark.sql.functions._

object LocalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.collectFirst { case f if f.startsWith("--sf=") => f.drop(5) }
      .getOrElse("/root/testdata/sf0.1")
    val cpus = args.collectFirst { case f if f.startsWith("--cpus=") => f.drop(7) }
      .getOrElse("32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.{DcaFrame, Indexing}
    import Indexing.Ix

    val f0 = graft.queries.Staged.liFrame(spark, sfDir)
    val n = f0.size
    // truncate to a multiple of 4 rows so the reshape matches BASELINE
    val f = f0(Ix.S(None, Some(n - n % 4), 1L))
    f.df.write.format("noop").mode("overwrite").save() // warm

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[localbench] $label%-42s ${(System.nanoTime() - t0) / 1e6}%10.2f ms")
      r
    }
    def sink(d: DcaFrame): Unit =
      d.df.write.format("noop").mode("overwrite").save()

    println(s"[localbench] rows=${f.size} sf=$sfDir cpus=$cpus")
    // distributed plans (warm, plan + execute + noop sink)
    time("spark: boolean mask + dense re-index") { sink(f.mask(col("qty_c") % 7 === 0)) }
    time("spark: reshape -> (n/4, 4)") { sink(f.reshape(f.size / 4, 4L)) }
    time("spark: strided slice [10:50000:7]") { sink(f(Ix.S(Some(10L), Some(50000L), 7L))) }
    time("spark: gather (5 indices)") { sink(f.gather(Seq(5L, 0L, 99999L, 7L, 5L))) }

    // local fast path: one collect, then eager in-process index algebra
    val l = time("local: collectLocal (one-time crossover)") { f.collectLocal(8L << 20) }
    val masked = time("local: boolean mask + dense re-index") {
      l.mask(r => r.getLong(r.fieldIndex("qty_c")) % 7 == 0) }
    val reshaped = time("local: reshape -> (n/4, 4)") { l.reshape(l.size / 4, 4L) }
    val sliced = time("local: strided slice [10:50000:7]") {
      l(Ix.S(Some(10L), Some(50000L), 7L)) }
    val gathered = time("local: gather (5 indices)") {
      l.gather(Seq(5L, 0L, 99999L, 7L, 5L)) }
    println(s"[localbench] check mask=${masked.size} reshape=${reshaped.shape} " +
      s"slice=${sliced.size} gather=${gathered.size}")
    spark.stop()
  }
}
