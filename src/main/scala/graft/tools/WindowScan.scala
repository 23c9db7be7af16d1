package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** One-off audit scan: list every registered query whose OPTIMIZED
  * logical plan contains a Window with an empty partitionSpec (the
  * single-task stage class), with the window's order keys — input for
  * ScaleSpec's global no-partitionBy-window allowlist.
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val wins = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.orderSpec.map(_.sql).mkString(",")
        }
        if (wins.nonEmpty) println(s"HIT $name :: ${wins.mkString(" | ")}")
      } catch {
        case e: Throwable => println(s"ERR $name :: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println("SCAN DONE")
    spark.stop()
  }
}
