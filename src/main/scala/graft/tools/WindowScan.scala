package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort, Window => LWindow}

/** One-off audit scan: list every registered query whose OPTIMIZED
  * logical plan contains (a) a Window with an empty partitionSpec (the
  * single-task stage class) or (b) a GLOBAL Sort with no Aggregate
  * contraction beneath it (a fact-sized range exchange whose sampling
  * job double-executes the child) — inputs for ScaleSpec's global
  * guards.
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val wins = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.orderSpec.map(_.sql).mkString(",")
        }
        if (wins.nonEmpty) println(s"HIT $name :: ${wins.mkString(" | ")}")
        val sorts = plan.collect {
          case so: Sort if so.global &&
              so.child.collectFirst { case a: Aggregate => a }.isEmpty =>
            so.order.map(_.sql).mkString(",")
        }
        if (sorts.nonEmpty) println(s"SORT $name :: ${sorts.mkString(" | ")}")
        // (c) fact-sized windows partitioned on LOW-cardinality keys:
        // correct today, a parallelism ceiling at 100× (the r13 q108/q77
        // plan-audit class) — observed NDV of the partition keys over
        // the window's (uncontracted) input, flagged under 64
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.Project
        plan.collect {
          case w: LWindow if w.partitionSpec.nonEmpty &&
              w.child.collectFirst { case a: Aggregate => a }.isEmpty =>
            val proj = Project(w.partitionSpec.zipWithIndex.map {
              case (e, i) => Alias(e, s"__p$i")() }, w.child)
            val ndv = org.apache.spark.sql.graftbridge.GraftSqlBridge
              .ofRows(spark, proj).distinct().count()
            (w.partitionSpec.map(_.sql).mkString(","), ndv)
        }.filter(_._2 < 64).foreach { case (k, n) =>
          println(s"LOWCARD $name :: [$k] ndv=$n")
        }
      } catch {
        case e: Throwable => println(s"ERR $name :: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println("SCAN DONE")
    spark.stop()
  }
}
