package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-hygiene audit: print the formatted physical plan of each query
  * and grep-able one-line summaries (pushed filters, scan schema width,
  * join strategies, codegen spans). Run:
  *   sbt "runMain graft.tools.ExplainAll q2_filter_pushdown q3_join_topk"
  * (no args = every query).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS queryExecution's plan: under AQE the pre-execution
      // plan is the initial one — runtime join picks and codegen stages
      // only exist in the final plan (a separate write would plan its
      // own execution and leave this one unfinalized)
      val qe = df.queryExecution
      qe.executedPlan.execute().foreachPartition(_ => ())
      val plan = qe.executedPlan.toString()
      val scans = plan.linesIterator.filter(_.contains("FileScan")).map(_.trim.take(200)).toList
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("CartesianProduct")).map(_.trim.take(120)).toList
      val exchanges = plan.linesIterator.filter(_.contains("Exchange"))
        .map(_.trim.stripPrefix("+- ").stripPrefix(":- ").take(160)).toList
      // executedPlan.toString marks codegen stages with "*(n)" prefixes;
      // count distinct stage ids for the span count
      val wsc = """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"== $name  (exchanges~${exchanges.size}, codegenSpans=$wsc)")
      scans.foreach(s => println(s"   scan: $s"))
      joins.foreach(j => println(s"   join: $j"))
      exchanges.foreach(e => println(s"   xchg: $e"))
    }
    spark.stop()
  }
}
