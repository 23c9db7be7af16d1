// Whole-stage-codegen coverage audit: for every registered query, count
// WholeStageCodegen spans and flag CodegenFallback expressions — the
// brief's "widen the codegen spans" check, automated.
//
//   sbt "runMain graft.tools.CodegenAudit"             # sf0.001
//   sbt "runMain graft.tools.CodegenAudit <dir> [name ...]"
package graft.tools

object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = graft.GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    println(f"[codegen] ${"query"}%-24s ${"wsc"}%4s ${"fallback"}%8s ${"objectOps"}%9s")
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        // EXECUTE through the SAME QueryExecution first: under AQE the
        // pre-execution plan carries no codegen stages (and df.write
        // would plan a separate execution) — only after an action on
        // THIS df does toString show the final fused "*(n)" spans
        df.collect()
        val plan = df.queryExecution.executedPlan.toString()
        // codegen stages print as "*(n) Operator" in the plan string;
        // count DISTINCT span ids = number of fused codegen stages
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1).toInt).toSet.size
        // operators that NEVER codegen and cost per-row virtual calls
        val slow = "(?m)^(?!.*\\*\\()\\s*\\+?-? ?(SortMergeJoin|HashAggregate|Filter|Project)\\b".r
          .findAllIn(plan).size
        // typed/object boundaries (expected for Dataset.map / mapPartitions
        // paths — dca vectorize, multimodal decode): counted, not flagged
        val objs = "(MapElements|MapPartitions|DeserializeToObject)".r
          .findAllIn(plan).size
        val flag = if (wsc == 0 && objs == 0) "  <-- NO-CODEGEN" else ""
        println(f"[codegen] $name%-24s $wsc%4d $slow%8d $objs%9d$flag")
      } catch { case e: Exception =>
        println(s"[codegen] $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
