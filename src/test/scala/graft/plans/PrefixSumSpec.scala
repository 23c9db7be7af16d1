package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.SparkTestBase

class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cum", sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "v", "cum")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

  test("prefix sum equals the single-partition window on a multi-partition input") {
    val df = spark.range(0, 10000).select(
        // scrambled order so range partitioning actually reshuffles
        ((col("id") * 48271) % 10000).as("k"),
        ((col("id") % 97) - 31).as("v"))
      .repartition(7)
    val got = PrefixOps.runningTotal(df, Seq("k"), "v", "cum")
      .select("k", "v", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == reference(df).toSeq)
  }

  test("plan is PrefixSumExec over a range exchange — no SinglePartition stage") {
    val df = spark.range(0, 1000).select(col("id").as("k"), lit(1L).as("v"))
      .repartition(5)
    val out = PrefixOps.runningTotal(df, Seq("k"), "v", "cum")
    val plan = out.queryExecution.executedPlan.toString()
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("PrefixSum ["), plan.take(800))
    assert(plan.contains("rangepartitioning"), plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
    // the window formulation this operator replaces DOES funnel into one
    // partition — the contrast that justifies the custom node
    val windowPlan = df.withColumn("cum", sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)))
      .queryExecution.executedPlan.toString()
    assert(windowPlan.contains("SinglePartition"), windowPlan.take(800))
  }

  test("nulls contribute zero and keep the running value") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "v")
    val got = PrefixOps.runningTotal(df, Seq("k"), "v", "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L), (2L, 5L), (3L, 12L)))
  }

  test("non-long value column and unknown columns are rejected eagerly") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixOps.runningTotal(df, Seq("k"), "v", "cum")
    }
    intercept[IllegalArgumentException] {
      PrefixOps.runningTotal(df.select(col("k"), col("v").cast("long").as("v")),
        Seq("nope"), "v", "cum")
    }
  }

  test("GraftExtensions injects the strategy at session build (no install call)") {
    // second-session pattern (GraftExtensionsSpec): a session built
    // WITH the extensions must plan PrefixSumPlan with no runtime
    // install — the spark.sql.extensions deployment path
    import org.apache.spark.sql.SparkSession
    graft.core.SparkTestBase.session // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      import s2.implicits._
      val df = Seq((2L, 10L), (1L, 1L)).toDF("k", "v")
      val analyzed = df.queryExecution.analyzed
      val plan = PrefixSumPlan(
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          analyzed.output.head,
          org.apache.spark.sql.catalyst.expressions.Ascending)),
        analyzed.output(1),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "cum", org.apache.spark.sql.types.LongType, nullable = false)(),
        analyzed)
      val got = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(s2, plan)
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, 1L), (2L, 11L)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(graft.core.SparkTestBase.session)
      SparkSession.setActiveSession(graft.core.SparkTestBase.session)
    }
  }
}
