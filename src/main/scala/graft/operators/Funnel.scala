package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel (the event-analytics staple): per user, the
  * first time each stage of `stages` completes, where stage i counts
  * only STRICTLY AFTER the user's first completion of stage i-1 (a
  * purchase before the qualifying click is not a conversion).
  *
  * Plan shape: ONE exchange + one per-user sort; the stage state
  * machine is expressed as chained running-min windows over that single
  * sort — no self-joins, no per-user collect_list, so the only hot-key
  * bound is the per-user sort every sessionizer already carries
  * (documented at q18). The chained windows depend on each other
  * sequentially (stage i reads stage i-1's running min), so Catalyst
  * plans one Window node per stage — but all share the same
  * (user, ts, tie) distribution and sort, so the exchange and sort are
  * paid once.
  *
  * Reference scope: event-sequence analytics is north-star pipeline
  * work over the `events` table (reference has no event ops, SURVEY
  * §2.6).
  */
object Funnel {

  /** Per-user stage completion times: (userCol, s1..sN) where s_i is
    * the earliest qualifying time of stages(i-1), NULL if never
    * reached. `tieCol` makes the within-timestamp order deterministic.
    */
  def stageTimes(ev: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, tieCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    var df = ev
    stages.zipWithIndex.foreach { case (st, i) =>
      val qual =
        if (i == 0) when(col(typeCol) === st, col(tsCol))
        else when(col(typeCol) === st && col(tsCol) > col(s"__m${i - 1}"),
          col(tsCol))
      df = df.withColumn(s"__q$i", qual)
        .withColumn(s"__m$i", min(s"__q$i").over(w))
    }
    val aggs = stages.indices.map(i => min(s"__q$i").as(s"s${i + 1}"))
    df.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** One-row funnel report over [[stageTimes]]: total users, per-stage
    * completion counts, and integer conversion permille
    * (last stage / first stage).
    */
  def report(ev: DataFrame, userCol: String, typeCol: String,
             tsCol: String, tieCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(ev, userCol, typeCol, tsCol, tieCol, stages)
    val counts = count(lit(1)).as("n_users") +:
      stages.indices.map(i => count(s"s${i + 1}").as(s"n_stage${i + 1}"))
    times.agg(counts.head, counts.tail: _*)
      .withColumn("conv_permille",
        expr(s"CAST((1000 * n_stage${stages.size}) DIV n_stage1 AS BIGINT)"))
  }
}
