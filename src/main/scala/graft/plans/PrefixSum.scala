package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan: GLOBAL running totals without the
  * single-partition window.
  *
  * `sum(x) OVER (ORDER BY ...)` with no PARTITION BY is the classic
  * scale trap: Spark plans `Exchange SinglePartition` and ONE task
  * sorts and scans the entire corpus. The textbook distributed answer
  * is a two-phase prefix sum — (1) range-partition + sort by the order
  * key (Spark's own global-sort machinery, demanded declaratively via
  * `requiredChildDistribution = OrderedDistribution`), (2) one tiny
  * job collects the per-partition sums (numPartitions longs — the
  * k-means-centroid class of driver control flow), (3) each partition
  * streams its rows once, adding its carry-in. No single task ever
  * holds more than its slice; the only driver data is one long per
  * partition.
  *
  * Spark cannot express this plan by composition, so it is the one
  * place the repo exercises the full custom-operator extension chain:
  * logical node ([[PrefixSumPlan]]) → strategy ([[PrefixSumStrategy]],
  * injected by `GraftExtensions` and installable per-session via
  * [[PrefixOps.install]]) → physical node ([[PrefixSumExec]]).
  *
  * Contract: the order columns must be a TOTAL order (ties would make
  * row-level cumulative values depend on the range partitioner's
  * run-to-run bounds); the value column must be LongType (the repo's
  * exact-integer discipline — float prefix sums are order-fragile by
  * nature). NULL values contribute 0. The child plan is executed
  * twice (phase 1 and phase 3 share the exchange's shuffle files, so
  * the second pass re-runs only the reduce-side sort).
  */
case class PrefixSumPlan(order: Seq[SortOrder], value: Expression,
                         cumAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr
  // cum is GENERATED here, not consumed from the child — declare it so
  // CheckAnalysis does not flag a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): PrefixSumPlan =
    copy(child = newChild)
}

object PrefixSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: PrefixSumPlan =>
      PrefixSumExec(p.order, p.value, p.cumAttr, planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class PrefixSumExec(order: Seq[SortOrder], value: Expression,
                         cumAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cumAttr :: Nil)
  // declare, don't implement: EnsureRequirements plans the range
  // exchange + in-partition sort exactly as it does for a global sort
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val bound = BindReferences.bindReference(value, child.output)
    val childRdd = child.execute()
    // phase 2: per-partition sums — numPartitions longs to the driver
    val perPart = childRdd.mapPartitions { it =>
      var s = 0L
      it.foreach { r =>
        val v = bound.eval(r)
        if (v != null) s += v.asInstanceOf[Long]
      }
      Iterator.single(s)
    }.collect()
    val carries = perPart.scanLeft(0L)(_ + _)
    // phase 3: stream each partition once with its carry-in
    childRdd.mapPartitionsWithIndex { (idx, it) =>
      var run = carries(idx)
      val cumRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)
      it.map { r =>
        val v = bound.eval(r)
        if (v != null) run += v.asInstanceOf[Long]
        cumRow.update(0, run)
        proj(joined(r, cumRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PrefixSumExec =
    copy(child = newChild)
}

/** User-facing surface of the operator. */
object PrefixOps {

  /** Idempotently add [[PrefixSumStrategy]] to the session's planner
    * (the runtime analog of wiring `GraftExtensions` at build time).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PrefixSumStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PrefixSumStrategy

  /** `df` plus a `cumName` LongType column holding the running total
    * of `valueCol` under the TOTAL order `orderCols` (ascending) — the
    * distributed `sum OVER (ORDER BY ...)` with no single-partition
    * stage. Columns are resolved against the analyzed plan by name so
    * the custom node enters analysis fully resolved.
    */
  def runningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
                   cumName: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"runningTotal: no column '$name' in ${analyzed.output.map(_.name)}"))
    val v = attr(valueCol)
    require(v.dataType == LongType,
      s"runningTotal requires a LongType value column; $valueCol is ${v.dataType}")
    val plan = PrefixSumPlan(
      orderCols.map(c => SortOrder(attr(c), Ascending)), v,
      AttributeReference(cumName, LongType, nullable = false)(), analyzed)
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, plan)
  }
}
