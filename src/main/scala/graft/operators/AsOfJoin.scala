package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — an operator Spark lacks natively (SURVEY §2.6
  * joins row): for each left row, attach the LATEST right row whose time
  * is <= the left time, per key.
  *
  * Implementation is the scalable union+running-window plan, not a range
  * join: tag both sides, union, then `last(value, ignoreNulls)` over a
  * running frame ordered by (time, tag). One shuffle on the key, linear
  * work per partition, no candidate-pair explosion — the plan you want
  * at 100 TB (a theta/range join would rescan right per left row; AQE
  * cannot save it).
  *
  * Ties: a right row at exactly the left time IS matched (tag orders
  * right before left). Multiple right rows per (key, time) must be
  * pre-deduplicated by the caller (deterministic output requires it).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side; one row per (key, time)
    * @param leftKey    join key column on left
    * @param rightKey   join key column on right
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param valueCols  right-side columns to attach (must not clash with
    *                   left column names)
    * @param inner      true drops left rows with no earlier right row
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true): DataFrame = {

    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols ${valueCols.filter(leftCols.contains)} clash with left columns")

    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val lAligned = valueCols.foldLeft(l)((d, c) => d.withColumn(c, lit(null)))

    val rBase = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .withColumn("__rt", col(rightTime))
    val rAligned = leftCols.foldLeft(rBase)((d, c) =>
      if (c == "__k" || c == "__t") d
      else d.withColumn(c, lit(null)))
      .select(("__k" +: "__t" +: "__tag" +: "__rt" +: (leftCols.filterNot(Seq("__k","__t").contains) ++ valueCols)).distinct.map(col): _*)

    val lFinal = lAligned.withColumn("__rt", lit(null).cast(rBase.schema("__rt").dataType))
      .select(("__k" +: "__t" +: "__tag" +: "__rt" +: (leftCols.filterNot(Seq("__k","__t").contains) ++ valueCols)).distinct.map(col): _*)

    val unioned = lFinal.unionByName(rAligned)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = (valueCols :+ "__rt").foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    val matchedOnly = if (inner) filled.filter(col("__rt").isNotNull) else filled
    matchedOnly.filter(col("__tag") === 1)
      .withColumnRenamed("__rt", "asof_time")
      .drop("__k", "__t", "__tag")
  }
}
