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
  * The right row's values travel as ONE struct, so the window fill is
  * atomic: a right row with NULLs in some value columns can never be
  * "torn" across two different right rows.
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
    require(!leftCols.contains("asof_time"), "left must not already have an asof_time column")
    require(!valueCols.contains("asof_time"), "asof_time is reserved for the matched right time")
    require(!leftCols.contains("__rv"), "__rv is a reserved column name")

    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
      struct((col(rightTime).as("asof_time") +: valueCols.map(col)): _*).as("__rv"))

    // allowMissingColumns: left lacks __rv, right lacks the left payload
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    val matchedOnly = if (inner) filled.filter(col("__rv").isNotNull) else filled
    matchedOnly.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        (col("__rv.asof_time").as("asof_time") +:
          valueCols.map(c => col(s"__rv.$c").as(c))): _*)
  }
}
