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
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 0) // right sorts BEFORE an equal-time left row
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    selectMatched(filled, leftCols, valueCols, inner)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right
    * row whose time is >= the left time, per key. Same union+window
    * plan as [[backward]], mirrored: `first(value, ignoreNulls)` over
    * the FOLLOWING frame. A right row at exactly the left time IS
    * matched (tag orders right after left here).
    */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 2) // left tag 1 sorts BEFORE an equal-time right row
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned.withColumn("__rv", first(col("__rv"), ignoreNulls = true).over(w))
    selectMatched(filled, leftCols, valueCols, inner)
  }

  /** Nearest as-of join: the closer of the backward and forward
    * matches; an exact distance tie resolves BACKWARD (and a right row
    * at exactly the left time is a zero-distance backward match).
    * Distances compare in integer microseconds — no float boundary
    * wobble — so the times must be temporal (date or timestamp).
    * Still one shuffle + one sort: both window fills share the same
    * (time, tag) order.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 0)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
    val back = last(col("__rv"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    // the FOLLOWING frame starts at the left row, so an equal-time
    // right row (tag 0, sorts earlier) is forward-invisible — it is
    // already the zero-distance backward match
    val fwd = first(col("__rv"), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val filled = unioned.withColumn("__b", back).withColumn("__f", fwd)
      .withColumn("__rv",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(us(col("__t")) - us(col("__b.asof_time")) <=
            us(col("__f.asof_time")) - us(col("__t")), col("__b"))
          .otherwise(col("__f")))
    selectMatched(filled, leftCols, valueCols, inner)
  }

  /** Shared output tail: inner-filter on the matched struct, keep only
    * left rows, unpack `__rv` next to the left payload.
    */
  private def selectMatched(filled: DataFrame, leftCols: Seq[String],
      valueCols: Seq[String], inner: Boolean): DataFrame = {
    val matchedOnly = if (inner) filled.filter(col("__rv").isNotNull) else filled
    matchedOnly.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        (col("__rv.asof_time").as("asof_time") +:
          valueCols.map(c => col(s"__rv.$c").as(c))): _*)
  }

  /** Shared tagged union: left rides with tag 1 and its full payload;
    * right contributes (key, time, rightTag) plus its values packed as
    * the atomic `__rv` struct.
    */
  private def tagAndUnion(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String], rightTag: Int): DataFrame = {
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
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(rightTag).as("__tag"),
      struct((col(rightTime).as("asof_time") +: valueCols.map(col)): _*).as("__rv"))
    l.unionByName(r, allowMissingColumns = true)
  }
}
