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
  * right before left). Multiple right rows per (key, time) are a caller
  * contract (deterministic output requires one row per (key, time));
  * pass `dedupRightBy` to have the operator enforce it with a max_by
  * tie-break instead.
  *
  * Every fill — backward AND forward — is a RUNNING frame
  * (unboundedPreceding → currentRow): Spark evaluates those
  * incrementally, O(rows) per key group. The forward fill gets its
  * running frame by ordering time DESCENDING, never a FOLLOWING frame
  * (Spark's UnboundedFollowingWindowFunctionFrame re-aggregates the
  * partition suffix per row — O(k²) on a hot key with k rows).
  */
object AsOfJoin {

  /** @param left         left (probe) side
    * @param right        right (reference) side; one row per (key, time)
    * @param leftKey      join key column on left
    * @param rightKey     join key column on right
    * @param leftTime     event-time column on left
    * @param rightTime    event-time column on right
    * @param valueCols    right-side columns to attach (must not clash
    *                     with left column names)
    * @param inner        true drops left rows with no earlier right row
    * @param dedupRightBy when Some(ord), pre-collapse duplicate right
    *                     (key, time) rows keeping the one maximizing
    *                     `ord` (max_by); `ord` should itself be unique
    *                     within a (key, time) group or the pick among
    *                     ord-ties is undefined. Costs one extra
    *                     (key, time) shuffle — only pay it when the
    *                     right side can actually carry duplicates.
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      dedupRightBy: Option[Column] = None,
      toleranceUs: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 0, dedupRightBy) // right sorts BEFORE an equal-time left row
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    selectMatched(filled, leftCols, valueCols, inner, toleranceUs)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right
    * row whose time is >= the left time, per key. Same union+window
    * plan as [[backward]], mirrored by ordering time DESCENDING so the
    * fill is still a running `last(value, ignoreNulls)` — incremental
    * O(k) per key group, robust to hot keys (a FOLLOWING-frame
    * formulation would re-aggregate the suffix per row, O(k²)). A right
    * row at exactly the left time IS matched (in the descending order,
    * tag 2 puts it before the equal-time left row).
    */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      dedupRightBy: Option[Column] = None,
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 2, dedupRightBy)
    // descending traversal: rows with time >= current come first, so the
    // running last(ignoreNulls) is the nearest right row at-or-after
    val w = Window.partitionBy("__k").orderBy(col("__t").desc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    selectMatched(filled, leftCols, valueCols, inner, toleranceUs)
  }

  /** Nearest as-of join: the closer of the backward and forward
    * matches; an exact distance tie resolves BACKWARD (and a right row
    * at exactly the left time is a zero-distance backward match).
    * Distances compare in integer microseconds — no float boundary
    * wobble — so the times must be temporal (date or timestamp).
    *
    * One shuffle, two sorts: the backward fill runs over the ascending
    * (time, tag) order, the forward fill over the descending order.
    * The second in-partition sort (no second exchange — both windows
    * partition by the same key) buys incremental O(k)-per-key fills;
    * the single-sort alternative needs a FOLLOWING frame whose O(k²)
    * re-aggregation collapses on hot keys.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      dedupRightBy: Option[Column] = None,
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val unioned = tagAndUnion(left, right, leftKey, rightKey, leftTime, rightTime,
      valueCols, rightTag = 0, dedupRightBy)
    val back = last(col("__rv"), ignoreNulls = true)
      .over(Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
        .rowsBetween(Window.unboundedPreceding, 0))
    // descending pass; the strict __tag ordering (right tag 0 sorts
    // AFTER left tag 1 descending) keeps an equal-time right row
    // forward-invisible — it is already the zero-distance backward match
    val fwd = last(col("__rv"), ignoreNulls = true)
      .over(Window.partitionBy("__k").orderBy(col("__t").desc, col("__tag").desc)
        .rowsBetween(Window.unboundedPreceding, 0))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val filled = unioned.withColumn("__b", back).withColumn("__f", fwd)
      .withColumn("__rv",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(us(col("__t")) - us(col("__b.asof_time")) <=
            us(col("__f.asof_time")) - us(col("__t")), col("__b"))
          .otherwise(col("__f")))
    selectMatched(filled, leftCols, valueCols, inner, toleranceUs)
  }

  /** Shared output tail: optional tolerance gate (a match farther than
    * `toleranceUs` microseconds from the left time counts as NO match —
    * the standard max-lookback/lookahead contract of time-series as-of
    * APIs; |distance| works unchanged for all three directions), then
    * inner-filter on the matched struct, keep only left rows, unpack
    * `__rv` next to the left payload.
    */
  private def selectMatched(filled0: DataFrame, leftCols: Seq[String],
      valueCols: Seq[String], inner: Boolean,
      toleranceUs: Option[Long] = None): DataFrame = {
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val filled = toleranceUs match {
      case None => filled0
      case Some(tol) => filled0.withColumn("__rv",
        when(col("__rv").isNotNull &&
          abs(us(col("__t")) - us(col("__rv.asof_time"))) <= tol, col("__rv")))
    }
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
      valueCols: Seq[String], rightTag: Int,
      dedupRightBy: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols ${valueCols.filter(leftCols.contains)} clash with left columns")
    require(!leftCols.contains("asof_time"), "left must not already have an asof_time column")
    require(!valueCols.contains("asof_time"), "asof_time is reserved for the matched right time")
    require(!leftCols.contains("__rv"), "__rv is a reserved column name")
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    // optional enforcement of the one-row-per-(key,time) contract: keep
    // the duplicate maximizing the tie-break (max_by; partial-aggregates
    // map-side, one (key,time) shuffle)
    val rightDeduped = dedupRightBy match {
      case None => right
      case Some(ord) =>
        right.groupBy(col(rightKey), col(rightTime))
          .agg(max_by(struct(valueCols.map(col): _*), ord).as("__vals"))
          .select(col(rightKey) +: col(rightTime) +:
            valueCols.map(c => col(s"__vals.$c").as(c)): _*)
    }
    val r = rightDeduped.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(rightTag).as("__tag"),
      struct((col(rightTime).as("asof_time") +: valueCols.map(col)): _*).as("__rv"))
    l.unionByName(r, allowMissingColumns = true)
  }
}
