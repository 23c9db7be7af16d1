package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the event stream: watermarked tumbling
  * windows and gap-based sessionization via `flatMapGroupsWithState` —
  * the streaming mirror of the batch `q18_sessionize` query (same
  * semantics, incremental execution, bounded state).
  *
  * Scale notes: state is per-user and O(1) per open session; the
  * watermark bounds how long state lives; the shuffle is on user_id
  * exactly once (groupByKey), identical to the batch plan's single
  * shuffle.
  */
object EventStream {

  final case class Event(userId: Long, tsUs: Long, valueC: Long)
  final case class OpenSession(startUs: Long, endUs: Long, n: Long, valueC: Long)
  final case class Session(userId: Long, startUs: Long, endUs: Long,
                           nEvents: Long, valueC: Long)

  /** Tumbling watermarked window counts (append once finalized). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), window_), col("userId"))
      .agg(count(lit(1)).as("n"), sum("valueC").as("value_c"))

  /** Stream-stream interval join: each left event matches right events
    * of the same user within the trailing `windowUs` interval
    * (rts ∈ [lts - window, lts]). Both sides watermarked so Spark can
    * bound the join state — the state-cleanup contract that makes
    * stream-stream joins viable on an unbounded 100 TB/day stream.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, windowUs: Long,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left
      .withColumnRenamed("userId", "l_user").withColumnRenamed("valueC", "l_value")
      .withColumn("lts", timestamp_micros(col("tsUs"))).drop("tsUs")
      .withWatermark("lts", watermark)
    val r = right
      .withColumnRenamed("userId", "r_user").withColumnRenamed("valueC", "r_value")
      .withColumn("rts", timestamp_micros(col("tsUs"))).drop("tsUs")
      .withWatermark("rts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("rts") >= col("lts") - expr(s"INTERVAL $windowUs MICROSECONDS") &&
        col("rts") <= col("lts"))
  }

  /** Streaming exact dedup: drop duplicate event ids arriving within
    * the watermark window — the streaming face of the dedup operator
    * family (state is bounded by the watermark; exactly the semantics a
    * 100 TB ingest pipeline needs for at-least-once upstreams).
    */
  def streamingDedup(events: DataFrame, idCol: String,
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Gap-based sessionization: a session CLOSES (and is emitted) when a
    * later event of the same user arrives more than `gapUs` after the
    * session's end, or when event-time timeout fires past the
    * watermark. Out-of-order events within the gap extend the open
    * session in both directions.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapUs: Long, watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed: flush the open session
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startUs, s.endUs, s.n, s.valueC))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsUs > s.endUs + gapUs =>
                  closed += Session(userId, s.startUs, s.endUs, s.n, s.valueC)
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1L, e.valueC))
                case Some(s) if e.tsUs < s.startUs - gapUs =>
                  // late event more than a gap BEFORE the open session:
                  // by gap semantics it belongs to an earlier session —
                  // emit it as its own closed session (anything that
                  // could have merged with it is older still and would
                  // already be beyond the watermark), keep `open` as-is
                  closed += Session(userId, e.tsUs, e.tsUs, 1L, e.valueC)
                case Some(s) =>
                  open = Some(OpenSession(math.min(s.startUs, e.tsUs),
                    math.max(s.endUs, e.tsUs), s.n + 1, s.valueC + e.valueC))
                case None =>
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1L, e.valueC))
              }
            }
            open.foreach { s =>
              state.update(s)
              // flush when the watermark passes session end + gap
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
