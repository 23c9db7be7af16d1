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
  final case class SessionState(sessions: Seq[OpenSession])
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

  /** SLIDING watermarked window counts: each event lands in
    * duration/slide overlapping windows (`window(ets, dur, slide)` —
    * Spark expands the row into its windows before the agg, so the
    * state/shuffle cost scales with the overlap factor; keep
    * dur/slide small at 100 TB/day). Append emits a window once the
    * watermark passes its end, same as the tumbling path.
    */
  def slidingCounts(events: DataFrame, duration: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), duration, slide), col("userId"))
      .agg(count(lit(1)).as("n"), sum("valueC").as("value_c"))

  /** Streaming rolling 7-day active users — q70's online face: a
    * sliding `window(ets, 7 days, 1 day)` per-user aggregate (each
    * event expands into its ≤7 windows, state bounded by watermark ×
    * overlap) CHAINED into a per-window distinct-user count — two
    * stateful operators in one query, the Spark-4 multi-stateful
    * pipeline (watermark propagates through the first agg, so the
    * second finalizes windows exactly once in Append mode). The
    * per-(window, user) row count from stage 1 is exactly "user was
    * active in this window", so stage 2's plain count IS the distinct
    * count — no count-distinct state blowup.
    */
  def streamingWau(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "7 days", "1 day"), col("userId"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("wau"))

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

  /** Streaming document-cleaning pipeline — the online face of the
    * batch `t5_pipeline_e2e` chain: watermark-bounded exact dedup on
    * doc id (at-least-once upstreams re-deliver), quality gate,
    * language ID, then finalized per-(window, lang) corpus stats in
    * Append mode. Every per-row step is the SAME codegen'd Column
    * expression the batch queries use ([[graft.operators.TextOps]]) —
    * one operator library, two execution modes.
    *
    * Scale notes: dedup state is keyed by doc id and bounded by the
    * watermark; the only other stateful op is the windowed aggregate
    * (O(windows x langs) state). The per-row text analysis is
    * stateless and pipeline-parallel, so the plan survives arbitrary
    * input rates — exactly the ingest-time cleaning a 100 TB corpus
    * needs before documents ever land in the lake.
    *
    * Input schema: (doc_id long, tsUs long, text string).
    */
  def cleaningPipeline(docs: DataFrame, window_ : String = "1 hour",
                       watermark: String = "30 minutes"): DataFrame = {
    import graft.operators.TextOps
    val stamped = docs.withColumn("ets", timestamp_micros(col("tsUs")))
    // batch-equivalent semantics, one function: in a stream the dedup is
    // state-bounded by the watermark and keeps the FIRST ARRIVAL; on a
    // static frame Spark rejects dropDuplicatesWithinWatermark, and the
    // batch survivor must be DETERMINISTIC — dropDuplicates keeps an
    // arbitrary row, which diverges from the stream whenever duplicates
    // differ in time/text. Keep min-by (tsUs, text) instead: equal to
    // first-arrival under in-order duplicate delivery (the streaming
    // equivalence contract; EventStreamSpec pins stream==batch)
    val deduped =
      if (docs.isStreaming)
        stamped.withWatermark("ets", watermark).dropDuplicatesWithinWatermark("doc_id")
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("tsUs", "text")
        stamped.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    deduped
      .filter(TextOps.qualityPass(col("text"), length(col("text"))))
      .select(col("ets"), TextOps.langId(col("text")).as("lang"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy(window(col("ets"), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .select(col("window.start").as("w_start"), col("lang"),
        col("n_docs"), col("sum_tokens"))
  }

  final case class DocEvent(docId: Long, tsUs: Long, text: String)
  final case class BandHit(band: Int, key: String, docId: Long, tsUs: Long,
                           ets: java.sql.Timestamp)
  final case class BucketState(members: List[(Long, Long)])
  final case class CandPair(docA: Long, docB: Long, tsUs: Long)

  /** STREAMING near-dup candidate detection — the online face of the
    * d2 MinHash-LSH pipeline: each arriving document's signature
    * (computed per-row with the exact batch constants —
    * [[graft.operators.Dedup.minhashSignatureLocal]]) is split into
    * banded bucket keys; per-bucket state remembers earlier arrivals,
    * and each arrival emits candidate pairs against its bucket's prior
    * members. The ingest-time shape a 100 TB/day pipeline needs: a new
    * document's near-dup candidates are known the moment it arrives,
    * not at the next batch dedup run.
    *
    * Bucket keys carry the band VALUES (not a re-hash), so the
    * collision structure equals the batch operator's bucket-join
    * exactly (modulo murmur collisions that can only ADD batch
    * candidates) — EventStreamSpec pins streaming == batch candidates
    * on a shared fixture.
    *
    * Semantics/contract (same as batch d2): output is CANDIDATES at
    * LSH recall; verify exactly downstream (`Dedup.verifyJaccard` over
    * the candidate ids — candidates are tiny relative to the corpus).
    * A pair colliding in several bands or batches may be emitted more
    * than once — downstream verification/clustering is idempotent per
    * pair, callers needing exactly-once distinct within the watermark.
    *
    * Scale shape: state is per-(band, bucket), bounded by the
    * watermark (members older than the watermark are pruned each
    * invocation and idle buckets die by event-time timeout); the only
    * exchange is the groupByKey on short bucket keys — document text
    * never shuffles, exactly like the batch plan.
    */
  def nearDupCandidates(spark: SparkSession, docs: Dataset[DocEvent],
                        shingleN: Int = 3, bands: Int = 8, rows: Int = 2,
                        watermarkDelay: String = "30 minutes"): Dataset[CandPair] = {
    import spark.implicits._
    import graft.operators.{Dedup, TextOps}
    val k = bands * rows
    val hits = docs.flatMap { d =>
      Dedup.minhashSignatureLocal(TextOps.shinglesLocal(d.text, shingleN), k) match {
        case None => Iterator.empty
        case Some(sig) => (0 until bands).iterator.map { b =>
          BandHit(b, sig.slice(b * rows, (b + 1) * rows).mkString(","),
            d.docId, d.tsUs, new java.sql.Timestamp(d.tsUs / 1000L))
        }
      }
    }
    hits.withWatermark("ets", watermarkDelay)
      .groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows_, state) =>
          if (!rows_.hasNext) { state.remove(); Iterator.empty } // idle timeout
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // members older than the watermark can no longer meet an
            // above-watermark arrival they have not already met: prune
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(_._2 >= wmUs)
            val out = scala.collection.mutable.LinkedHashSet[CandPair]()
            rows_.toList.sortBy(_.tsUs).foreach { n =>
              if (!members.exists(_._1 == n.docId)) { // re-delivery guard
                members.foreach { case (mid, _) =>
                  out += CandPair(math.min(mid, n.docId),
                    math.max(mid, n.docId), n.tsUs)
                }
                members = (n.docId, n.tsUs) :: members
              }
            }
            state.update(BucketState(members))
            // die once every member is past the watermark horizon
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              members.map(_._2).max / 1000L + 1))
            out.iterator
          }
      }
  }

  /** Batch twin of [[sessionize]]: the `q18_sessionize` lag/cumsum plan
    * over a static frame, typed to the same [[Session]] rows (every
    * session is final in batch — there is no watermark). One gap
    * definition, two execution modes; EventStreamSpec pins
    * stream == batch on a shared fixture.
    */
  def sessionizeBatch(spark: SparkSession, events: Dataset[Event],
                      gapUs: Long): Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val wOrd = Window.partitionBy("userId").orderBy("tsUs", "valueC")
    events.toDF()
      .withColumn("prev_t", lag("tsUs", 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_t").isNull || col("tsUs") - col("prev_t") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_sess").over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("userId"), col("sid"))
      .agg(min("tsUs").as("startUs"), max("tsUs").as("endUs"),
        count(lit(1)).as("nEvents"), sum("valueC").as("valueC"))
      .select(col("userId"), col("startUs"), col("endUs"),
        col("nEvents"), col("valueC"))
      .as[Session]
  }

  /** Gap-based sessionization. State holds ALL open sessions for the
    * user (normally one; more when late data opens earlier sessions);
    * an event merges every session within `gapUs` of it — possibly
    * BRIDGING two sessions into one. A session closes (emitted, Append
    * mode — emission must be final) only when the event-time watermark
    * passes its end + gap, i.e. when no event that could still arrive
    * may extend it. Closing eagerly on a later event would fragment or
    * wrongly finalize sessions under late data.
    *
    * No fragmentation is possible across batches: Spark drops
    * flatMapGroupsWithState input rows older than the watermark, and a
    * session closes only once wm > end + gap — so any sibling that
    * could still merge (ts ≤ end + gap < wm) is dropped before it
    * reaches the operator, and any sibling that DOES arrive (ts ≥ wm)
    * always finds the session still open (EventStreamSpec pins both
    * halves of this argument). As defense in depth for runtimes
    * without input filtering, a session touched by this batch's events
    * is additionally never closed in the same invocation — it holds
    * until the next watermark advance fires the timeout, keeping
    * emission final.
    */
  /** Streaming Count-Min maintenance: the heavy-hitters sketch cells
    * (t7's geometry) as a running Update-mode aggregation over a
    * document stream — the SAME [[graft.operators.SketchState.cmsCells]]
    * rendering as batch, so the streamed sketch provably equals the
    * batch sketch over the same corpus (spec-pinned). State is the
    * d·w cell table — constant-bounded regardless of stream length,
    * which is the whole point of sketch maintenance.
    */
  def streamingCmsCells(docs: DataFrame,
                        bases: Seq[Int] = Seq(31, 37, 41, 43),
                        w: Int = 1024): DataFrame = {
    val terms = docs
      .select(explode(graft.operators.TextOps.words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    graft.operators.SketchState.cmsCells(terms, "term", bases, w)
  }

  final case class TypedEvent(userId: Long, tsUs: Long, eventType: String)
  final case class FunnelBufState(stageTimes: Seq[Long],
                                  buffer: Seq[(Long, String)], done: Boolean)
  final case class FunnelDone(userId: Long, stageTimes: Seq[Long])

  /** Streaming twin of the batch funnel ([[graft.operators.Funnel]]):
    * per-user ordered-sequence state machine over an out-of-order
    * stream. Events BUFFER until the watermark passes them, then fold
    * into the stage machine in event-time order — so arrival order
    * never changes the result and finalized completions equal the
    * batch plan exactly (spec-pinned). A completion is emitted once,
    * when the final stage first qualifies (stage i strictly after the
    * first completion of stage i-1 — same strict rule as batch, which
    * also makes same-timestamp ties order-independent).
    *
    * State: per-user stage times + the watermark-bounded buffer of
    * not-yet-final events; converted users keep a tombstone flag so
    * re-deliveries cannot re-emit.
    */
  def streamingFunnel(spark: SparkSession, events: Dataset[TypedEvent],
                      stages: Seq[String],
                      watermarkDelay: String = "30 minutes"): Dataset[FunnelDone] = {
    import spark.implicits._
    require(stages.nonEmpty, "need at least one funnel stage")
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[TypedEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelBufState, FunnelDone](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelBufState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelBufState(Seq.fill(stages.size)(-1L), Nil, done = false))
          if (st0.done) { rows.foreach(_ => ()); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // ts-order fold; events at/above the watermark hold (a
            // same-or-earlier sibling could still arrive)
            val buf = (st0.buffer ++ rows.map(e => (e.tsUs, e.eventType))).sorted
            val (ready, hold) = buf.partition(_._1 < wmUs)
            val times = st0.stageTimes.toArray
            ready.foreach { case (t, tp) =>
              val i = stages.indexOf(tp)
              if (i >= 0 && times(i) < 0 &&
                (i == 0 || (times(i - 1) >= 0 && t > times(i - 1))))
                times(i) = t
            }
            if (times.last >= 0) {
              state.update(FunnelBufState(times.toSeq, Nil, done = true))
              Iterator.single(FunnelDone(uid, times.toSeq))
            } else {
              state.update(FunnelBufState(times.toSeq, hold, done = false))
              if (hold.nonEmpty)
                state.setTimeoutTimestamp(math.max(
                  state.getCurrentWatermarkMs() + 1,
                  hold.map(_._1).min / 1000L + 1))
              Iterator.empty
            }
          }
      }
  }

  final case class DebEvent(userId: Long, eventType: String, tsUs: Long,
                            eventId: Long)
  final case class DebState(lastTs: Long, buffer: Seq[(Long, Long)])
  final case class DebRow(userId: Long, eventType: String, eventId: Long,
                          tsUs: Long)

  /** Streaming twin of the batch debounce (q96): drop an event within
    * `gapUs` of the previous SAME-(user, type) event. The keep rule is
    * ORDER-SENSITIVE (the gap is measured against the previous event
    * in event time, kept or not), so it uses [[streamingFunnel]]'s
    * watermark-ordered buffer discipline: events hold in keyed state
    * until the watermark passes them, then fold in (ts, eventId) order
    * — a late arrival BETWEEN two finalized events would have violated
    * the watermark, never silently flipped a keep decision. Kept
    * events emit exactly once (Append mode); state per key is one
    * lastTs long plus the watermark-bounded buffer.
    */
  def streamingDebounce(spark: SparkSession, events: Dataset[DebEvent],
                        gapUs: Long = 5000000L,
                        watermarkDelay: String = "30 minutes")
      : Dataset[DebRow] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[DebEvent]
      .groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState[DebState, DebRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[DebEvent], state: GroupState[DebState]) =>
          val st0 = state.getOption.getOrElse(DebState(Long.MinValue, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = (st0.buffer ++ rows.map(e => (e.tsUs, e.eventId))).sorted
          val (ready, hold) = buf.partition(_._1 < wmUs)
          var last = st0.lastTs
          val kept = scala.collection.mutable.ArrayBuffer.empty[DebRow]
          ready.foreach { case (t, id) =>
            if (last == Long.MinValue || t - last > gapUs)
              kept += DebRow(key._1, key._2, id, t)
            last = t
          }
          state.update(DebState(last, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, hold.map(_._1).min / 1000L + 1))
          kept.iterator
      }
  }

  final case class TrigEvent(userId: Long, tsUs: Long, eventId: Long,
                             eventType: String)
  final case class TrigState(p2: Option[(Long, Long, String)],
                             p1: Option[(Long, Long, String)],
                             buffer: Seq[(Long, Long, String)])
  final case class TrigramHit(userId: Long, e1: String, e2: String, e3: String,
                              tsUs: Long, eventId: Long)

  /** Streaming twin of the batch session-trigram mining (q106): emit
    * every 3-event within-session journey, keyed at its LAST event —
    * the downstream count/top-k is a plain streaming (or batch) agg
    * over the emitted trigrams. ORDER-SENSITIVE (both the gap-based
    * session break and the trigram adjacency depend on event-time
    * order), so it uses [[streamingFunnel]]'s watermark-ordered buffer
    * discipline: events hold in per-user state until the watermark
    * passes them, then fold in (ts, eventId) order; a late arrival
    * between finalized events would have violated the watermark, never
    * silently reshuffled a journey. State per user is the last TWO
    * finalized events of the open session plus the watermark-bounded
    * buffer; each trigram emits exactly once (Append mode).
    */
  def streamingSessionTrigrams(spark: SparkSession, events: Dataset[TrigEvent],
                               gapUs: Long = 1800L * 1000000L,
                               watermarkDelay: String = "30 minutes")
      : Dataset[TrigramHit] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[TrigEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[TrigState, TrigramHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TrigEvent], state: GroupState[TrigState]) =>
          val st0 = state.getOption.getOrElse(TrigState(None, None, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = (st0.buffer ++ rows.map(e => (e.tsUs, e.eventId, e.eventType)))
            .sorted
          val (ready, hold) = buf.partition(_._1 < wmUs)
          var p2 = st0.p2
          var p1 = st0.p1
          val out = scala.collection.mutable.ArrayBuffer.empty[TrigramHit]
          ready.foreach { case (t, id, tp) =>
            if (p1.exists(l => t - l._1 > gapUs)) { p1 = None; p2 = None }
            (p2, p1) match {
              case (Some(a), Some(b)) =>
                out += TrigramHit(uid, a._3, b._3, tp, t, id)
              case _ => ()
            }
            p2 = p1
            p1 = Some((t, id, tp))
          }
          state.update(TrigState(p2, p1, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, hold.map(_._1).min / 1000L + 1))
          out.iterator
      }
  }

  final case class AttrEvent(userId: Long, tsUs: Long, eventId: Long,
                             eventType: String, valueC: Long)
  final case class AttrState(lastTouch: Option[(Long, Long, String)],
                             buffer: Seq[(Long, Long, String, Long)])
  final case class Attribution(userId: Long, purchaseId: Long, tsUs: Long,
                               channel: String, valueC: Long)

  /** Streaming twin of the batch last-touch attribution (q60): every
    * purchase is credited to the user's most recent PRECEDING
    * non-purchase event type; 'direct' when none. Same
    * watermark-ordered buffer discipline as [[streamingFunnel]]:
    * events hold in per-user state until the watermark passes them,
    * then fold in (ts, eventId) order — so out-of-order delivery can
    * never flip a credit (a late-arriving touch BETWEEN two finalized
    * events would have violated the watermark, not the fold). State is
    * one (ts, id, type) triple plus the watermark-bounded buffer;
    * purchases emit exactly once, on finalization.
    */
  def streamingAttribution(spark: SparkSession, events: Dataset[AttrEvent],
                           watermarkDelay: String = "30 minutes")
      : Dataset[Attribution] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[AttrEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          val st0 = state.getOption.getOrElse(AttrState(None, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = (st0.buffer ++
            rows.map(e => (e.tsUs, e.eventId, e.eventType, e.valueC))).sorted
          val (ready, hold) = buf.partition(_._1 < wmUs)
          var touch = st0.lastTouch
          val out = scala.collection.mutable.ListBuffer.empty[Attribution]
          ready.foreach { case (t, id, tp, v) =>
            if (tp == "purchase")
              out += Attribution(uid, id, t, touch.map(_._3).getOrElse("direct"), v)
            else touch = Some((t, id, tp))
          }
          state.update(AttrState(touch, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, hold.map(_._1).min / 1000L + 1))
          out.iterator
      }
  }

  final case class CdcEvent(userId: Long, tsUs: Long, eventId: Long,
                            op: String, valueC: Long)
  final case class CdcState(tsUs: Long, eventId: Long, op: String,
                            valueC: Long, nVersions: Long)
  final case class CdcRow(userId: Long, tsUs: Long, valueC: Long,
                          nVersions: Long, deleted: Boolean)

  /** Streaming twin of the batch CDC compaction (q80): last-writer-wins
    * keyed state with delete tombstones, maintained live. Each
    * micro-batch folds arrivals under the SAME lexicographic
    * (tsUs, eventId) max rule as the batch `max(struct(...))` — a pure
    * commutative/associative fold, so arrival order (out-of-order
    * replays, duplicated micro-batches across retries of the same
    * epoch) can never change the converged state; no watermark-ordered
    * buffer is needed, unlike the funnel/attribution twins whose folds
    * are order-SENSITIVE. Tombstones are RETAINED in state rather than
    * dropped: a late upsert with a lower (ts, id) must still lose to
    * the delete; consumers filter `deleted`. Update mode: every
    * micro-batch emits the keys it touched with their CURRENT state —
    * the changelog a downstream materialized view applies. State is
    * one fixed-size record per live key (the minimum any keyed upsert
    * view can hold).
    */
  def streamingCompaction(spark: SparkSession, events: Dataset[CdcEvent])
      : Dataset[CdcRow] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[CdcEvent], state: GroupState[CdcState]) =>
          var cur = state.getOption.getOrElse(
            CdcState(Long.MinValue, Long.MinValue, "U", 0L, 0L))
          rows.foreach { e =>
            val wins = e.tsUs > cur.tsUs ||
              (e.tsUs == cur.tsUs && e.eventId > cur.eventId)
            cur =
              if (wins) CdcState(e.tsUs, e.eventId, e.op, e.valueC,
                cur.nVersions + 1)
              else cur.copy(nVersions = cur.nVersions + 1)
          }
          state.update(cur)
          CdcRow(uid, cur.tsUs, cur.valueC, cur.nVersions, cur.op == "D")
      }
  }

  final case class SampleDoc(source: String, docId: Long)
  final case class SamplerState(picked: Seq[(Long, Long)], nSeen: Long)
  final case class SampleRow(source: String, rank: Long, docId: Long,
                             nSeen: Long)

  /** JVM replica of the t45 sampler's hash chain — poly_hash (base-31
    * rolling hash of the decimal id string, mod 1e9+7) followed by
    * KMinAgg.scramble's multiply/xor-shift rounds. Must stay
    * BIT-IDENTICAL to the Column path (EventStreamSpec pins equality
    * against the SQL chain), so the streaming sample converges to the
    * exact batch selection. Overflow bound: h < 1e9+7 (< 2^30), so
    * `h * 2654435761` < 2^62 — inside signed-64 range, but with only
    * one bit of headroom; any added multiplier round or summation
    * must re-derive the bound.
    */
  private[graft] def sampleHash(id: Long): Long = {
    val p = 1000000007L
    var h = 0L
    id.toString.foreach(c => h = (h * 31 + c.toLong) % p)
    var x = (h * 2654435761L) % p
    x = x ^ (x >>> 15)
    x = (x * 48271L) % p
    x ^ (x >>> 13)
  }

  /** Streaming twin of the t45 consistent mixture sampler: per-source
    * bottom-k-by-scrambled-hash selection maintained LIVE in keyed
    * state — the training-mix manifest that stays current as a crawl
    * streams in. The fold is a set-min over a bounded ordered buffer:
    * commutative and idempotent, so arrival order, batching, and
    * replays can never change the converged selection (same argument
    * as [[streamingCompaction]]; spec-pinned against the batch
    * DataFrame chain). State per source is <= kMax (hash, id) pairs —
    * constant memory however large the corpus grows. Update mode:
    * each micro-batch re-emits the CURRENT selection (with ranks) of
    * every source it touched.
    */
  def streamingMixtureSample(spark: SparkSession, docs: Dataset[SampleDoc],
                             budget: String => Int, kMax: Int = 15)
      : Dataset[SampleRow] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[SamplerState, SampleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[SampleDoc], state: GroupState[SamplerState]) =>
          val st0 = state.getOption.getOrElse(SamplerState(Nil, 0L))
          var cur = st0.picked
          var seen = st0.nSeen
          rows.foreach { d =>
            seen += 1
            val e = (sampleHash(d.docId), d.docId)
            if (!cur.contains(e))
              cur = (e +: cur).sorted.take(kMax)
          }
          state.update(SamplerState(cur, seen))
          // nSeen rides along as the emission's MONOTONE version marker:
          // a consumer (or test) keeps the max-nSeen row per (source,
          // rank) and has the converged selection regardless of sink
          // ordering — the same role nVersions plays for the CDC twin
          cur.take(math.min(budget(src), kMax)).zipWithIndex.iterator
            .map { case ((_, id), i) => SampleRow(src, i + 1L, id, seen) }
      }
  }

  final case class KmvEvent(group: String, id: Long)
  final case class KmvStreamState(mins: List[Long], nSeen: Long)
  final case class KmvRow(group: String, estDistinct: Long, nSeen: Long)

  /** Streaming twin of the q33 KMV distinct sketch: per group, the
    * k-minimum-scrambled-hash buffer maintained LIVE in keyed state,
    * emitting the running distinct ESTIMATE after every micro-batch —
    * live cardinality monitoring (join-key explosion alarms, crawl
    * dedup ratios) without a full distinct shuffle. The fold is
    * [[graft.functions.KMinAgg.insert]] — the IDENTICAL sorted/
    * distinct/bounded rule the batch Aggregator uses — and set-min
    * folds are commutative + idempotent, so arrival order, batching,
    * and replays cannot change the converged buffer (spec-pinned
    * stream == batch on both orders). State per group is ≤ k longs;
    * estimate arithmetic is [[graft.functions.KMinAgg.estimate]]'s
    * exact integer division. nSeen is the monotone emission marker
    * (same contract as the CDC twin's nVersions).
    */
  def streamingKmvDistinct(spark: SparkSession, events: Dataset[KmvEvent],
                           k: Int = 64): Dataset[KmvRow] = {
    import spark.implicits._
    import graft.functions.{KMinAgg, KmvSummary}
    events.groupByKey(_.group)
      .mapGroupsWithState[KmvStreamState, KmvRow](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[KmvEvent], state: GroupState[KmvStreamState]) =>
          var cur = state.getOption.getOrElse(KmvStreamState(Nil, 0L))
          rows.foreach { e =>
            cur = KmvStreamState(
              KMinAgg.insert(k, cur.mins, sampleHash(e.id)), cur.nSeen + 1)
          }
          state.update(cur)
          val summary = KmvSummary(cur.mins.length.toLong,
            if (cur.mins.length >= k) cur.mins(k - 1) else Long.MaxValue)
          KmvRow(g, KMinAgg.estimate(summary, k, 1000000007L), cur.nSeen)
      }
  }

  final case class RateEvent(eventType: String, tsUs: Long)
  final case class RateState(pending: Map[Long, Long], history: Seq[(Long, Long)])
  final case class RateAnomaly(eventType: String, hr: Long, n: Long,
                               trailN: Long, trailSum: Long)

  /** Streaming twin of the batch rate-anomaly detector (q61): per
    * event type, hourly counts accumulate in state until the watermark
    * passes the HOUR END, then each finalized hour is tested against
    * the trailing-24h value-range window of previously-finalized
    * hours — the identical exact-integer cross-multiply rule
    * (n·trail_n·100 > trail_sum·150, trail_n ≥ 6), so finalized flags
    * equal the batch plan on any fixture (spec-pinned). State per type
    * is the pending hour→count map (watermark-bounded) plus the
    * trailing 24 finalized (hr, n) entries — silent hours hold no
    * entry, matching the batch RANGE frame's value semantics.
    */
  def streamingRateAnomaly(spark: SparkSession, events: Dataset[RateEvent],
                           watermarkDelay: String = "30 minutes")
      : Dataset[RateAnomaly] = {
    import spark.implicits._
    val HourUs = 3600L * 1000000L
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[RateEvent]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[RateState, RateAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tpe: String, rows: Iterator[RateEvent], state: GroupState[RateState]) =>
          val st0 = state.getOption.getOrElse(RateState(Map.empty, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var pending = st0.pending
          rows.foreach { e =>
            val hr = e.tsUs / HourUs
            pending = pending.updated(hr, pending.getOrElse(hr, 0L) + 1L)
          }
          // hours whose END the watermark has passed finalize, in order
          val (ready, hold) = pending.partition { case (hr, _) =>
            (hr + 1) * HourUs <= wmUs
          }
          var history = st0.history
          val out = scala.collection.mutable.ListBuffer.empty[RateAnomaly]
          ready.toSeq.sortBy(_._1).foreach { case (hr, n) =>
            val trail = history.filter(h => h._1 >= hr - 24 && h._1 <= hr - 1)
            val (tn, ts) = (trail.size.toLong, trail.map(_._2).sum)
            if (tn >= 6 && n * tn * 100L > ts * 150L)
              out += RateAnomaly(tpe, hr, n, tn, ts)
            history = (history :+ (hr, n)).filter(_._1 >= hr - 23)
          }
          state.update(RateState(hold, history))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              (hold.keys.min + 1) * HourUs / 1000L + 1))
          out.iterator
      }
  }

  final case class TrendState(pending: Map[Long, Long], hr0: Long,
                              n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long)
  final case class TrendPoint(eventType: String, hr: Long, nPts: Long,
                              slopePermille: Long, forecastNext: Long)

  /** Streaming twin of the batch OLS trend fit (q72): per event type,
    * hourly counts finalize under the watermark IN ORDER and fold into
    * RUNNING regression moments (n, Σx, Σy, Σxy, Σx²) — the closed-form
    * OLS terms are sums, so the state is O(1) per type and each
    * finalized hour emits the current exact-integer slope permille +
    * next-hour forecast with q72's arithmetic (x = hour − first
    * finalized hour; silent hours hold no point, matching the batch
    * hourly table). Emits from the second point on (the fit needs two).
    */
  def streamingTrend(spark: SparkSession, events: Dataset[RateEvent],
                     watermarkDelay: String = "30 minutes"): Dataset[TrendPoint] = {
    import spark.implicits._
    val HourUs = 3600L * 1000000L
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[RateEvent]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[TrendState, TrendPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tpe: String, rows: Iterator[RateEvent], state: GroupState[TrendState]) =>
          val st0 = state.getOption.getOrElse(
            TrendState(Map.empty, -1L, 0L, 0L, 0L, 0L, 0L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var pending = st0.pending
          rows.foreach { e =>
            val hr = e.tsUs / HourUs
            pending = pending.updated(hr, pending.getOrElse(hr, 0L) + 1L)
          }
          val (ready, hold) = pending.partition { case (hr, _) =>
            (hr + 1) * HourUs <= wmUs
          }
          var (hr0, n, sx, sy, sxy, sxx) =
            (st0.hr0, st0.n, st0.sx, st0.sy, st0.sxy, st0.sxx)
          val out = scala.collection.mutable.ListBuffer.empty[TrendPoint]
          ready.toSeq.sortBy(_._1).foreach { case (hr, y) =>
            if (hr0 < 0) hr0 = hr
            val x = hr - hr0
            n += 1; sx += x; sy += y; sxy += x * y; sxx += x * x
            val den = n * sxx - sx * sx
            if (den != 0) {
              // Scala integral / truncates toward zero — the SAME rule
              // as Spark's DIV in the batch q72 plan
              out += TrendPoint(tpe, hr, n,
                (n * sxy - sx * sy) * 1000 / den,
                ((sy * sxx - sx * sxy) + (n * sxy - sx * sy) * (x + 1)) / den)
            }
          }
          state.update(TrendState(hold, hr0, n, sx, sy, sxy, sxx))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              (hold.keys.min + 1) * HourUs / 1000L + 1))
          out.iterator
      }
  }

  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapUs: Long, watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val before = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          var sessions = before
          rows.toSeq.sortBy(_.tsUs).foreach { e =>
            val (near, far) = sessions.partition(s =>
              e.tsUs >= s.startUs - gapUs && e.tsUs <= s.endUs + gapUs)
            val merged = near.foldLeft(OpenSession(e.tsUs, e.tsUs, 1L, e.valueC)) {
              (acc, s) => OpenSession(math.min(acc.startUs, s.startUs),
                math.max(acc.endUs, s.endUs), acc.n + s.n, acc.valueC + s.valueC)
            }
            sessions = merged :: far
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // only UNTOUCHED sessions may close now; touched ones hold one
          // more watermark cycle to absorb late siblings (value equality
          // identifies untouched: any merge changes n)
          val (closed, open) = sessions.partition(s =>
            s.endUs + gapUs < wmUs && before.contains(s))
          if (open.nonEmpty) {
            state.update(SessionState(open))
            // wake when the earliest open session becomes closable;
            // must be strictly beyond the current watermark
            val nextMs = math.max(state.getCurrentWatermarkMs() + 1,
              (open.map(s => s.endUs + gapUs).min) / 1000L + 1)
            state.setTimeoutTimestamp(nextMs)
          } else {
            state.remove()
          }
          closed.sortBy(_.startUs).iterator
            .map(s => Session(userId, s.startUs, s.endUs, s.n, s.valueC))
      }
  }

  final case class HistEvent(tsUs: Long, valueC: Long)
  final case class HistFeed(day: Long, ownDay: Boolean, valueC: Long)
  final case class HistState(counts: Map[Long, Long], nSeen: Long,
                             hasOwn: Boolean)
  final case class QuantRow(day: Long, nValues: Long, p50C: Long,
                            p90C: Long, maxC: Long, nSeen: Long)

  /** Streaming twin of the batch rolling exact quantiles (q102): each
    * event feeds the trailing-7-day histograms of target days
    * `day..day+6` (the explode happens at INGEST, so the per-day state
    * is self-contained), per-target-day state is the mergeable
    * value→count map — a commutative, arrival-order-invariant fold
    * (the KMV-twin discipline: no watermark buffer needed), exactly
    * the histogram q102 merges in batch. Every trigger emits the
    * day's CURRENT exact p50/p90/max with the monotone nSeen marker
    * (tests take max-marker per day); a target day emits only once it
    * has an event of its OWN (q102's realDays join). State per day is
    * the distinct-value histogram — the same cardinality the batch
    * groupBy holds, bounded by the value domain, and droppable via
    * event-time timeout once the day+7 watermark passes (kept
    * NoTimeout here so late replays stay exact, the d10 reliable-mode
    * trade documented in COVERAGE.md).
    */
  def streamingRollingQuantile(spark: SparkSession,
                               events: Dataset[HistEvent]): Dataset[QuantRow] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000L
    events
      .flatMap { e =>
        val d = e.tsUs / DayUs
        (d to d + 6).map(t => HistFeed(t, t == d, e.valueC))
      }
      .groupByKey(_.day)
      .flatMapGroupsWithState[HistState, QuantRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (day: Long, rows: Iterator[HistFeed], state: GroupState[HistState]) =>
          var st = state.getOption.getOrElse(HistState(Map.empty, 0L, false))
          rows.foreach { f =>
            st = HistState(
              st.counts.updated(f.valueC, st.counts.getOrElse(f.valueC, 0L) + 1L),
              st.nSeen + 1L, st.hasOwn || f.ownDay)
          }
          state.update(st)
          if (!st.hasOwn) Iterator.empty
          else {
            val sorted = st.counts.toSeq.sortBy(_._1)
            val total = sorted.map(_._2).sum
            var cum = 0L
            var p50 = Long.MinValue
            var p90 = Long.MinValue
            sorted.foreach { case (v, c) =>
              cum += c
              if (p50 == Long.MinValue && cum * 2 >= total) p50 = v
              if (p90 == Long.MinValue && cum * 10 >= total * 9) p90 = v
            }
            Iterator.single(QuantRow(day, total, p50, p90,
              sorted.last._1, st.nSeen))
          }
      }
  }

  /** STREAMING near-dup ALERTS against a PERSISTED corpus index — the
    * online face of d25's cross-corpus path
    * ([[graft.operators.Dedup.indexedNearDupSurvivors]]): each arriving
    * document computes its shingle-hash set and MinHash signature
    * PER ROW (the exact batch constants —
    * [[graft.operators.Dedup.minhashSignatureLocal]] /
    * [[graft.operators.Dedup.shingleHashLocal]]), probes the index's
    * band-bucket parquet with a STATELESS stream-static equi-join on
    * the same (band, murmur-of-band-values) key the batch builder
    * wrote, exact-verifies each candidate IN THE ROW (array_intersect
    * over the two hash sets — the batch verify arithmetic verbatim),
    * and emits one alert per (incoming doc, corpus doc) near-dup at
    * the threshold. Admission = suppress alerted ids downstream;
    * in-stream (arrival-order) near-dups compose from
    * [[nearDupCandidates]].
    *
    * Scale shape: the only state is the watermark-bounded per-pair
    * dedup (multi-band collisions re-emit otherwise); the probe join
    * is stateless, document text never shuffles (only id + hash set +
    * band keys), and the static side is the persisted index a 100 TB
    * corpus maintains anyway. EventStreamSpec pins
    * stream alerts == the batch operator's cross-corpus dropped set on
    * a shared fixture.
    */
  def indexedNearDupAlerts(spark: SparkSession, docs: Dataset[DocEvent],
                           idxPath: String, shingleN: Int = 3,
                           bands: Int = 32, rows: Int = 2,
                           thresholdNum: Int = 2, thresholdDen: Int = 5,
                           watermarkDelay: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    import graft.operators.{Dedup, TextOps}
    val k = bands * rows
    val cB = spark.read.parquet(s"$idxPath/buckets")
    val cH = spark.read.parquet(s"$idxPath/hashes")
      .select(col("__id").as("corpus_id"), col("__hs").as("__chs"))
    val probes = docs.flatMap { d =>
      val sh = TextOps.shinglesLocal(d.text, shingleN)
      Dedup.minhashSignatureLocal(sh, k) match {
        case None => Iterator.empty // no shingles = no candidates (batch drops them too)
        case Some(sig) =>
          Iterator.single((d.docId, d.tsUs, sh.map(Dedup.shingleHashLocal).distinct.toArray, sig))
      }
    }.toDF("doc_id", "tsUs", "__hs", "__sig")
    // band keys via the SAME codegen'd murmur the index builder used
    // (Dedup.bandBuckets: hash over the band's signature values) — a
    // locally re-implemented murmur could drift, Column hash() cannot
    val bandStructs = (0 until bands).map { j =>
      val bandCols = (0 until rows).map(r => element_at(col("__sig"), j * rows + r + 1))
      struct(lit(j).as("band"), hash(bandCols: _*).as("bh"))
    }
    val keyed = probes
      .select(col("doc_id"), col("tsUs"), col("__hs"),
        explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("tsUs"), col("__hs"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    keyed.join(cB.select(col("band"), col("bh"), col("__id").as("corpus_id")),
        Seq("band", "bh"))
      .join(cH, Seq("corpus_id")) // second stream-static join: hash sets
      .withColumn("__inter",
        size(array_intersect(col("__hs"), col("__chs"))).cast("long"))
      .withColumn("__union",
        size(col("__hs")).cast("long") + size(col("__chs")) - col("__inter"))
      .filter(col("__inter") * thresholdDen >= col("__union") * thresholdNum)
      .select(col("doc_id"), col("corpus_id"), col("tsUs"),
        floor(lit(100.0) * col("__inter") / col("__union")).cast("long").as("jacc_pct"))
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
      .drop("ets")
  }
}
