package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel observation: `user_id` performed `event_type` at time `ms`
  * (epoch millis); `event_id` breaks same-millisecond ties, matching the
  * batch fold's `(ms, event_id)` sort key. */
final case class FunnelEvent(
    user_id: Long, ms: Long, event_id: Long, event_type: String)

/** Carried automaton state: events seen, furthest stage reached, and the
  * last `(ms, event_id)` consumed (for the monotone-ingest contract). */
final case class FunnelCarry(n: Long, stage: Int, lastMs: Long, lastId: Long)

/** Per-user emit after each micro-batch that touched the user. */
final case class FunnelEmit(user_id: Long, n_events: Long, funnel_stage: Int)

/** Buffered-mode state: the automaton carry plus the reorder buffer of
  * not-yet-foldable events (parallel seqs — encoder-friendly). */
final case class FunnelBufCarry(
    n: Long, stage: Int, lastMs: Long, lastId: Long, maxMs: Long,
    bufMs: Seq[Long], bufIds: Seq[Long], bufTypes: Seq[String])

/** One funnel observation in EVENT TIME (the watermark variant's input):
  * `ts` is the order domain, `event_id` breaks same-millisecond ties. */
final case class FunnelTsEvent(
    user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

/** Watermark-variant state: automaton carry + reorder buffer keyed by
  * event-time millis. No maxMs (Spark's watermark owns the frontier) and
  * no folded-frontier key (Spark drops late rows before the fold, so an
  * arrival below the folded frontier is impossible — carrying one would
  * imply a check that cannot fire). */
final case class FunnelWmCarry(
    n: Long, stage: Int,
    bufMs: Seq[Long], bufIds: Seq[Long], bufTypes: Seq[String])

/**
 * Streaming funnel — the live tail of the batch q86 fold
 * (`CoreQueries` "q86_funnel"). The funnel automaton (stage s advances to
 * s+1 exactly when the next event in time order equals `steps(s)`) is a
 * sequential fold over each user's ordered history, so the streaming form
 * mirrors [[EwmaStreams]]: per-user state carries (count, stage), each
 * micro-batch folds its arrivals in `(ms, event_id)` order, and the step
 * rule is the IDENTICAL automaton the batch query folds — on closed
 * batches the streamed `funnel_stage` equals q86's exactly (integer state,
 * no float drift to worry about).
 *
 * Contract: `(ms, event_id)` must be strictly increasing per user ACROSS
 * micro-batches (live ingest). An out-of-order arrival would silently
 * corrupt the automaton (a 'click' that "happened before" an already-seen
 * 'view' changes the fold), so it fails the query loudly instead —
 * replays and backfills belong to the batch query, which sorts the full
 * history.
 *
 * State bound: ONE (long, int, long, long) per distinct user —
 * hash-partitioned by the state store, O(users) not O(events). Cap with a
 * state TTL when users churn (the [[DedupStreams]] note applies).
 */
object FunnelStreams {

  /** Default steps of the batch q86 funnel: click -> view -> purchase. */
  val DefaultSteps: Seq[String] = Seq("click", "view", "purchase")

  def funnelStages(
      spark: SparkSession,
      events: DataFrame,
      steps: Seq[String] = DefaultSteps): Dataset[FunnelEmit] = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.forall(s => s != null && s.nonEmpty),
      s"steps must be non-null and non-empty, got $steps")
    import spark.implicits._
    val stepArr = steps.toArray
    events.as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelCarry]) => {
          // fold THIS batch's arrivals in (ms, event_id) order (the state
          // store hands rows in arbitrary order; per-user batch volume
          // bounds the sort)
          val rs = rows.toArray.sortBy(r => (r.ms, r.event_id))
          if (rs.isEmpty) Iterator.empty
          else {
            var (n, stage, lastMs, lastId) = state.getOption
              .map(s => (s.n, s.stage, s.lastMs, s.lastId))
              .getOrElse((0L, 0, Long.MinValue, Long.MinValue))
            var i = 0
            while (i < rs.length) {
              val r = rs(i)
              if (r.ms < lastMs || (r.ms == lastMs && r.event_id <= lastId))
                throw new IllegalStateException(
                  s"FunnelStreams.funnelStages: out-of-order event (ms=${r.ms}, " +
                    s"event_id=${r.event_id}) for user $user (last consumed " +
                    s"ms=$lastMs, event_id=$lastId) — the streaming automaton " +
                    "requires monotone ingest; replays/backfills belong to the " +
                    "batch q86 fold, which sorts the full history")
              if (stage < stepArr.length && r.event_type == stepArr(stage))
                stage += 1
              n += 1
              lastMs = r.ms
              lastId = r.event_id
              i += 1
            }
            state.update(FunnelCarry(n, stage, lastMs, lastId))
            Iterator.single(FunnelEmit(user, n, stage))
          }
        })
  }

  /**
   * BOUNDED OUT-OF-ORDER tolerance — the [[EwmaStreams.runningEwmaBuffered]]
   * / [[TransitionStreams.transitionsBuffered]] discipline for the funnel
   * automaton: arrivals buffer per user, only events strictly below the
   * frontier (`max ms seen - delayMs`) fold, in exact `(ms, event_id)`
   * order, through the IDENTICAL step rule — within-tolerance disorder
   * reaches the same stage as sorted ingest. Loud past the tolerance and
   * on duplicate `(ms, event_id)` keys; emits only when the fold
   * advanced; the trailing `delayMs` stays buffered until later arrivals
   * move the frontier. State O(users x delay window).
   */
  def funnelStagesBuffered(
      spark: SparkSession,
      events: DataFrame,
      delayMs: Long,
      steps: Seq[String] = DefaultSteps): Dataset[FunnelEmit] = {
    require(delayMs >= 0L, s"delayMs ($delayMs) must be non-negative")
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.forall(s => s != null && s.nonEmpty),
      s"steps must be non-null and non-empty, got $steps")
    import spark.implicits._
    val stepArr = steps.toArray
    events.as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBufCarry]) => {
          val arrivals = rows.toArray
          if (arrivals.isEmpty) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(FunnelBufCarry(
              0L, 0, Long.MinValue, Long.MinValue, Long.MinValue,
              Seq.empty, Seq.empty, Seq.empty))
            arrivals.foreach { r =>
              if (prior.n > 0L &&
                (r.ms < prior.lastMs ||
                  (r.ms == prior.lastMs && r.event_id <= prior.lastId)))
                throw new IllegalStateException(
                  s"FunnelStreams.funnelStagesBuffered: event (ms=${r.ms}, " +
                    s"event_id=${r.event_id}) for user $user arrived at/below the " +
                    s"folded frontier (ms=${prior.lastMs}, event_id=${prior.lastId}) " +
                    s"— disorder exceeds the ${delayMs}ms tolerance")
            }
            val buf = ReorderBuffer.mergeSorted(
              prior.bufMs, prior.bufIds, prior.bufTypes,
              arrivals.map(r => (r.ms, r.event_id, r.event_type)).toSeq,
              "FunnelStreams.funnelStagesBuffered", user)
            val maxMs = math.max(prior.maxMs, arrivals.map(_.ms).max)
            val frontier = maxMs - delayMs
            // fold STRICTLY below the frontier: an event at exactly
            // maxMs - delayMs has disorder exactly delayMs — still within
            // the advertised tolerance — so a later same-ms event with a
            // smaller event_id must still be able to sort before it
            val (ready, hold) = buf.partition(_._1 < frontier)
            if (ready.isEmpty) {
              state.update(prior.copy(maxMs = maxMs,
                bufMs = buf.map(_._1), bufIds = buf.map(_._2), bufTypes = buf.map(_._3)))
              Iterator.empty
            } else {
              var n = prior.n
              var stage = prior.stage
              var lastMs = prior.lastMs
              var lastId = prior.lastId
              ready.foreach { case (ms, id, typ) =>
                if (stage < stepArr.length && typ == stepArr(stage)) stage += 1
                n += 1; lastMs = ms; lastId = id
              }
              state.update(FunnelBufCarry(n, stage, lastMs, lastId, maxMs,
                hold.map(_._1), hold.map(_._2), hold.map(_._3)))
              Iterator.single(FunnelEmit(user, n, stage))
            }
          }
        })
  }

  /**
   * WATERMARK-NATIVE buffered fold — [[funnelStagesBuffered]] with
   * Spark's event-time watermark owning the frontier instead of the
   * bespoke per-user `max(ms) - delayMs` (the
   * [[EwmaStreams.runningEwmaWatermarked]] discipline applied to the
   * funnel automaton). Input rows carry a real event timestamp;
   * `withWatermark(ts, delay)` makes Spark track the global frontier and
   * the fold consumes buffered events with event-time STRICTLY below
   * `GroupState.getCurrentWatermarkMs` in exact `(ms, event_id)` order
   * through the IDENTICAL step rule — within-tolerance disorder reaches
   * the same stage as sorted ingest (parity spec under the same
   * shuffled-within-delay ingest as the bespoke mode).
   *
   * Trade vs the bespoke mode, stated honestly: beyond-tolerance
   * arrivals are DROPPED BY SPARK before they reach the fold (that IS
   * the watermark mechanism — late-row handling becomes platform-owned
   * and globally consistent across operators) where
   * [[funnelStagesBuffered]] fails loudly; duplicate `(ms, event_id)`
   * keys within the buffer remain a loud error here. The watermark also
   * lags one micro-batch (it advances AFTER a batch completes), so the
   * trailing window needs one more batch to flush than the bespoke mode
   * — but NOT a batch touching this user: whenever events are held, an
   * event-time timeout is armed at `max(held ms) + 1`, so any batch that
   * advances the GLOBAL watermark past the held tail flushes it through
   * the identical fold (an idle user's last events are never stranded in
   * state). State O(users x delay window), per-user frontier state gone.
   */
  def funnelStagesWatermarked(
      spark: SparkSession,
      events: DataFrame,
      delay: String,
      steps: Seq[String] = DefaultSteps): Dataset[FunnelEmit] = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.forall(s => s != null && s.nonEmpty),
      s"steps must be non-null and non-empty, got $steps")
    import spark.implicits._
    val stepArr = steps.toArray
    events.withWatermark("ts", delay)
      .as[FunnelTsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[FunnelTsEvent], state: GroupState[FunnelWmCarry]) => {
          val arrivals = rows.toArray
          // a timeout invocation (no rows, armed below) flushes the held
          // tail through the identical fold once the GLOBAL watermark
          // passes it — no batch touching this user required
          if (arrivals.isEmpty && !state.hasTimedOut) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(FunnelWmCarry(
              0L, 0, Seq.empty, Seq.empty, Seq.empty))
            val buf = ReorderBuffer.mergeSorted(
              prior.bufMs, prior.bufIds, prior.bufTypes,
              arrivals.map(r => (r.ts.getTime, r.event_id, r.event_type)).toSeq,
              "FunnelStreams.funnelStagesWatermarked", user)
            val frontier = state.getCurrentWatermarkMs()
            val (ready, hold) = buf.partition(_._1 < frontier)
            // invocation cancels any armed timeout — re-arm while events
            // are held (all held ms >= frontier, so the stamp is legal)
            if (ready.isEmpty) {
              state.update(prior.copy(
                bufMs = buf.map(_._1), bufIds = buf.map(_._2), bufTypes = buf.map(_._3)))
              if (buf.nonEmpty) state.setTimeoutTimestamp(buf.last._1 + 1)
              Iterator.empty
            } else {
              var n = prior.n
              var stage = prior.stage
              ready.foreach { case (_, _, typ) =>
                if (stage < stepArr.length && typ == stepArr(stage)) stage += 1
                n += 1
              }
              state.update(FunnelWmCarry(n, stage,
                hold.map(_._1), hold.map(_._2), hold.map(_._3)))
              if (hold.nonEmpty) state.setTimeoutTimestamp(hold.last._1 + 1)
              Iterator.single(FunnelEmit(user, n, stage))
            }
          }
        })
  }
}
