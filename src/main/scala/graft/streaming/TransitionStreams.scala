package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream observation for the transition fold (same shape as
  * [[FunnelEvent]]; kept separate so the two automatons evolve freely). */
final case class TransEvent(
    user_id: Long, ms: Long, event_id: Long, event_type: String)

/** Carried state: the user's last event type and the last `(ms, event_id)`
  * consumed (monotone-ingest contract). */
final case class TransCarry(lastType: String, lastMs: Long, lastId: Long)

/** One emitted transition occurrence: `user_id` moved `from_type` ->
  * `to_type`. Downstream aggregation (`groupBy(from, to).count`) yields
  * the live transition matrix. */
final case class TransEmit(user_id: Long, from_type: String, to_type: String)

/** Buffered-mode state: the fold carry plus the reorder buffer of
  * not-yet-foldable events (parallel seqs — encoder-friendly). */
final case class TransBufCarry(
    lastType: String, lastMs: Long, lastId: Long, maxMs: Long,
    bufMs: Seq[Long], bufIds: Seq[Long], bufTypes: Seq[String])

/** One transition observation in EVENT TIME (the watermark variant's
  * input): `ts` is the order domain, `event_id` breaks same-ms ties. */
final case class TransTsEvent(
    user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

/** Watermark-variant state: fold carry + reorder buffer keyed by
  * event-time millis. No maxMs (Spark's watermark owns the frontier) and
  * no folded-frontier key (Spark drops late rows before the fold, so an
  * arrival below the folded frontier is impossible). */
final case class TransWmCarry(
    lastType: String,
    bufMs: Seq[Long], bufIds: Seq[Long], bufTypes: Seq[String])

/**
 * Streaming event-transition extraction — the live tail of the batch q189
 * Markov matrix (`CoreQueries` "q189_event_transitions"): q189's
 * `lag(event_type)` over each user's time order is a sequential fold, so
 * the streaming form carries one `lastType` per user and emits each
 * (from, to) bigram as it happens; aggregating the emits reproduces the
 * batch counts exactly on closed batches (integer occurrences, nothing to
 * drift). The emitted stream is itself useful upstream of the aggregate —
 * it is the per-occurrence journey log.
 *
 * Contract: `(ms, event_id)` strictly increasing per user ACROSS
 * micro-batches, enforced loudly (an out-of-order arrival would fabricate
 * transitions that never happened in time order); replays/backfills
 * belong to the batch query.
 *
 * State bound: ONE (string, long, long) per distinct user — O(users),
 * hash-partitioned by the state store.
 */
object TransitionStreams {

  def transitions(
      spark: SparkSession,
      events: DataFrame): Dataset[TransEmit] = {
    import spark.implicits._
    events.as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[TransEvent], state: GroupState[TransCarry]) => {
          val rs = rows.toArray.sortBy(r => (r.ms, r.event_id))
          if (rs.isEmpty) Iterator.empty
          else {
            var (lastType, lastMs, lastId) = state.getOption
              .map(s => (s.lastType, s.lastMs, s.lastId))
              .getOrElse((null: String, Long.MinValue, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[TransEmit]
            var i = 0
            while (i < rs.length) {
              val r = rs(i)
              if (r.ms < lastMs || (r.ms == lastMs && r.event_id <= lastId))
                throw new IllegalStateException(
                  s"TransitionStreams.transitions: out-of-order event (ms=${r.ms}, " +
                    s"event_id=${r.event_id}) for user $user (last consumed " +
                    s"ms=$lastMs, event_id=$lastId) — the streaming fold requires " +
                    "monotone ingest; replays/backfills belong to the batch q189 " +
                    "window, which sorts the full history")
              if (lastType != null) out += TransEmit(user, lastType, r.event_type)
              lastType = r.event_type
              lastMs = r.ms
              lastId = r.event_id
              i += 1
            }
            state.update(TransCarry(lastType, lastMs, lastId))
            out.iterator
          }
        })
  }

  /**
   * BOUNDED OUT-OF-ORDER tolerance — the [[EwmaStreams.runningEwmaBuffered]]
   * discipline applied to the transition automaton: arrivals enter a
   * per-user reorder buffer; only events strictly below the user's frontier
   * (`max ms seen - delayMs`) fold, in exact `(ms, event_id)` order, with
   * the identical bigram emission — within-tolerance disorder produces the
   * SAME transition stream as sorted ingest. Loud past the tolerance (an
   * arrival at-or-before the last FOLDED event can no longer enter the
   * sequence in order) and on duplicate `(ms, event_id)` keys. The
   * trailing `delayMs` of events stays buffered until later arrivals push
   * the frontier; emission happens only in batches where the fold
   * advanced. State O(users x delay window).
   */
  def transitionsBuffered(
      spark: SparkSession,
      events: DataFrame,
      delayMs: Long): Dataset[TransEmit] = {
    require(delayMs >= 0L, s"delayMs ($delayMs) must be non-negative")
    import spark.implicits._
    events.as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[TransEvent], state: GroupState[TransBufCarry]) => {
          val arrivals = rows.toArray
          if (arrivals.isEmpty) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(TransBufCarry(
              null, Long.MinValue, Long.MinValue, Long.MinValue,
              Seq.empty, Seq.empty, Seq.empty))
            arrivals.foreach { r =>
              if (prior.lastType != null &&
                (r.ms < prior.lastMs ||
                  (r.ms == prior.lastMs && r.event_id <= prior.lastId)))
                throw new IllegalStateException(
                  s"TransitionStreams.transitionsBuffered: event (ms=${r.ms}, " +
                    s"event_id=${r.event_id}) for user $user arrived at/below the " +
                    s"folded frontier (ms=${prior.lastMs}, event_id=${prior.lastId}) " +
                    s"— disorder exceeds the ${delayMs}ms tolerance")
            }
            val buf = ReorderBuffer.mergeSorted(
              prior.bufMs, prior.bufIds, prior.bufTypes,
              arrivals.map(r => (r.ms, r.event_id, r.event_type)).toSeq,
              "TransitionStreams.transitionsBuffered", user)
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
              var lastType = prior.lastType
              var lastMs = prior.lastMs
              var lastId = prior.lastId
              val out = scala.collection.mutable.ArrayBuffer.empty[TransEmit]
              ready.foreach { case (ms, id, typ) =>
                if (lastType != null) out += TransEmit(user, lastType, typ)
                lastType = typ; lastMs = ms; lastId = id
              }
              state.update(TransBufCarry(lastType, lastMs, lastId, maxMs,
                hold.map(_._1), hold.map(_._2), hold.map(_._3)))
              out.iterator
            }
          }
        })
  }

  /**
   * WATERMARK-NATIVE buffered fold — [[transitionsBuffered]] with
   * Spark's event-time watermark owning the frontier instead of the
   * bespoke per-user `max(ms) - delayMs` (the
   * [[EwmaStreams.runningEwmaWatermarked]] discipline applied to the
   * transition fold). `withWatermark(ts, delay)` makes Spark track the
   * global frontier; buffered events with event-time STRICTLY below
   * `GroupState.getCurrentWatermarkMs` fold in exact `(ms, event_id)`
   * order with the identical bigram emission — within-tolerance disorder
   * produces the SAME transition stream as sorted ingest (parity spec
   * under the same shuffled-within-delay ingest as the bespoke mode).
   *
   * Trade vs the bespoke mode, stated honestly: beyond-tolerance
   * arrivals are DROPPED BY SPARK before the fold sees them (that IS the
   * watermark mechanism — late-row handling becomes platform-owned and
   * globally consistent across operators) where [[transitionsBuffered]]
   * fails loudly; duplicate `(ms, event_id)` keys within the buffer
   * remain a loud error here. The watermark lags one micro-batch, so the
   * trailing window needs one more batch to flush than the bespoke mode
   * — but NOT a batch touching this user: whenever events are held, an
   * event-time timeout is armed at `max(held ms) + 1`, so any batch that
   * advances the GLOBAL watermark past the held tail flushes it through
   * the identical fold (an idle user's last events are never stranded in
   * state). State O(users x delay window), per-user frontier state gone.
   */
  def transitionsWatermarked(
      spark: SparkSession,
      events: DataFrame,
      delay: String): Dataset[TransEmit] = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .as[TransTsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[TransTsEvent], state: GroupState[TransWmCarry]) => {
          val arrivals = rows.toArray
          // a timeout invocation (no rows, armed below) flushes the held
          // tail through the identical fold once the GLOBAL watermark
          // passes it — no batch touching this user required
          if (arrivals.isEmpty && !state.hasTimedOut) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(TransWmCarry(
              null, Seq.empty, Seq.empty, Seq.empty))
            val buf = ReorderBuffer.mergeSorted(
              prior.bufMs, prior.bufIds, prior.bufTypes,
              arrivals.map(r => (r.ts.getTime, r.event_id, r.event_type)).toSeq,
              "TransitionStreams.transitionsWatermarked", user)
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
              var lastType = prior.lastType
              val out = scala.collection.mutable.ArrayBuffer.empty[TransEmit]
              ready.foreach { case (_, _, typ) =>
                if (lastType != null) out += TransEmit(user, lastType, typ)
                lastType = typ
              }
              state.update(TransWmCarry(lastType,
                hold.map(_._1), hold.map(_._2), hold.map(_._3)))
              if (hold.nonEmpty) state.setTimeoutTimestamp(hold.last._1 + 1)
              out.iterator
            }
          }
        })
  }
}
