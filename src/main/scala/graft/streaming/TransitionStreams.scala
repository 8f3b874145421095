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
}
