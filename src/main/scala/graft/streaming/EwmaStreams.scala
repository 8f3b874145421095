package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation: key's value `v` at per-key-unique order `ord`. */
final case class EwmaPoint(key: String, ord: Long, v: Double)

/** Carried recurrence state: observations seen, running ewma, last order
  * consumed (for the monotone-ingest contract). */
final case class EwmaCarry(n: Long, ewma: Double, lastOrd: Long)

/** Per-key emit after each micro-batch that touched the key. */
final case class EwmaEmit(key: String, n_events: Long, ewma: Double)

/** Buffered-mode state: the folded recurrence plus the reorder buffer of
  * not-yet-foldable points (parallel ord/value seqs — case-class state
  * must stay encoder-friendly). */
final case class EwmaBufCarry(
    n: Long, ewma: Double, lastOrd: Long, maxOrd: Long,
    bufOrds: Seq[Long], bufVals: Seq[Double])

/** One observation in EVENT TIME: key's value `v` at event timestamp
  * `ts` (per-key-unique millis — the watermark variant's order domain). */
final case class EwmaTsPoint(key: String, ts: java.sql.Timestamp, v: Double)

/** Watermark-variant state: folded recurrence + reorder buffer keyed by
  * event-time millis (no maxOrd — Spark's watermark owns the frontier). */
final case class EwmaWmCarry(
    n: Long, ewma: Double, lastMs: Long,
    bufMs: Seq[Long], bufVals: Seq[Double])

/**
 * Streaming EWMA — the live tail of the batch [[graft.operators.Ewma]]
 * fold. The recurrence `ewma = alpha*x + (1-alpha)*ewma` (seeded with the
 * first observation) is genuinely sequential, so the streaming form is the
 * natural one: per-key state carries (count, ewma), each micro-batch folds
 * its arrivals in `ord` order, and the arithmetic is the IDENTICAL IEEE
 * expression the batch operator uses — so on closed batches the streamed
 * value is bit-identical to `Ewma.perKey` over the same data (the
 * streaming == batch discipline of [[DedupStreams]]/[[TickStreams]]).
 *
 * Contract: `ord` must be unique per key and MONOTONE across micro-batches
 * (live ingest). An out-of-order arrival would silently corrupt the
 * recurrence, so it fails the query loudly instead — replays and backfills
 * belong to the batch operator, which sorts the full history.
 *
 * State bound: ONE (long, double, long) per distinct key —
 * hash-partitioned by the state store, O(keys) not O(events). Cap with a
 * state TTL when keys churn (the DedupStreams note applies).
 */
object EwmaStreams {

  def runningEwma(
      spark: SparkSession,
      points: DataFrame,
      alpha: Double): Dataset[EwmaEmit] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    import spark.implicits._
    val a = alpha
    val oneMinus = 1.0 - alpha
    points.as[EwmaPoint]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[EwmaPoint], state: GroupState[EwmaCarry]) => {
          // fold THIS batch's arrivals in ord order (the state store hands
          // rows in arbitrary order; per-key batch volume bounds the sort)
          val rs = rows.toArray.sortBy(_.ord)
          if (rs.isEmpty) Iterator.empty
          else {
            var (n, e, last) = state.getOption
              .map(s => (s.n, s.ewma, s.lastOrd))
              .getOrElse((0L, 0.0, Long.MinValue))
            var i = 0
            while (i < rs.length) {
              val r = rs(i)
              if (r.ord <= last)
                throw new IllegalStateException(
                  s"EwmaStreams.runningEwma: out-of-order ord ${r.ord} for key '$key' " +
                    s"(last consumed $last) — the streaming recurrence requires monotone " +
                    "ingest; replays/backfills belong to the batch Ewma.perKey fold")
              e = if (n == 0L) r.v else a * r.v + oneMinus * e
              n += 1
              last = r.ord
              i += 1
            }
            state.update(EwmaCarry(n, e, last))
            Iterator.single(EwmaEmit(key, n, e))
          }
        })
  }

  /**
   * BOUNDED OUT-OF-ORDER tolerance — the opt-in ingest-hardened twin of
   * [[runningEwma]] (whose loud any-disorder contract stays the default).
   * Arrivals enter a per-key reorder buffer; only points strictly below
   * the key's FRONTIER — `max(ord seen) - delay`, the watermark idea applied
   * to the per-key order domain — are folded, in `ord` order, with the
   * IDENTICAL IEEE recurrence. Any ingest whose disorder stays within
   * `delay` therefore folds in exactly the same sequence as sorted ingest:
   * streamed values are bit-identical to the batch fold over the folded
   * prefix (parity spec under shuffled-within-delay ingest).
   *
   * The contract stays LOUD past the tolerance: a point arriving at or
   * below the last FOLDED ord (disorder worse than `delay`) throws — it
   * can no longer enter the recurrence in order, and silently dropping or
   * mis-folding it would diverge from batch.
   *
   * Emission: one [[EwmaEmit]] per key per micro-batch in which the fold
   * ADVANCED (a batch that only buffers emits nothing — the recurrence
   * value hasn't changed). The trailing `delay` of points stays buffered
   * until later arrivals push the frontier past them; feed a closing
   * sentinel (or fall back to the batch fold) at end-of-stream.
   *
   * State bound: one carry plus the points within `delay` of each key's
   * frontier — O(keys x delay-window), vs [[runningEwma]]'s O(keys).
   */
  def runningEwmaBuffered(
      spark: SparkSession,
      points: DataFrame,
      alpha: Double,
      delay: Long): Dataset[EwmaEmit] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(delay >= 0L, s"delay ($delay) must be non-negative")
    import spark.implicits._
    val a = alpha
    val oneMinus = 1.0 - alpha
    points.as[EwmaPoint]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[EwmaPoint], state: GroupState[EwmaBufCarry]) => {
          val arrivals = rows.toArray
          if (arrivals.isEmpty) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(
              EwmaBufCarry(0L, 0.0, Long.MinValue, Long.MinValue, Seq.empty, Seq.empty))
            // beyond-tolerance disorder is still a loud failure
            arrivals.foreach { r =>
              if (prior.n > 0L && r.ord <= prior.lastOrd)
                throw new IllegalStateException(
                  s"EwmaStreams.runningEwmaBuffered: ord ${r.ord} for key '$key' arrived " +
                    s"at/below the folded frontier (${prior.lastOrd}) — disorder exceeds " +
                    s"the $delay-ord tolerance; replays/backfills belong to the batch fold")
            }
            val buf = (prior.bufOrds.zip(prior.bufVals) ++
              arrivals.map(r => (r.ord, r.v))).sortBy(_._1)
            // ord is unique per key by contract; a duplicate inside the
            // buffer would fold twice SILENTLY — catch it while sorted
            var d = 1
            while (d < buf.length) {
              if (buf(d)._1 == buf(d - 1)._1)
                throw new IllegalStateException(
                  s"EwmaStreams.runningEwmaBuffered: duplicate ord ${buf(d)._1} for key " +
                    s"'$key' — ord must be unique per key (re-delivery is not reordering)")
              d += 1
            }
            val maxOrd = math.max(prior.maxOrd, arrivals.map(_.ord).max)
            val frontier = maxOrd - delay
            // fold STRICTLY below the frontier: a point at exactly
            // maxOrd - delay has disorder exactly `delay` — still within
            // the advertised tolerance — so folding it would make a
            // later arrival at that exact disorder a false beyond-
            // tolerance error (same rule as FunnelStreams/TransitionStreams)
            val (ready, hold) = buf.partition(_._1 < frontier)
            if (ready.isEmpty) {
              state.update(prior.copy(maxOrd = maxOrd,
                bufOrds = buf.map(_._1), bufVals = buf.map(_._2)))
              Iterator.empty
            } else {
              var n = prior.n
              var e = prior.ewma
              var last = prior.lastOrd
              ready.foreach { case (ord, v) =>
                e = if (n == 0L) v else a * v + oneMinus * e
                n += 1
                last = ord
              }
              state.update(EwmaBufCarry(n, e, last, maxOrd,
                hold.map(_._1), hold.map(_._2)))
              Iterator.single(EwmaEmit(key, n, e))
            }
          }
        })
  }

  /**
   * WATERMARK-NATIVE buffered fold — [[runningEwmaBuffered]] with Spark's
   * event-time watermark owning the frontier instead of the bespoke
   * per-key `max(ord) - delay`. Input rows carry a real event timestamp;
   * `withWatermark(ts, delay)` makes Spark track the global frontier and
   * the fold consumes buffered points with event-time STRICTLY below
   * `GroupState.getCurrentWatermarkMs` in exact ms order — the IDENTICAL
   * IEEE recurrence, so within-tolerance disorder folds bit-identical to
   * the batch operator (parity spec under the same shuffled-within-delay
   * ingest as the bespoke mode).
   *
   * Trade vs the bespoke mode, stated honestly: beyond-tolerance
   * arrivals are DROPPED BY SPARK before they reach the fold (that IS
   * the watermark mechanism — late-row handling becomes platform-owned
   * and globally consistent across operators) where
   * [[runningEwmaBuffered]] fails loudly; duplicate event-times within
   * the buffer remain a loud error here. The watermark also lags one
   * micro-batch (it advances AFTER a batch completes), so the trailing
   * window needs one more batch to flush than the bespoke mode — but NOT
   * a batch touching this key: whenever points are held, an event-time
   * timeout is armed at `max(held ms) + 1`, so any batch that advances
   * the GLOBAL watermark past the held tail flushes it through the
   * identical fold (an idle key's last points are never stranded in
   * state). State O(keys x delay window), per-key frontier state gone.
   */
  def runningEwmaWatermarked(
      spark: SparkSession,
      points: DataFrame,
      alpha: Double,
      delay: String): Dataset[EwmaEmit] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    import spark.implicits._
    val a = alpha
    val oneMinus = 1.0 - alpha
    points.withWatermark("ts", delay)
      .as[EwmaTsPoint]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[EwmaTsPoint], state: GroupState[EwmaWmCarry]) => {
          val arrivals = rows.toArray
          // a timeout invocation (no rows, armed below) flushes the held
          // tail through the identical fold once the GLOBAL watermark
          // passes it — no batch touching this key required
          if (arrivals.isEmpty && !state.hasTimedOut) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(
              EwmaWmCarry(0L, 0.0, Long.MinValue, Seq.empty, Seq.empty))
            val buf = (prior.bufMs.zip(prior.bufVals) ++
              arrivals.map(r => (r.ts.getTime, r.v))).sortBy(_._1)
            var d = 1
            while (d < buf.length) {
              if (buf(d)._1 == buf(d - 1)._1)
                throw new IllegalStateException(
                  s"EwmaStreams.runningEwmaWatermarked: duplicate event-time ${buf(d)._1} " +
                    s"for key '$key' — event-times must be unique per key " +
                    "(re-delivery is not reordering)")
              d += 1
            }
            val frontier = state.getCurrentWatermarkMs()
            val (ready, hold) = buf.partition(_._1 < frontier)
            // invocation cancels any armed timeout — re-arm while points
            // are held (all held ms >= frontier, so the stamp is legal)
            if (ready.isEmpty) {
              state.update(prior.copy(bufMs = buf.map(_._1), bufVals = buf.map(_._2)))
              if (buf.nonEmpty) state.setTimeoutTimestamp(buf.last._1 + 1)
              Iterator.empty
            } else {
              var n = prior.n
              var e = prior.ewma
              var last = prior.lastMs
              ready.foreach { case (ms, v) =>
                e = if (n == 0L) v else a * v + oneMinus * e
                n += 1
                last = ms
              }
              state.update(EwmaWmCarry(n, e, last,
                hold.map(_._1), hold.map(_._2)))
              if (hold.nonEmpty) state.setTimeoutTimestamp(hold.last._1 + 1)
              Iterator.single(EwmaEmit(key, n, e))
            }
          }
        })
  }
}
