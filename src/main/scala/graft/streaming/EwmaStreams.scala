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
}
