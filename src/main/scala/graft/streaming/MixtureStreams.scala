package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row's race entry arriving on the stream. */
final case class ResClaim(g: String, k: Long, wkey: Double)

/** The current reservoir of one stratum after a micro-batch: ids and race
  * keys in rank order, plus the emit version (highest = freshest). */
final case class ResState(g: String, version: Long, ids: Seq[Long], wkeys: Seq[Double])

/**
 * STREAMING weighted reservoir sampling — the live twin of
 * [[graft.operators.Mixture.weightedSamplePerGroup]]: per stratum, keep
 * the k rows whose A-Res race keys (`round(-ln(u)/w, 9)`, u from the
 * salted content hash) are smallest among everything EVER ingested.
 *
 * The property that distinguishes this from the dedup screens: race keys
 * are CONTENT-derived, not arrival-derived, so the reservoir after the
 * last micro-batch equals the batch sample under ANY ingest order or
 * batching — no monotone-ingest contract needed. min-k of a set is a
 * commutative, idempotent fold; the stream is just that fold with
 * checkpointable state.
 *
 * Emission model: Update-mode — one [[ResState]] row per stratum per
 * micro-batch that TOUCHED it, carrying the whole (≤ k)-row reservoir
 * and a monotone `version`; downstream keeps the highest version per
 * stratum (exactly what a keyed Update sink does). State bound:
 * O(groups x k) longs+doubles, hash-partitioned by the state store.
 */
object MixtureStreams {

  def weightedReservoirPerGroup(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String): Dataset[ResState] = {
    import spark.implicits._
    require(k >= 1, s"k ($k) must be positive")
    val wkey = graft.operators.Mixture.raceKeyExpr(
      keyCol, weightCol, salt, "MixtureStreams.weightedReservoirPerGroup")
    val guardedGroup =
      s"""case when $groupCol is null then cast(raise_error(
            'MixtureStreams.weightedReservoirPerGroup: $groupCol is null — a null stratum has no defined quota') as string)
          else cast($groupCol as string) end"""
    df.selectExpr(s"$guardedGroup as g", s"cast($keyCol as bigint) as k",
        s"$wkey as wkey")
      .as[ResClaim]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, rows: Iterator[ResClaim], state: GroupState[ResState]) => {
          val prior = state.getOption
          // .distinct BEFORE take(k): race keys are content-derived, so a
          // re-delivered row (at-least-once source, or the same id in two
          // batches) reproduces the SAME (wkey, id) tuple — dedup makes the
          // fold genuinely idempotent. Without it a replayed reservoir
          // member would occupy two of the k slots and evict a distinct row.
          val merged = (prior.map(p => p.ids.zip(p.wkeys).map { case (id, w) => (w, id) })
            .getOrElse(Seq.empty) ++ rows.map(r => (r.wkey, r.k)))
            .distinct
            .sortBy(identity) // (wkey ASC, id ASC) — the batch race's order
            .take(k)
          val next = ResState(g, prior.map(_.version + 1).getOrElse(1L),
            merged.map(_._2), merged.map(_._1))
          state.update(next)
          Iterator.single(next)
        })
  }
}
