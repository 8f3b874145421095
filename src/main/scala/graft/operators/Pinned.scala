package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * The library's "pin this small intermediate frame" primitive, with the
 * executor-loss trade-off made explicit (the r4/r5 verdicts' carry-over):
 *
 *  - DEFAULT (`recoverable = false`): `localCheckpoint(true)` — eager, one
 *    job, lineage TRUNCATED. Fast and leak-free, but the pinned blocks
 *    live in non-replicated executor storage: lose an executor holding
 *    them mid-job and every downstream action fails unrecoverably (the
 *    operator must be re-invoked). The right default for interactive /
 *    test / bench sessions, where re-running the operator is cheap.
 *
 *  - RECOVERABLE (`recoverable = true`): `persist(MEMORY_AND_DISK)` +
 *    eager materialization, lineage KEPT. An executor loss recomputes the
 *    lost blocks from lineage instead of failing the job — what a
 *    multi-hour 100 TB run wants. The cost: each call leaves a
 *    CacheManager entry the operator has no scope to unpersist (callers
 *    can `spark.catalog.clearCache()` between pipeline phases, or accept
 *    the entries for the life of the batch job — they are tiny frames:
 *    bounds sketches, per-round winners).
 *
 * Both modes materialize EAGERLY at the call, on purpose: every use-site
 * pins a frame that feeds two or more downstream branches, and a lazy pin
 * would let the first branch race the second into recomputing the pass
 * the pin exists to avoid.
 */
object Pinned {
  def pin(df: DataFrame, recoverable: Boolean): DataFrame =
    if (!recoverable) df.localCheckpoint(true)
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // materialize now: both downstream branches must reuse, not race
      p
    }
}
