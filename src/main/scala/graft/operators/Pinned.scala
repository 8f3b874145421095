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
 *    multi-hour 100 TB run wants. The cost: each bare `pin` call leaves a
 *    CacheManager entry; a multi-PHASE pipeline should scope each phase
 *    with [[withPinned]], which unpersists every frame pinned inside the
 *    scope on exit (success or failure) — deterministic release instead
 *    of `spark.catalog.clearCache()` hammers or entries living for the
 *    whole batch job.
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

  /**
   * Scoped recoverable pinning: `body` receives a pin function; every
   * frame pinned through it is unpersisted (blocking) when the body
   * exits, on success AND on failure. Because pins are eager and results
   * should be materialized before the phase ends anyway (that is what a
   * phase boundary means), releasing at exit is safe; a caller that
   * returns a LAZY frame still reading a pinned input must materialize
   * it inside the scope.
   *
   * {{{
   *   val phase1 = Pinned.withPinned() { pin =>
   *     val verdicts = pin(buildVerdicts(...))   // read by 3 branches
   *     (branchA(verdicts).collect(), branchB(verdicts).count())
   *   } // verdicts' cache entry is gone here
   * }}}
   */
  def withPinned[A](recoverable: Boolean = true)(body: (DataFrame => DataFrame) => A): A = {
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val pinFn: DataFrame => DataFrame = { df =>
      val p = pin(df, recoverable)
      // localCheckpoint frames hold RDD blocks, not CacheManager entries;
      // only persisted (recoverable) frames need scope-exit release
      if (recoverable) pinned.synchronized { pinned += p }
      p
    }
    try body(pinFn)
    finally pinned.foreach { p =>
      try p.unpersist(blocking = true) catch { case _: Exception => () }
    }
  }
}
