package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Two-phase global ranking for LOW-CARDINALITY partition keys — the
 * scale-safe alternative to `Window.partitionBy(segment)` when `segment`
 * has only a handful of values: WindowExec gives one task per key, so each
 * segment's entire row set would sort in a single task (the q43 hazard
 * SCALE.md names). Here no task ever sorts more than ~rows/nBuckets rows:
 *
 *  1. A per-segment `approx_percentile` sketch (one map-side-combinable
 *     aggregate, fixed-size buffer) yields `nBuckets - 1` value boundaries.
 *  2. Every row maps to a bucket by counting boundaries below its value —
 *     broadcast of a (segments x nBuckets)-row frame, map-only, and
 *     monotone w.r.t. the (value, tie) total order since equal values land
 *     in equal buckets.
 *  3. Rows rank LOCALLY within (segment, bucket) — bounded window sorts,
 *     key cardinality segments x nBuckets, so skew is AQE-splittable.
 *  4. Tiny (segments x nBuckets)-row cumulative counts give each bucket's
 *     global offset; `rank = offset + local_rank` reconstructs the exact
 *     global rank, broadcast-joined back.
 *
 * Requires a non-null numeric `valCol` and a unique `tieCol` per segment
 * (ties at the same value break by it, so ranks are total and
 * deterministic). Sketch accuracy only affects bucket BALANCE, never
 * correctness.
 *
 * EXECUTION SEMANTICS (deliberate trade, documented): construction runs
 * the bounds-sketch pass EAGERLY — calling this method executes one Spark
 * job as a side effect, because the tiny bounds frame feeds two downstream
 * broadcast builds that would otherwise each re-scan the input. HOW it is
 * pinned is the `recoverable` knob ([[Pinned]]): the default
 * `localCheckpoint(true)` truncates lineage (executor loss mid-job fails
 * downstream actions unrecoverably — re-invoke the operator; right for
 * interactive/test/bench sessions), while `recoverable = true` persists
 * with lineage kept so a multi-hour 100 TB job survives executor loss at
 * the price of a CacheManager entry per call (see [[Pinned]] for the
 * clearCache guidance).
 */
object GlobalRank {

  /**
   * Appends `rn` (1-based global rank within `segCol` by (`valCol`,
   * `tieCol`)) and `n_seg` (segment row count) to `df`. Distribution
   * functions derive arithmetically: percent_rank = (rn-1)/(n_seg-1),
   * cume_dist = rn/n_seg (ties impossible under a unique tie-break),
   * ntile(k) via the shared larger-first-groups rule.
   */
  /** The (segCol, bnds) boundary sketch [[withGlobalRank]] pins by default.
    * Exposed for two caller patterns (both r12): batching several passes'
    * sketches into one aggregate (q196), and passing it UNPINNED so the
    * sketch rides inside the main job's broadcast builds (deduplicated by
    * broadcast-exchange reuse) instead of re-executing a heavy input in a
    * separate eager job (q99/q118 measured ~30-40% faster; cheap-input
    * sites like q98/q43 measured WORSE lazy and keep the eager pin). */
  def boundsOf(df: DataFrame, segCol: String, valCol: String,
      nBuckets: Int = 32): DataFrame = {
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets).mkString(", ")
    df.groupBy(segCol).agg(
      expr(s"approx_percentile($valCol, array($qs), 1000)").as("bnds"))
  }

  def withGlobalRank(
      df: DataFrame,
      segCol: String,
      valCol: String,
      tieCol: String,
      nBuckets: Int = 32,
      recoverable: Boolean = false,
      precomputedBounds: Option[DataFrame] = None): DataFrame = {
    require(nBuckets >= 2, s"nBuckets ($nBuckets) must be at least 2")
    // fail fast instead of silently overwriting (withColumn) and then
    // deleting (drop) a caller column that shares an internal name
    val reserved = Set("bnds", "bucket", "cnt", "local_rn", "offset", "rn", "n_seg", "__gr_seg", "__gr_bucket")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // pinned (tiny segments-row frame): the bounds sketch feeds BOTH the
    // offsets branch and the main ranking branch, and each broadcast
    // build would otherwise re-run the full percentile pass over the
    // input — pinning holds it to exactly one corpus scan (mode per the
    // object doc: checkpoint by default, lineage-kept persist when
    // recoverable)
    // r12: a caller chaining SEVERAL rank passes over the same frame can
    // sketch every pass's boundaries in ONE aggregate and pass each slice
    // in as `precomputedBounds` ((segCol, bnds) with nBuckets-1 ascending
    // boundaries, pinned by the caller) — otherwise each pass's eager
    // sketch job re-executes the whole upstream chain (q196's three
    // chained quintile cuts re-ran it 1+2+3 times; measured 5.5 -> 2.6 s).
    // Sketch values only steer bucket BALANCE, so any monotone boundary
    // set yields the identical exact ranks.
    val bounds = precomputedBounds.getOrElse(Pinned.pin(
      boundsOf(df, segCol, valCol, nBuckets), recoverable))
    // The null check lives INSIDE the bucket expression so pruning can
    // never remove it: a null value would otherwise land in bucket 0 /
    // null and then be silently DROPPED by the (segCol, bucket) equi-joins
    // below (null never equi-matches) — rank-less row loss where the
    // Window.partitionBy spelling would have ranked it. Fail loudly
    // instead, like the reserved-name clashes do.
    // boundaries-below count as an UNROLLED comparison chain, not an
    // aggregate() lambda: higher-order functions evaluate interpreted
    // (no doGenCode), and at nBuckets-1 lambda calls per row this mapping
    // sits on every input row — the unrolled spelling stays inside
    // whole-stage codegen (measured ~2x on the mapping pass over the
    // 600k-row q98 input at 9 boundaries; the gap grows with nBuckets)
    val below = (1 until nBuckets)
      .map(i => s"(case when $valCol > element_at(bnds, $i) then 1 else 0 end)")
      .mkString(" + ")
    val bucketed = df
      .join(broadcast(bounds), Seq(segCol))
      .withColumn("bucket",
        expr(s"""case when $valCol is null
                 then cast(raise_error('GlobalRank.withGlobalRank: $valCol is null — the documented contract requires a non-null numeric value column') as int)
                 else $below end"""))
      .drop("bnds")
    val counts = bucketed.groupBy(segCol, "bucket").agg(count(lit(1)).as("cnt"))
    // tiny frame (segments x nBuckets rows): the windows here are over the
    // AGGREGATE, not the data
    val wOff = Window.partitionBy(segCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("offset", coalesce(sum("cnt").over(wOff), lit(0L)))
      .withColumn("n_seg", sum("cnt").over(Window.partitionBy(segCol)))
      .select(segCol, "bucket", "offset", "n_seg")
    val wLocal = Window.partitionBy(segCol, "bucket").orderBy(col(valCol), col(tieCol))
    // NULL-SAFE join keys, deliberately: a plain inner join would infer
    // isnotnull(bucket) and push it down — and because `bucket` is a
    // projected expression, the filter materializes INSIDE the bounds-
    // attach join's condition, where (for a constant-folded segment key
    // the join degenerates to BroadcastNestedLoopJoin) it evaluates the
    // whole nBuckets-term chain INTERPRETED per row, twice. <=> keys
    // generate no isnotnull inference, so the chain stays a single
    // codegen'd projection (measured ~5x on q98's constant-segment input).
    val off = offsets
      .withColumnRenamed(segCol, "__gr_seg")
      .withColumnRenamed("bucket", "__gr_bucket")
    bucketed
      .withColumn("local_rn", row_number().over(wLocal))
      .join(broadcast(off),
        col(segCol) <=> col("__gr_seg") && col("bucket") <=> col("__gr_bucket"))
      .withColumn("rn", col("offset") + col("local_rn"))
      .drop("bucket", "local_rn", "offset", "__gr_seg", "__gr_bucket")
  }

  /** The ntile(k) bucket for global rank `rn` of `n` rows — the
    * larger-first-groups rule both Spark and DuckDB implement: the first
    * `n % k` tiles get `n div k + 1` rows, the rest `n div k`. Pure integer
    * arithmetic (cross-engine exact). */
  def ntileExpr(rn: String, n: String, k: Int): String =
    s"""case when $rn <= ($n % $k) * ($n div $k + 1)
            then ($rn - 1) div ($n div $k + 1) + 1
            else ($n % $k) + ($rn - 1 - ($n % $k) * ($n div $k + 1)) div ($n div $k) + 1
        end"""
}
