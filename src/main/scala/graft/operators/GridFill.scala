package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-grid resampling with forward fill — the gap-filling operator every
 * tick/event pipeline needs: project each key's irregular observations
 * onto a regular time grid (one slot per `stepUnit`) and carry the last
 * observation forward into empty slots ("last known price at every hour").
 *
 * Execution shape at scale — ONE shuffle, no join, no fill window:
 *  - rows repartition by key once; the in-slot election (max_by, tie-broken
 *    by `tieCol`, map-side-combinable), the lead() window, and the grid
 *    generation all reuse that clustering (ClusteredDistribution subset
 *    rule), so nothing re-exchanges;
 *  - the grid materializes via `sequence` + `explode` — generated
 *    DISTRIBUTED, each observation emitting its own gap run up to the
 *    key's next observation, never on the driver;
 *  - the forward fill is BY CONSTRUCTION (a gap slot is generated from
 *    the observation it inherits), not by a window scan; task memory is
 *    bounded by the densest single key's span/step.
 *
 * Contract: `tsCol` non-null; (`tsCol`, `tieCol`) unique per key so the
 * in-slot winner is deterministic.
 */
object GridFill {

  private val Units = Set("minute", "hour", "day")

  /**
   * Returns one row per (key, grid slot) covering each key's observed
   * span at `stepUnit` granularity:
   *  - `slot`: the grid timestamp (truncated to `stepUnit`)
   *  - `<valCol>_fill`: the forward-filled value
   *  - `is_gap`: true when the slot had no observation of its own
   */
  def forwardFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      tieCol: String,
      stepUnit: String): DataFrame = {
    require(Units.contains(stepUnit), s"stepUnit must be one of $Units, got $stepUnit")
    val reserved = Set("slot", "next_slot", "obs_slot", "is_gap", s"${valCol}_fill")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // null check INSIDE the truncation so pruning can never remove it: a
    // null timestamp would null the key's bounds and silently drop its
    // whole grid — fail loudly instead (GlobalRank's null-contract rule)
    val trunc = (c: String) => expr(
      s"""case when $c is null then cast(raise_error(
            'GridFill.forwardFill: $c is null — the contract requires non-null timestamps') as timestamp)
          else date_trunc('$stepUnit', $c) end""")
    // ONE shuffle total: partition by key up front; every downstream step
    // (bounds agg, per-(key, slot) election agg, the grid/obs join, the
    // fill window) is satisfied by this clustering — Spark's subset rule
    // for ClusteredDistribution means none of them re-exchange.
    // ONE shuffle total: partition by key up front; the (key, slot)
    // election aggregate, the lead() window, and the generate all run on
    // that clustering (ClusteredDistribution's subset rule) with no
    // further exchange — and the fill needs NO join and NO second window,
    // because each observation GENERATES its own gap run below.
    val keyed = df.repartition(col(keyCol))
    // latest observation per (key, slot) via max_by — map-side-combinable
    // aggregation; deterministic under ts ties through the tie column
    val slotObs = keyed
      .withColumn("slot", trunc(tsCol))
      .groupBy(keyCol, "slot")
      .agg(expr(s"max_by($valCol, struct($tsCol, $tieCol))").as(valCol))
    // gaps-and-islands fill: every observed slot emits itself plus the
    // empty slots up to (exclusive) the key's next observed slot, carrying
    // its own value — the forward fill is by construction, not by window
    // scan, and the last observation closes the grid at the key's max slot
    val wNext = Window.partitionBy(keyCol).orderBy("slot")
    slotObs
      .withColumn("next_slot", lead("slot", 1).over(wNext))
      .select(
        col(keyCol), col("slot").as("obs_slot"), col(valCol),
        explode(expr(
          s"""sequence(slot,
                coalesce(next_slot - interval 1 $stepUnit, slot),
                interval 1 $stepUnit)""")).as("slot"))
      .withColumn(s"${valCol}_fill", col(valCol))
      .withColumn("is_gap", col("slot") =!= col("obs_slot"))
      .drop(valCol, "obs_slot")
  }
}
