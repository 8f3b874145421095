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
 * Execution shape at scale:
 *  - per-key bounds are one map-side-combinable min/max aggregate;
 *  - the grid materializes via `sequence` + `explode` — generated
 *    DISTRIBUTED, sized span/step per key, never on the driver;
 *  - in-slot election (latest observation wins, tie-broken by `tieCol`)
 *    is a row_number over (key, slot) — high-cardinality partition keys;
 *  - the forward fill is `last(ignoreNulls)` over a per-key window, ONE
 *    shuffle on the key; each key's window holds only its grid rows
 *    (span/step), so task memory is bounded by the densest single key.
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
    val reserved = Set("slot", "lo", "hi", "grid_rn", "is_gap", s"${valCol}_fill")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // null check INSIDE the truncation so pruning can never remove it: a
    // null timestamp would null the key's bounds and silently drop its
    // whole grid — fail loudly instead (GlobalRank's null-contract rule)
    val trunc = (c: String) => expr(
      s"""case when $c is null then cast(raise_error(
            'GridFill.forwardFill: $c is null — the contract requires non-null timestamps') as timestamp)
          else date_trunc('$stepUnit', $c) end""")
    val bounds = df.groupBy(keyCol).agg(
      min(trunc(tsCol)).as("lo"), max(trunc(tsCol)).as("hi"))
    val grid = bounds.select(
      col(keyCol),
      explode(expr(s"sequence(lo, hi, interval 1 $stepUnit)")).as("slot"))
    // latest observation per (key, slot), deterministic under ts ties
    val wSlot = Window.partitionBy(keyCol, "slot")
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val slotObs = df
      .withColumn("slot", trunc(tsCol))
      .withColumn("grid_rn", row_number().over(wSlot))
      .filter(col("grid_rn") === 1)
      .select(col(keyCol), col("slot"), col(valCol))
    val wFill = Window.partitionBy(keyCol).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(slotObs, Seq(keyCol, "slot"), "left")
      .withColumn(s"${valCol}_fill", last(valCol, ignoreNulls = true).over(wFill))
      .withColumn("is_gap", col(valCol).isNull)
      .drop(valCol)
  }
}
