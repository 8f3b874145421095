package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming analytics over the bi5 tick source itself — the end-to-end shape
 * the connector exists for: `spark.readStream.format("bi5")` tails the
 * growing hour tree and this module turns the live ticks into bars.
 *
 * OHLC open/close use `min_by`/`max_by` keyed by `struct(ts, price)`: the
 * struct orders lexicographically, so two ticks sharing a millisecond still
 * resolve deterministically — the same rows produce the same bars in
 * streaming, batch, or any partitioning (and the batch-parity spec holds
 * exactly, not approximately).
 */
object TickStreams {

  /**
   * Tumbling OHLC bars per ticker over a (streaming or static) tick frame
   * with the bi5 schema. One shuffle on (ticker, window); with a watermarked
   * streaming input, state is bounded by the watermark horizon.
   *
   * @param ticks bi5-schema frame (`ticker, ts, ask, bid, ask_volume, ...`)
   * @param width tumbling window width, e.g. "1 minute"
   */
  def ohlcBars(ticks: DataFrame, width: String = "1 minute"): DataFrame =
    ticks
      .groupBy(col("ticker"), window(col("ts"), width).as("w"))
      .agg(
        expr("min_by(ask, struct(ts, ask))").as("open"),
        max(col("ask")).as("high"),
        min(col("ask")).as("low"),
        expr("max_by(ask, struct(ts, ask))").as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col("ask_volume").cast("decimal(18,6)")).cast("double").as("volume"))
      .select(
        col("ticker"),
        unix_millis(col("w.start")).as("bar_start_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"), col("volume"))

  /** Watermarked variant for append-mode sinks: bars seal once the watermark
    * passes their window end, bounding state on an unbounded tail. */
  def ohlcBarsWatermarked(ticks: DataFrame, width: String = "1 minute",
      lateness: String = "2 hours"): DataFrame =
    ohlcBars(ticks.withWatermark("ts", lateness), width)
}
