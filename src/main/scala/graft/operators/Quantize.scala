package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scalar quantization (SQ8) of embedding columns: compress each float32
 * dimension to an 8-bit code against global per-dimension [lo, hi] bounds.
 * 4x memory cut (256 B -> 64 B for 64-dim) is what lets a billion-vector
 * ANN index fit executor memory; reconstruction error is bounded by half a
 * quantization step per dimension, which IVF/LSH routing tolerates.
 *
 * Execution shape at scale:
 *  - bounds: posexplode + per-dimension min/max — map-side-combinable
 *    aggregate with `dim` keys, one tiny shuffle;
 *  - coding: the dim-row bounds collapse to two arrays broadcast to every
 *    task, and each vector quantizes in ONE codegen'd transform — map-only
 *    over the corpus, no shuffle, no UDF.
 *
 * Determinism: codes derive from double arithmetic with a fixed op order
 * (`(x - lo) / (hi - lo) * 255 + 0.5`, floored), so any engine computing
 * IEEE doubles produces identical codes — the property the q77 DuckDB
 * oracle checks end to end.
 */
object Quantize {

  /** One row per dimension (1-based `pos`): global `lo`/`hi` bounds. */
  def dimBounds(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("p0", "x")))
      .select((col("p0") + 1).as("pos"), col("x").cast("double").as("x"))
      .groupBy("pos")
      .agg(min("x").as("lo"), max("x").as("hi"))

  /**
   * Appends `sq8_codes` (array<bigint>, one 0..255 code per dimension)
   * plus the broadcast `lo_a`/`hi_a` bound arrays (kept for downstream
   * dequantization/error math; drop them if unneeded). A degenerate
   * dimension (hi == lo) codes to 0 and dequantizes exactly to `lo`.
   */
  def sq8(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim ($dim) must be positive")
    val reserved = Set("lo_a", "hi_a", "sq8_codes")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val boundArrs = dimBounds(df, vecCol).agg(
      expr("transform(array_sort(collect_list(struct(pos, lo))), s -> s.lo)").as("lo_a"),
      expr("transform(array_sort(collect_list(struct(pos, hi))), s -> s.hi)").as("hi_a"))
    df.crossJoin(broadcast(boundArrs))
      .withColumn("sq8_codes",
        expr(s"""transform(sequence(1, $dim), j ->
          case when element_at(hi_a, j) = element_at(lo_a, j) then cast(0 as bigint)
               else cast(floor((cast(element_at($vecCol, j) as double) - element_at(lo_a, j))
                         / (element_at(hi_a, j) - element_at(lo_a, j)) * 255.0d + 0.5d) as bigint)
          end)"""))
  }
}
