package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed per-group exact top-k aggregator: keeps the k largest (value, id)
 * pairs, ordered by value DESC then id ASC (deterministic ties).
 *
 * Why an Aggregator and not a ranking window: a window must shuffle and SORT
 * every row of every group; this buffer carries at most k pairs per group
 * through partial aggregation (map-side combine), so shuffle volume is
 * O(groups x k) instead of O(rows) — the shape that survives a 100 TB group-by.
 */
class TopKByValue(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  // Total order even for NaN (java compare ranks NaN above all values — the
  // same rank ORDER BY value DESC gives it in Spark and DuckDB windows; a
  // plain `>` would make every NaN comparison false and silently corrupt the
  // buffer). `+ 0.0` collapses -0.0 to 0.0 so the tie-break matches the
  // windows' equality semantics.
  private def better(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2 + 0.0, b._2 + 0.0)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
    // buf is kept sorted best-first and at most k long; k is small, so a
    // linear insert beats heap ceremony
    val (front, back) = buf.span(better(_, x))
    val merged = (front :+ x) ++ back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.length == k && !better(in, buf.last)) buf else insert(buf, in)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.foldLeft(a)((acc, x) => if (acc.length == k && !better(x, acc.last)) acc else insert(acc, x))

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
