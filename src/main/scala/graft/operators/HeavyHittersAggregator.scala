package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra-Gries heavy-hitters sketch as a typed Aggregator: finds every item
 * whose frequency exceeds n/(k+1) using a buffer of AT MOST k counters,
 * with partial aggregation (map-side combine) and mergeable partials — the
 * bounded-memory answer to "top domains / tokens / urls" where an exact
 * groupBy-count would shuffle one row per distinct item (billions at
 * 100 TB) just to keep a handful.
 *
 * Guarantees (the classic Misra-Gries bounds, preserved under merging —
 * summaries of this kind are mergeable without weakening the bound):
 *  - estimate <= true frequency (never overcounts);
 *  - estimate >= true frequency - n/(k+1), where n is the TOTAL input count;
 *  - therefore every item with true frequency > n/(k+1) is in the sketch.
 * Estimates depend on encounter order (partitioning), so exact VALUES are
 * not deterministic across runs — the bounds above are. Query q62 verifies
 * the contract against exact counts, not the estimates.
 *
 * The buffer is a MUTABLE map updated in place: reduce() runs once per
 * input row (billions at the advertised scale), and rebuilding a
 * persistent map per row would put allocation on the innermost loop of the
 * sketch that exists to be cheap. Encoding to the shuffle only happens at
 * partial-aggregation boundaries.
 */
class HeavyHitters(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {

  require(k >= 1, s"k ($k) must be positive")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      buf: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    buf.get(x) match {
      case Some(c) => buf(x) = c + 1
      case None if buf.size < k => buf(x) = 1L
      case None =>
        // classic decrement step: no free counter, so every counter pays 1
        // (including, virtually, the new item's 0+1) — at most n/(k+1)
        // decrements can ever happen in total
        buf.filterInPlace((_, c) => c > 1)
          .mapValuesInPlace((_, c) => c - 1)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => a(i) = a.getOrElse(i, 0L) + c }
    if (a.size > k) {
      // keep the k largest counters; subtracting the (k+1)-th largest from
      // every survivor restores the undercount invariant after the merge
      val d = a.values.toArray.sorted(Ordering[Long].reverse)(k)
      a.filterInPlace((_, c) => c - d > 0)
        .mapValuesInPlace((_, c) => c - d)
    }
    a
  }

  /** Sketch entries, largest estimate first, ties by item — deterministic
    * PRESENTATION; the estimates themselves are order-dependent. */
  override def finish(buf: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
