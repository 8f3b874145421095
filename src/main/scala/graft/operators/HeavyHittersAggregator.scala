package graft.operators

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
 */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(k >= 1, s"k ($k) must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        // classic decrement step: no free counter, so every counter pays 1
        // (including, virtually, the new item's 0+1) — at most n/(k+1)
        // decrements can ever happen in total
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // keep the k largest counters; subtracting the (k+1)-th largest from
      // every survivor restores the undercount invariant after the merge
      val d = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (i, c) => if (c - d > 0) Some(i -> (c - d)) else None }
    }
  }

  /** Sketch entries, largest estimate first, ties by item — deterministic
    * PRESENTATION; the estimates themselves are order-dependent. */
  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
