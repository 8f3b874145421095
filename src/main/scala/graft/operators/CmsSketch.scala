package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Count-min-sketch frequency summary as a mergeable typed Aggregator: a
 * depth x width counter grid over 64-bit keys with partial aggregation
 * (map-side combine; partials merge by elementwise ADDITION), answering
 * point-frequency queries — "how often does this token/url/id occur?" —
 * from O(depth * width) memory REGARDLESS of how many distinct keys exist.
 *
 * The scale story vs an exact count: a groupBy-count shuffles one row per
 * DISTINCT key (billions at 100 TB) even when only a handful of keys will
 * ever be probed; the CMS ships a fixed-size grid. It complements the
 * library's other sketches — Bloom answers "present at all?"
 * ([[BloomAgg]]), Misra-Gries finds WHICH keys are frequent
 * ([[HeavyHitters]]), CMS estimates how often a GIVEN key occurs.
 *
 * Guarantees (classic CMS bounds):
 *  - estimate >= true frequency, always (counters only ever add);
 *  - estimate <= true frequency + overshoot, where each row's expected
 *    overshoot is N/width (N = total input count) and the min over `depth`
 *    independent rows falls exponentially below it.
 * Counter addition is commutative and associative, so — unlike
 * encounter-order sketches (Misra-Gries) — the finished grid and every
 * estimate are DETERMINISTIC given the input multiset: reruns and
 * repartitionings reproduce identical estimates.
 *
 * Estimates are read by [[graft.functions.CmsEstimate]] — a codegen'd
 * Catalyst expression over the finished bytes — or JVM-side via
 * [[CmsSketch.estimate]]. Keys are Longs: callers hash strings through the
 * library's md5-prefix convention first (HashConventions.md5long48).
 *
 * Hashing: the same double-hashing family as [[BloomAgg]] — row i probes
 * column (h1 + i*h2) mod width, both hashes splitmix64-derived, h2 forced
 * odd, width a power of two.
 */
class CmsAgg(requestedWidth: Int, val depth: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {

  require(depth >= 1 && depth <= 255, s"depth ($depth) must be in [1, 255]")
  require(requestedWidth >= 1, s"requestedWidth ($requestedWidth) must be positive")

  /** Width rounded UP to a power of two (>= 64): modulo becomes a mask and
    * the per-row overshoot bound only improves vs the requested size. */
  val width: Int = {
    var w = 64
    while (w < requestedWidth && w < (1 << 28)) w <<= 1
    w
  }
  private val cells = depth * width

  override def zero: Array[Long] = new Array[Long](cells)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val h1 = BloomSketch.splitmix64(key)
    val h2 = BloomSketch.splitmix64(key ^ BloomSketch.H2Tweak) | 1L
    var i = 0
    while (i < depth) {
      val c = (((h1 + i.toLong * h2) & Long.MaxValue) % width).toInt
      buf(i * width + c) += 1
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { a(i) += b(i); i += 1 }
    a
  }

  /** Wire format: [depth: 1 byte][counters as big-endian 8-byte longs, row
    * major]. Width is implied by the length: (bytes.length - 1) / 8 / depth. */
  override def finish(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](1 + cells * 8)
    out(0) = depth.toByte
    var i = 0
    while (i < cells) {
      var j = 0
      while (j < 8) {
        out(1 + i * 8 + j) = (buf(i) >>> (56 - 8 * j)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object CmsSketch {

  /** JVM-side point-frequency estimate over the finished wire bytes — the
    * reference implementation the Catalyst expression is spec-locked
    * against. */
  def estimate(cms: Array[Byte], key: Long): Long = {
    val depth = cms(0) & 0xff
    val width = (cms.length - 1) / 8 / depth
    val h1 = BloomSketch.splitmix64(key)
    val h2 = BloomSketch.splitmix64(key ^ BloomSketch.H2Tweak) | 1L
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = (((h1 + i.toLong * h2) & Long.MaxValue) % width).toInt
      val off = 1 + (i * width + c) * 8
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (cms(off + j) & 0xffL); j += 1 }
      if (v < best) best = v
      i += 1
    }
    best
  }
}
