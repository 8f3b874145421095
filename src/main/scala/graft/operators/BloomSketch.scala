package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bloom-filter set sketch as a mergeable typed Aggregator: builds a
 * fixed-size bit set over 64-bit keys with partial aggregation (map-side
 * combine, partials merge by OR), so the membership side of a screen — "is
 * this shingle/url/id in the reference set?" — ships as a few KB of bits
 * broadcast to every task instead of a reference-set-sized join side.
 *
 * The scale story vs an exact broadcast screen (the q56 shape): an exact
 * screen broadcasts one row PER reference item; the bloom broadcasts
 * O(mBits) REGARDLESS of reference-set size, trading a bounded,
 * tunable false-positive rate for it. Guarantees:
 *  - NO false negatives, ever (a set bit is never cleared; merging is OR);
 *  - false-positive rate ~ (1 - e^(-k*n/m))^k, fixed by sizing m to n.
 * Both hold for any merge order, so the sketch is deterministic given the
 * key set — unlike order-dependent sketches, the bloom's exact bits are
 * reproducible across runs and partitionings.
 *
 * Membership is checked by [[graft.functions.BloomMightContain]] — a
 * codegen'd Catalyst expression over the finished bytes — or JVM-side via
 * [[BloomSketch.mightContain]].
 *
 * Hashing: double hashing with two splitmix64-derived values,
 * bit_i = (h1 + i*h2) mod m, m a power of two and h2 forced odd so the k
 * probe strides cover the whole bit space. Keys are Longs: callers hash
 * strings through the library's md5-prefix convention first
 * (HashConventions.md5long48), keeping the text pipeline's cross-engine
 * hashing story unchanged.
 */
class BloomAgg(requestedBits: Int, val k: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {

  require(k >= 1 && k <= 255, s"k ($k) must be in [1, 255]")
  require(requestedBits >= 1, s"requestedBits ($requestedBits) must be positive")

  /** Bits rounded UP to a power of two (>= 64): modulo becomes a mask and
    * the false-positive rate only improves vs the requested size. */
  val mBits: Int = {
    var m = 64
    while (m < requestedBits && m < (1 << 30)) m <<= 1
    m
  }
  private val words = mBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val h1 = BloomSketch.splitmix64(key)
    val h2 = BloomSketch.splitmix64(key ^ BloomSketch.H2Tweak) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & Long.MaxValue) % mBits
      buf((bit >> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  /** Wire format: [k: 1 byte][words as big-endian 8-byte groups]. mBits is
    * implied by the length: (bytes.length - 1) * 8. */
  override def finish(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](1 + words * 8)
    out(0) = k.toByte
    var w = 0
    while (w < words) {
      var j = 0
      while (j < 8) {
        out(1 + w * 8 + j) = (buf(w) >>> (56 - 8 * j)).toByte
        j += 1
      }
      w += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BloomSketch {

  /** Second-hash derivation tweak — arbitrary non-zero constant, fixed
    * forever (the sketch bits are part of the operator's contract). */
  final val H2Tweak = 0x5DEECE66DL

  /** splitmix64 finalizer — the shared scrambler of both probe hashes.
    * Must stay EXACTLY in sync with the generated code in
    * graft.functions.BloomMightContain.doGenCode. */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** JVM-side membership test over the finished wire bytes — the reference
    * implementation the Catalyst expression is spec-locked against. */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val k = bloom(0) & 0xff
    val mBits = (bloom.length - 1) * 8
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ H2Tweak) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & Long.MaxValue) % mBits
      // byte layout: word w's big-endian bytes hold bits [w*64, w*64+63],
      // bit b of the word is byte (7 - b/8) within the group, bit (b % 8)
      val word = (bit >> 6).toInt
      val inWord = (bit & 63).toInt
      val byte = bloom(1 + word * 8 + (7 - inWord / 8))
      if (((byte >> (inWord % 8)) & 1) == 0) return false
      i += 1
    }
    true
  }
}
