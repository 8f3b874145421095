package graft.sources.warc

import java.io.{EOFException, InputStream}
import java.util.zip.{Inflater, ZipException}

/**
 * Gzip MEMBER walker — the intra-file split unit of `.warc.gz` archives.
 * Real Common Crawl segments are ~1 GB files whose records are each an
 * INDIVIDUALLY gzip-compressed member (the WARC spec's record-at-a-time
 * compression), so member boundaries are safe split points: a member is a
 * self-contained deflate stream, and no WARC record spans members. This
 * walker parses the member framing (RFC 1952: header with optional
 * FEXTRA/FNAME/FCOMMENT/FHCRC fields, raw-deflate body, CRC32+ISIZE
 * trailer) with its own buffering so it always knows the exact absolute
 * COMPRESSED offset of every member start — the one thing
 * `java.util.zip.GZIPInputStream` hides (it splices concatenated members
 * silently).
 *
 * Two callers share it:
 *  - [[GzipMembers.memberOffsets]] — the PLANNING-time indexer: walk the
 *    whole file inflating-and-discarding, return every member-start
 *    offset. Deflate carries no length field, so finding a member's end
 *    requires inflating it; the index pass costs one decompression and
 *    buys bounded task sizes for any file layout.
 *  - [[GzipMembers.MemberRangeStream]] — the READ-time range decompressor:
 *    positioned at a member boundary, present the concatenated
 *    DECOMPRESSED bytes of every member whose start offset lies in
 *    `[rangeStart, rangeEnd)`, then EOF. Feeding it to the existing
 *    [[WarcCodec.RecordIterator]] composes with pruning, pushdown and
 *    skip-corrupt unchanged.
 */
object GzipMembers {

  /** Absolute start offset of every member (first is always 0). Walks the
    * entire stream; throws on malformed framing (callers treat that as
    * skip-corrupt and fall back to a whole-file partition). */
  def memberOffsets(in: InputStream): Vector[Long] = {
    val w = new Walker(in, 0L)
    val out = Vector.newBuilder[Long]
    val sink = new Array[Byte](64 * 1024)
    while (w.openMember()) {
      out += w.memberStart
      while (w.inflateInto(sink) >= 0) ()
    }
    out.result()
  }

  /**
   * Incremental member walker over `in`, whose first byte is at absolute
   * compressed offset `base`. Usage: `openMember()` (false at clean EOF),
   * then `inflateInto(buf)` until it returns -1 (member finished, trailer
   * consumed), repeat.
   */
  final class Walker(in: InputStream, base: Long) {
    private val buf = new Array[Byte](64 * 1024)
    private var len = 0
    private var pos = 0
    private var bufBase = base // absolute offset of buf(0)
    private val inf = new Inflater(true)
    private var inMember = false

    /** Absolute offset of the current member's first byte. */
    var memberStart: Long = -1L

    private def absolute: Long = bufBase + pos

    private def ensure(): Boolean = {
      if (pos < len) return true
      bufBase += len; pos = 0; len = 0
      val n = in.read(buf)
      if (n < 0) return false
      len = n
      true
    }

    private def readByte(): Int = {
      if (!ensure()) throw new EOFException("truncated gzip member")
      val b = buf(pos) & 0xFF
      pos += 1
      b
    }

    private def skipBytes(n: Int): Unit = {
      var i = 0
      while (i < n) { readByte(); i += 1 }
    }

    private def skipZeroTerminated(): Unit = while (readByte() != 0) ()

    /** Parse the next member header. False at clean EOF between members. */
    def openMember(): Boolean = {
      require(!inMember, "openMember inside an open member")
      if (!ensure()) return false
      memberStart = absolute
      val m1 = readByte(); val m2 = readByte()
      if (m1 != 0x1F || m2 != 0x8B)
        throw new ZipException(
          f"bad gzip magic at offset $memberStart: $m1%02x $m2%02x")
      if (readByte() != 8) throw new ZipException("unsupported gzip compression method")
      val flg = readByte()
      skipBytes(6) // MTIME(4) XFL OS
      if ((flg & 0x04) != 0) { // FEXTRA
        val xl = readByte() | (readByte() << 8)
        skipBytes(xl)
      }
      if ((flg & 0x08) != 0) skipZeroTerminated() // FNAME
      if ((flg & 0x10) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 0x02) != 0) skipBytes(2) // FHCRC
      inf.reset()
      inMember = true
      true
    }

    private var pendingEnd = false

    /** Inflate some of the current member into `out`; 0 is a legal "fed
      * more input, try again"; -1 = member finished (trailer consumed). */
    def inflateInto(out: Array[Byte]): Int = {
      require(inMember, "inflateInto outside a member")
      if (pendingEnd) { pendingEnd = false; inMember = false; return -1 }
      while (true) {
        if (inf.needsInput) {
          if (!ensure()) throw new EOFException("truncated deflate stream")
          inf.setInput(buf, pos, len - pos)
          pos = len
        }
        val n =
          try inf.inflate(out)
          catch { case e: java.util.zip.DataFormatException => throw new ZipException(e.getMessage) }
        if (inf.finished()) {
          pos -= inf.getRemaining // hand unconsumed bytes back to the buffer
          skipBytes(8) // CRC32 + ISIZE
          if (n > 0) { pendingEnd = true; return n } // report end on the NEXT call
          inMember = false
          return -1
        }
        if (n > 0) return n
        if (inf.needsDictionary()) throw new ZipException("preset dictionary unsupported")
      }
      -1 // unreachable
    }
  }

  /**
   * Decompressed view of the members whose start offset lies in
   * `[rangeStart, rangeEnd)`. `raw` must already be positioned at
   * `rangeStart` (a member boundary from the planning index).
   */
  final class MemberRangeStream(raw: InputStream, rangeStart: Long, rangeEnd: Long)
      extends InputStream {

    private val walker = new Walker(raw, rangeStart)
    private val chunk = new Array[Byte](64 * 1024)
    private var chunkLen = 0
    private var chunkPos = 0
    private var inMember = false
    private var eof = false

    private def fill(): Boolean = {
      while (!eof && chunkPos >= chunkLen) {
        if (!inMember) {
          if (!walker.openMember() || walker.memberStart >= rangeEnd) { eof = true; return false }
          inMember = true
        }
        val n = walker.inflateInto(chunk)
        if (n < 0) { inMember = false }
        else { chunkLen = n; chunkPos = 0 }
      }
      !eof
    }

    override def read(): Int = {
      if (!fill()) return -1
      val b = chunk(chunkPos) & 0xFF
      chunkPos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      if (!fill()) return -1
      val take = math.min(n, chunkLen - chunkPos)
      System.arraycopy(chunk, chunkPos, b, off, take)
      chunkPos += take
      take
    }

    override def close(): Unit = raw.close()
  }

  /** Group member offsets into byte ranges of at least `targetBytes`
    * compressed bytes each: every range starts at a member boundary, the
    * last extends to `Long.MaxValue` (= end of file). */
  def ranges(offsets: Vector[Long], targetBytes: Long): Vector[(Long, Long)] = {
    if (offsets.isEmpty) return Vector.empty
    val starts = Vector.newBuilder[Long]
    starts += offsets.head
    var last = offsets.head
    offsets.tail.foreach { o =>
      if (o - last >= targetBytes) { starts += o; last = o }
    }
    val ss = starts.result()
    ss.zipAll(ss.drop(1), 0L, Long.MaxValue).map { case (s, e) => (s, e) }
  }
}
