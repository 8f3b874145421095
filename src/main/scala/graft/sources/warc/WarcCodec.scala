package graft.sources.warc

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

/**
 * Pure WARC 1.0 (ISO 28500) record-level codec — the web-archive container
 * Common Crawl ships its corpus in. Zero-dependency by design (the bi5
 * connector's discipline, reference BI5DataSource.scala:149-186 for the
 * skip-corrupt contract this mirrors): records are
 *
 *   WARC/1.0 CRLF
 *   Name: value CRLF ...          (header block)
 *   CRLF
 *   <Content-Length bytes>        (payload block)
 *   CRLF CRLF                     (record separator)
 *
 * Parsing is STREAMING and fault-truncating: any malformed version line,
 * missing/invalid Content-Length, or EOF inside a payload silently ends
 * that file's contribution (corrupt tails lose at most the broken record
 * and what follows it in that one file — never the job). Bare-LF line
 * endings are tolerated on input; output is strict CRLF.
 */
object WarcCodec {

  /** Parsed header block of one record; payload is read separately so the
    * scan can SKIP bytes it will never materialize (pruned payload column,
    * pushed record_type filter). */
  final case class WarcHeader(
      recordId: String,
      recordType: String,
      targetUri: String,
      dateMicros: java.lang.Long,
      contentType: String,
      contentLength: Long)

  /** One fully-read record (payload null when pruned by the caller). */
  final case class WarcRecord(header: WarcHeader, payload: Array[Byte])

  /** Encode one record (spec/fixture writer — strict CRLF). */
  def encode(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    w("WARC/1.0\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${payload.length}\r\n")
    w("\r\n")
    out.write(payload)
    w("\r\n\r\n")
    out.toByteArray
  }

  /**
   * Streaming record iterator over one (possibly gzip-decompressed) WARC
   * stream. `keep` decides record emission from the header alone;
   * `wantPayload` false skips payload bytes without allocating (records
   * not kept always skip). The iterator owns no resources — the caller
   * closes the underlying stream.
   */
  final class RecordIterator(
      in: InputStream,
      keep: WarcHeader => Boolean,
      wantPayload: Boolean)
      extends Iterator[WarcRecord] {

    private var nextRec: WarcRecord = _
    private var done = false

    override def hasNext: Boolean = {
      if (done) return false
      if (nextRec != null) return true
      advance()
      nextRec != null
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec
      nextRec = null
      r
    }

    // advance to the next KEPT record; any structural fault truncates
    private def advance(): Unit = {
      try {
        while (!done && nextRec == null) {
          var line = readLine()
          while (line != null && line.isEmpty) line = readLine() // inter-record padding
          if (line == null) { done = true; return }
          if (!line.startsWith("WARC/")) { done = true; return } // corrupt: truncate
          var h = Map.empty[String, String]
          var hl = readLine()
          var corrupt = false
          while (hl != null && hl.nonEmpty) {
            val i = hl.indexOf(':')
            if (i <= 0) { corrupt = true; hl = null }
            else {
              h += hl.substring(0, i).trim.toLowerCase -> hl.substring(i + 1).trim
              hl = readLine()
            }
          }
          if (corrupt || hl == null) { done = true; return } // header EOF/garbage
          val len = h.get("content-length").flatMap(s => s.toLongOption) match {
            case Some(n) if n >= 0 => n
            case _                 => done = true; return // unskippable: truncate
          }
          val header = WarcHeader(
            h.getOrElse("warc-record-id", null),
            h.getOrElse("warc-type", null),
            h.getOrElse("warc-target-uri", null),
            h.get("warc-date").flatMap(parseMicros).map(Long.box).orNull,
            h.getOrElse("content-type", null),
            len)
          val emit = keep(header)
          if (emit && wantPayload) {
            val buf = new Array[Byte](math.toIntExact(len))
            readFully(buf)
            nextRec = WarcRecord(header, buf)
          } else {
            skipFully(len)
            // skip() on a plain FileInputStream seeks PAST EOF and still
            // reports success — prove the payload was really there by
            // consuming one byte of the mandatory CRLF separator
            if (in.read() < 0) throw new EOFException("record separator truncated")
            if (emit) nextRec = WarcRecord(header, null)
          }
        }
      } catch {
        case _: EOFException | _: ArithmeticException => done = true // truncated tail
      }
    }

    /** ISO-8601 WARC-Date to epoch micros; null on anything malformed. */
    private def parseMicros(s: String): Option[Long] =
      try {
        val t = java.time.Instant.parse(s)
        Some(math.addExact(math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L))
      } catch { case _: Exception => None }

    /** One header line, CRLF or bare LF, null at EOF. */
    private def readLine(): String = {
      val out = new ByteArrayOutputStream(96)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { out.write(b); b = in.read() }
      val bytes = out.toByteArray
      val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
      new String(bytes, 0, n, StandardCharsets.UTF_8)
    }

    private def readFully(buf: Array[Byte]): Unit = {
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) throw new EOFException("payload truncated")
        off += n
      }
    }

    private def skipFully(len: Long): Unit = {
      var left = len
      while (left > 0) {
        val n = in.skip(left)
        if (n <= 0) {
          if (in.read() < 0) throw new EOFException("payload truncated")
          left -= 1
        } else left -= n
      }
    }
  }
}
