package graft.operators

/**
 * Zero-dependency encoders/decoders for four public byte layouts, so the
 * multimodal pipeline ([[Multimodal]]) faces REAL format bytes instead of a
 * stub:
 *
 *  - WAV: RIFF container, PCM integer samples, little-endian (the canonical
 *    44-byte-header layout; the decoder walks chunks, so extra chunks like
 *    LIST/INFO between `fmt ` and `data` are handled).
 *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit BGR,
 *    rows bottom-up and padded to 4-byte boundaries (top-down negative
 *    heights accepted on decode).
 *  - PPM: Netpbm P6 — ASCII header (`P6`, width, height, maxval, with
 *    `#` comments) followed by binary RGB triplets.
 *  - PNG: signature + CRC-checked chunks, 8-bit RGB/RGBA, zlib-deflated
 *    IDAT scanlines (java.util.zip), all five per-row filters — the one
 *    widely-used web image container decodable with zero dependencies.
 *
 * Everything is plain byte arithmetic on `Array[Byte]` — no javax.imageio,
 * no sound API — so the decoders run identically inside executor tasks on
 * any JVM. All failure modes throw `IllegalArgumentException` with the
 * offending detail (the library's loud-contract rule): a truncated header,
 * a wrong magic, an unsupported bit depth must fail the task, not decode
 * garbage into training features.
 */
object MediaCodecs {

  // ------------------------------------------------------------------ WAV

  /** Decoded PCM audio: interleaved samples widened to Int (16-bit signed
    * or 8-bit unsigned-rebased-to-signed, per the WAV spec). */
  final case class WavPcm(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      samples: Array[Int]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
  }

  /** Encode 16-bit PCM samples (interleaved if channels > 1) as a canonical
    * RIFF/WAVE byte stream: 12-byte RIFF header, 16-byte `fmt ` chunk,
    * `data` chunk — 44 header bytes + 2 bytes per sample. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate ($sampleRate) must be positive")
    require(channels > 0, s"channels ($channels) must be positive")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} is not a multiple of channels $channels")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    putAscii(out, 0, "RIFF")
    putLeInt(out, 4, 36 + dataSize)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLeInt(out, 16, 16) // PCM fmt chunk payload size
    putLeShort(out, 20, 1) // audio format 1 = PCM
    putLeShort(out, 22, channels)
    putLeInt(out, 24, sampleRate)
    putLeInt(out, 28, sampleRate * channels * 2) // byte rate
    putLeShort(out, 32, channels * 2) // block align
    putLeShort(out, 34, 16) // bits per sample
    putAscii(out, 36, "data")
    putLeInt(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putLeShort(out, 44 + 2 * i, samples(i).toInt)
      i += 1
    }
    out
  }

  /** Parse a RIFF/WAVE byte stream: validate magics, walk chunks to `fmt `
    * and `data` (skipping unknown chunks, honoring the RIFF odd-size pad
    * byte), decode PCM samples. Supports format 1 (integer PCM) at 16 or
    * 8 bits; anything else fails loudly. */
  def decodeWav(bytes: Array[Byte]): WavPcm = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    require(ascii(bytes, 0, 4) == "RIFF", s"not RIFF: magic ${ascii(bytes, 0, 4)}")
    require(ascii(bytes, 8, 4) == "WAVE", s"not WAVE: form ${ascii(bytes, 8, 4)}")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(bytes, pos, 4)
      val size = leInt(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"WAV chunk '$id' at $pos claims $size bytes beyond the payload end")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val audioFormat = leShort(bytes, pos + 8)
          require(audioFormat == 1, s"unsupported WAV audio format $audioFormat (only PCM=1)")
          fmt = Some((leShort(bytes, pos + 10), leInt(bytes, pos + 12), leShort(bytes, pos + 22)))
        case "data" =>
          data = Some((pos + 8, size))
        case _ => // unknown chunk (LIST, fact, ...): skip
      }
      pos += 8 + size + (size & 1) // RIFF pads odd chunk sizes
    }
    val (channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("WAV has no fmt chunk"))
    val (dOff, dSize) = data.getOrElse(
      throw new IllegalArgumentException("WAV has no data chunk"))
    require(channels > 0, s"WAV channels $channels must be positive")
    require(rate > 0, s"WAV sample rate $rate must be positive")
    val samples = bits match {
      case 16 =>
        require(dSize % 2 == 0, s"16-bit WAV data size $dSize is odd")
        Array.tabulate(dSize / 2)(i => leShort16Signed(bytes, dOff + 2 * i))
      case 8 =>
        // 8-bit WAV is UNSIGNED with midpoint 128; rebase to signed
        Array.tabulate(dSize)(i => (bytes(dOff + i) & 0xff) - 128)
      case b =>
        throw new IllegalArgumentException(s"unsupported WAV bit depth $b (only 8/16)")
    }
    WavPcm(rate, channels, bits, samples)
  }

  // ------------------------------------------------------------------ BMP

  /** Decoded 24-bit bitmap: `rgb` is top-down row-major R,G,B bytes
    * (3 * width * height), row padding stripped. */
  final case class Bmp(width: Int, height: Int, rgb: Array[Byte])

  /** Encode a top-down row-major RGB buffer as an uncompressed 24-bit BMP:
    * 14-byte file header, 40-byte BITMAPINFOHEADER, BGR pixel rows written
    * bottom-up and zero-padded to 4-byte boundaries. */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"dimensions ${width}x$height must be positive")
    require(rgb.length == 3 * width * height,
      s"rgb buffer ${rgb.length} != 3*$width*$height")
    val stride = ((width * 3 + 3) / 4) * 4
    val imageSize = stride * height
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    putLeInt(out, 2, 54 + imageSize) // file size
    putLeInt(out, 10, 54) // pixel data offset
    putLeInt(out, 14, 40) // BITMAPINFOHEADER size
    putLeInt(out, 18, width)
    putLeInt(out, 22, height) // positive = bottom-up
    putLeShort(out, 26, 1) // planes
    putLeShort(out, 28, 24) // bits per pixel
    putLeInt(out, 30, 0) // BI_RGB, uncompressed
    putLeInt(out, 34, imageSize)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // bottom-up storage
      var x = 0
      while (x < width) {
        val s = 3 * (srcRow * width + x)
        val d = 54 + y * stride + 3 * x
        out(d) = rgb(s + 2) // B
        out(d + 1) = rgb(s + 1) // G
        out(d + 2) = rgb(s) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * Block-mean downscale by integer factors: output pixel (i, j) is the
   * per-channel FLOOR-mean of the `fx` x `fy` source block at
   * (i*fx, j*fy); edge blocks average over the pixels that exist, so
   * output dims are ceil(w/fx) x ceil(h/fy) and no source pixel is
   * dropped. All-integer arithmetic (sum / count floor division) —
   * deterministic, oracle-replayable, no float resampling kernel.
   */
  def downscaleBmp(img: Bmp, fx: Int, fy: Int): Bmp = {
    require(fx >= 1 && fy >= 1, s"scale factors ($fx, $fy) must be positive")
    val outW = (img.width + fx - 1) / fx
    val outH = (img.height + fy - 1) / fy
    val out = new Array[Byte](3 * outW * outH)
    var j = 0
    while (j < outH) {
      val r0 = j * fy
      val r1 = math.min(r0 + fy, img.height)
      var i = 0
      while (i < outW) {
        val c0 = i * fx
        val c1 = math.min(c0 + fx, img.width)
        val cnt = (r1 - r0) * (c1 - c0)
        var ch = 0
        while (ch < 3) {
          var sum = 0
          var r = r0
          while (r < r1) {
            var c = c0
            while (c < c1) {
              sum += img.rgb(3 * (r * img.width + c) + ch) & 0xff
              c += 1
            }
            r += 1
          }
          out(3 * (j * outW + i) + ch) = (sum / cnt).toByte
          ch += 1
        }
        i += 1
      }
      j += 1
    }
    Bmp(outW, outH, out)
  }

  /** Horizontal mirror: out pixel (r, c) = in pixel (r, w-1-c), channel
    * order preserved within each pixel — the cheapest image augmentation
    * (label-preserving for most vision tasks). One linear pass. */
  def flipBmpHorizontal(img: Bmp): Bmp = {
    val out = new Array[Byte](img.rgb.length)
    var r = 0
    while (r < img.height) {
      var c = 0
      while (c < img.width) {
        val src = 3 * (r * img.width + (img.width - 1 - c))
        val dst = 3 * (r * img.width + c)
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        c += 1
      }
      r += 1
    }
    Bmp(img.width, img.height, out)
  }

  /** Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER or any longer
    * DIB header): validates magic/offsets, honors bottom-up (positive
    * height) and top-down (negative) row order, strips row padding. */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M',
      s"not BMP: magic ${ascii(bytes, 0, 2)}")
    val dataOffset = leInt(bytes, 10)
    val dibSize = leInt(bytes, 14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize (need BITMAPINFOHEADER+)")
    val width = leInt(bytes, 18)
    val rawHeight = leInt(bytes, 22)
    val bpp = leShort(bytes, 28)
    val compression = leInt(bytes, 30)
    require(width > 0, s"BMP width $width must be positive")
    require(rawHeight != 0, "BMP height must be non-zero")
    require(bpp == 24, s"unsupported BMP bit depth $bpp (only 24)")
    require(compression == 0, s"unsupported BMP compression $compression (only BI_RGB)")
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride = ((width * 3 + 3) / 4) * 4
    require(dataOffset >= 54 && dataOffset.toLong + stride.toLong * height <= bytes.length,
      s"BMP pixel data ($dataOffset + $stride*$height) exceeds payload ${bytes.length}")
    val rgb = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var x = 0
      while (x < width) {
        val s = dataOffset + srcRow * stride + 3 * x
        val d = 3 * (y * width + x)
        rgb(d) = bytes(s + 2) // R
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s) // B
        x += 1
      }
      y += 1
    }
    Bmp(width, height, rgb)
  }

  // ------------------------------------------------------------------ PPM

  /** Encode a top-down RGB buffer as binary Netpbm P6 with maxval 255. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"dimensions ${width}x$height must be positive")
    require(rgb.length == 3 * width * height,
      s"rgb buffer ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse binary Netpbm P6: ASCII header tokens (whitespace-separated,
    * `#` comments to end-of-line), exactly one whitespace byte after
    * maxval, then 3*width*height binary RGB bytes. */
  def decodePpm(bytes: Array[Byte]): Bmp = decodePpmAt(bytes, 0)._1

  /**
   * Parse one P6 frame starting at byte `off` inside a concatenated-frames
   * container (the "video" layout: P6 frames back to back) and return the
   * frame plus the byte count consumed (header + pixels), so callers can
   * walk frame boundaries without assuming a fixed header width — the
   * header length varies with the decimal digits of width/height, which is
   * exactly what makes the walk REAL container parsing rather than
   * fixed-stride slicing.
   */
  def decodePpmAt(bytes: Array[Byte], off: Int): (Bmp, Int) = {
    require(off + 2 <= bytes.length && bytes(off) == 'P' && bytes(off + 1) == '6',
      s"not PPM P6 at offset $off: magic ${ascii(bytes, off, math.min(2, bytes.length - off))}")
    var pos = off + 2
    def nextToken(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      require(pos > start, s"PPM header truncated at byte $start")
      val tok = ascii(bytes, start, pos - start)
      try tok.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"PPM header token '$tok' is not a number")
      }
    }
    val width = nextToken()
    val height = nextToken()
    val maxval = nextToken()
    require(width > 0 && height > 0, s"PPM dimensions ${width}x$height must be positive")
    require(maxval == 255, s"unsupported PPM maxval $maxval (only 255)")
    pos += 1 // exactly one whitespace byte after maxval per the spec
    val need = 3 * width * height
    require(pos + need <= bytes.length,
      s"PPM pixel data truncated: need $need bytes at $pos, have ${bytes.length}")
    (Bmp(width, height, java.util.Arrays.copyOfRange(bytes, pos, pos + need)),
      pos + need - off)
  }

  // ------------------------------------------------------------------ PNG

  /** Decoded PNG image: `channels` is 1 (grayscale), 2 (gray+alpha),
    * 3 (RGB — including palette images, which decode expanded through
    * their PLTE) or 4 (RGBA); `pix` is top-down row-major
    * channel-interleaved bytes (`channels * width * height`), filters
    * reversed. */
  final case class Png(width: Int, height: Int, channels: Int, pix: Array[Byte])

  /** PNG's 8-byte file signature. */
  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /**
   * Encode 8-bit pixels as a real PNG — `channels` selects the color
   * type: 1 = grayscale (0), 2 = gray+alpha (4), 3 = RGB (2),
   * 4 = RGBA (6). Signature, IHDR, one IDAT holding the zlib-deflated
   * filtered scanlines, IEND — CRCs computed per spec. Row y uses filter
   * type `y % 5`, so every one of the five PNG filters
   * (None/Sub/Up/Average/Paeth) appears in any image of >= 5 rows and a
   * decoder that mishandles ANY filter fails round-trip immediately.
   * Deflate runs at the fixed default level — decode(encode(x)) == x is
   * the contract; the compressed byte stream itself is not.
   */
  def encodePng(width: Int, height: Int, channels: Int, pix: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"PNG dimensions ${width}x$height must be positive")
    require(channels >= 1 && channels <= 4, s"PNG channels ($channels) must be 1..4")
    require(pix.length == channels * width * height,
      s"pixel array length ${pix.length} != $channels*$width*$height")
    val bpp = channels
    val stride = width * bpp
    // filter every scanline: 1 filter-type byte + filtered row bytes
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pix(y * stride + x) & 0xff
        val a = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray
    val ihdr = new Array[Byte](13)
    putBeInt(ihdr, 0, width); putBeInt(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    // channels -> PNG color type: gray, gray+alpha, truecolor, truecolor+alpha
    ihdr(9) = (channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }).toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // compression/filter/interlace
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    writePngChunk(out, "IHDR", ihdr)
    writePngChunk(out, "IDAT", z)
    writePngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /**
   * Parse a PNG byte stream: validate the signature, walk chunks (CRC-32
   * checked on every chunk — corrupt bytes must fail the task, not decode
   * into garbage features), require 8-bit non-interlaced color type
   * 0/2/3/4/6 (grayscale, RGB, palette, gray+alpha, RGBA — the full
   * direct + indexed 8-bit family web corpora carry), inflate the
   * concatenated IDAT stream, reverse the per-row filter. Palette images
   * unfilter on their 1-byte indices (per spec) and then expand through
   * PLTE into 3-channel RGB. Ancillary chunks (tEXt, gAMA, ...) are
   * skipped like the WAV walker skips LIST.
   */
  def decodePng(bytes: Array[Byte]): Png = {
    require(bytes.length >= 8 && (0 until 8).forall(i => (bytes(i) & 0xff) == PngSig(i)),
      s"not PNG: signature ${bytes.take(8).map(b => f"${b & 0xff}%02x").mkString(" ")}")
    var pos = 8
    var header: Option[(Int, Int, Int)] = None // (width, height, colorType)
    var palette: Option[Array[Byte]] = None
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && pos + 8 <= bytes.length) {
      val len = beInt(bytes, pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"PNG chunk at $pos claims $len bytes beyond the payload end")
      val ctype = ascii(bytes, pos + 4, 4)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      val stored = beInt(bytes, pos + 8 + len) & 0xffffffffL
      require(crc.getValue == stored,
        f"PNG chunk '$ctype' CRC mismatch: computed ${crc.getValue}%08x stored $stored%08x")
      ctype match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          val w = beInt(bytes, pos + 8)
          val h = beInt(bytes, pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(w > 0 && h > 0, s"PNG dimensions ${w}x$h must be positive")
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth (only 8)")
          require(Set(0, 2, 3, 4, 6).contains(colorType),
            s"unsupported PNG color type $colorType (only 0/2/3/4/6)")
          require(interlace == 0, s"unsupported PNG interlace $interlace (only none)")
          header = Some((w, h, colorType))
        case "PLTE" =>
          require(len > 0 && len % 3 == 0 && len <= 768,
            s"PLTE length $len is not a 1..256-entry RGB table")
          palette = Some(java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len))
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => ended = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    val (width, height, colorType) = header.getOrElse(
      throw new IllegalArgumentException("PNG has no IHDR chunk"))
    require(idat.size() > 0, "PNG has no IDAT data")
    // bytes per pixel IN THE FILTERED STREAM: palette rows filter on their
    // 1-byte indices (spec §9.2) and expand only after reconstruction
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // overflow guard BEFORE any sizing arithmetic: a hostile header like
    // 65536x65536 RGBA wraps Int in height*(1+stride) — fail with the real
    // reason, not a NegativeArraySizeException three lines later
    require(height.toLong * (1L + width.toLong * bpp) <= Int.MaxValue - 8,
      s"PNG ${width}x$height bpp=$bpp exceeds the decodable size bound")
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(),
          "PNG IDAT stream stalled (truncated or needs dictionary)")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"PNG IDAT is not valid zlib: ${e.getMessage}")
    } finally inflater.end()
    require(got == raw.length,
      s"PNG IDAT inflates to $got bytes, expected ${raw.length} (${height} rows x ${1 + stride})")
    // reverse per-row filters in place into the output pixel array
    val pix = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"PNG row $y has invalid filter type $ft")
      var x = 0
      while (x < stride) {
        val f = raw(y * (1 + stride) + 1 + x) & 0xff
        val a = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        pix(y * stride + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (colorType == 3) {
      // palette expansion AFTER reconstruction: each index becomes its
      // PLTE RGB triple; out-of-range indices fail loudly (a silent
      // clamp would fabricate pixel values)
      val plte = palette.getOrElse(
        throw new IllegalArgumentException("palette PNG has no PLTE chunk"))
      val nEntries = plte.length / 3
      val out = new Array[Byte](3 * width * height)
      var i = 0
      while (i < pix.length) {
        val idx = pix(i) & 0xff
        require(idx < nEntries,
          s"PNG palette index $idx out of range (palette has $nEntries entries)")
        out(3 * i) = plte(3 * idx)
        out(3 * i + 1) = plte(3 * idx + 1)
        out(3 * i + 2) = plte(3 * idx + 2)
        i += 1
      }
      Png(width, height, 3, out)
    } else Png(width, height, bpp, pix)
  }

  // ------------------------------------------------------------------ GIF

  /** Decoded GIF frame: `indices` is top-down row-major palette indices
    * (width * height, deinterlaced if the file was interlaced), `palette`
    * is the active color table's RGB bytes (3 * entries). */
  final case class Gif(width: Int, height: Int, indices: Array[Byte], palette: Array[Byte]) {
    /** Palette lookup: channel `ch` (0=R,1=G,2=B) of pixel `i`, 0..255. */
    def channel(i: Int, ch: Int): Int = palette(3 * (indices(i) & 0xff) + ch) & 0xff
  }

  /**
   * Encode palette indices as a real single-frame GIF89a: header, logical
   * screen descriptor, global color table, image descriptor, variable-width
   * LZW-compressed index stream in <=255-byte sub-blocks, trailer. The LZW
   * layer is the whole point — GIF is the only mainstream image container
   * whose compression (12-bit-capped variable-width LZW, LSB-first bit
   * packing, clear/EOI codes, dictionary reset at 4096) is decodable with
   * zero dependencies, and a one-bit slip in the width-change schedule
   * corrupts every pixel after it. `palette` must be a power-of-two entry
   * count (2..256 RGB triples); every index must be in range.
   */
  def encodeGif(width: Int, height: Int, indices: Array[Byte], palette: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"GIF dimensions ${width}x$height must be positive")
    require(width <= 0xffff && height <= 0xffff,
      s"GIF dimensions ${width}x$height exceed the 16-bit field")
    require(indices.length == width * height,
      s"index array length ${indices.length} != $width*$height")
    require(palette.length % 3 == 0 && palette.length >= 6 && palette.length <= 768,
      s"palette byte length ${palette.length} is not 2..256 RGB triples")
    val entries = palette.length / 3
    require((entries & (entries - 1)) == 0,
      s"GIF color table must have a power-of-two entry count, got $entries")
    val tableBits = 31 - Integer.numberOfLeadingZeros(entries) // log2(entries)
    var i = 0
    while (i < indices.length) {
      require((indices(i) & 0xff) < entries,
        s"palette index ${indices(i) & 0xff} at $i out of range (palette has $entries entries)")
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: dims, GCT flag + color resolution + size
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0x80 | ((tableBits - 1) << 4) | (tableBits - 1)) // GCT present
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    out.write(palette, 0, palette.length)
    // image descriptor: full-screen, no local table, not interlaced
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0)
    val minCode = math.max(2, tableBits) // GIF floors the LZW root size at 2
    out.write(minCode)
    writeGifSubBlocks(out, lzwEncode(indices, minCode))
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /**
   * Parse a GIF87a/89a byte stream: logical screen + global color table,
   * skip extension blocks (0x21: label + sub-blocks — GCE, comments,
   * application extensions), decode the FIRST image descriptor's LZW index
   * stream (honoring a local color table and the four-pass interlace row
   * order when flagged). Truncation, bad magic, out-of-range codes, and an
   * index stream that over/under-fills the frame all fail loudly.
   */
  def decodeGif(bytes: Array[Byte]): Gif = {
    require(bytes.length >= 13, s"GIF too short: ${bytes.length} bytes")
    val magic = ascii(bytes, 0, 6)
    require(magic == "GIF89a" || magic == "GIF87a", s"not GIF: magic $magic")
    val globalW = leShort(bytes, 6)
    val globalH = leShort(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13
    var globalPalette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 0x07) + 1))
      require(pos + n <= bytes.length, s"GIF global color table truncated at $pos")
      globalPalette = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 terminator
          pos += 2
          while ({
            require(pos < bytes.length, "GIF extension truncated")
            val n = bytes(pos) & 0xff
            pos += 1 + n
            n != 0
          }) ()
        case 0x2c => // image descriptor
          require(pos + 10 <= bytes.length, s"GIF image descriptor truncated at $pos")
          val w = leShort(bytes, pos + 5)
          val h = leShort(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var palette = globalPalette
          if ((ipacked & 0x80) != 0) { // local color table wins
            val n = 3 * (1 << ((ipacked & 0x07) + 1))
            require(pos + n <= bytes.length, s"GIF local color table truncated at $pos")
            palette = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          require(palette != null, "GIF image has neither global nor local color table")
          require(w > 0 && h > 0, s"GIF frame dimensions ${w}x$h must be positive")
          require(pos < bytes.length, "GIF LZW min code size missing")
          val minCode = bytes(pos) & 0xff
          require(minCode >= 2 && minCode <= 8, s"GIF LZW min code size $minCode out of 2..8")
          pos += 1
          // assemble the sub-block data, then LZW-decode it
          val data = new java.io.ByteArrayOutputStream()
          while ({
            require(pos < bytes.length, "GIF image data truncated")
            val n = bytes(pos) & 0xff
            require(pos + 1 + n <= bytes.length, s"GIF sub-block at $pos truncated")
            data.write(bytes, pos + 1, n)
            pos += 1 + n
            n != 0
          }) ()
          val flat = lzwDecode(data.toByteArray, minCode, w * h)
          val indices =
            if (!interlaced) flat
            else { // four-pass interlace: rows 0,8,16.. / 4,12.. / 2,6.. / 1,3..
              val outIdx = new Array[Byte](w * h)
              var src = 0
              var pass = 0
              val starts = Array(0, 4, 2, 1)
              val steps = Array(8, 8, 4, 2)
              while (pass < 4) {
                var y = starts(pass)
                while (y < h) {
                  System.arraycopy(flat, src, outIdx, y * w, w)
                  src += w
                  y += steps(pass)
                }
                pass += 1
              }
              outIdx
            }
          val entries = palette.length / 3
          var i = 0
          while (i < indices.length) {
            require((indices(i) & 0xff) < entries,
              s"GIF pixel $i index ${indices(i) & 0xff} out of palette range $entries")
            i += 1
          }
          return Gif(w, h, indices, palette)
        case 0x3b =>
          throw new IllegalArgumentException("GIF trailer reached before any image frame")
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02x at $pos")
      }
    }
    throw new IllegalArgumentException(
      s"GIF ended without an image frame (screen ${globalW}x$globalH)")
  }

  /**
   * GIF-flavor LZW compression of a symbol stream. Codes are emitted
   * LSB-first at a width that starts at `minCode`+1 bits and grows to a
   * 12-bit cap; the dictionary seeds with the 2^minCode root codes plus
   * CLEAR and EOI, and is reset via an explicit CLEAR whenever it would
   * outgrow 4096 entries. The width-change schedule is the decoder-derived
   * one: a code is written with exactly the bits the decoder needs for the
   * largest value it could legally receive at that point (its `next` table
   * slot — the KwKwK case), which is what keeps encoder and decoder widths
   * in lockstep without any out-of-band signaling.
   */
  private def lzwEncode(symbols: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    // dictionary: (prefix code, next symbol) -> code, keyed prefix<<8|symbol
    var dict = new scala.collection.mutable.LongMap[Int]()
    var next = eoi + 1
    put(clear)
    var cur = symbols(0) & 0xff
    var i = 1
    while (i < symbols.length) {
      val k = symbols(i) & 0xff
      val key = (cur.toLong << 8) | k
      dict.get(key) match {
        case Some(code) => cur = code
        case None =>
          put(cur)
          if (next == 4096) { // table full: reset (the decoder mirrors this)
            put(clear)
            dict = new scala.collection.mutable.LongMap[Int]()
            next = eoi + 1
            codeSize = minCode + 1
          } else {
            dict.update(key, next)
            next += 1
            // decoder's widest legal next read is value `next` (KwKwK)
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          cur = k
      }
      i += 1
    }
    put(cur)
    // The decoder adds one more dictionary entry when it reads this final
    // data code (unless it is the first code after a clear, when it has no
    // prev to pair) — if that entry lands exactly on 2^codeSize it widens
    // before reading EOI, so EOI must be written at the widened size too.
    if (next > eoi + 1 && next == (1 << codeSize) && codeSize < 12) codeSize += 1
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-flavor LZW decompression: the exact mirror of [[lzwEncode]] —
    * LSB-first reads, width grows when the next table slot would need an
    * extra bit, KwKwK handled, CLEAR resets, EOI ends. Exactly `expect`
    * symbols must come out. */
  private def lzwDecode(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expect)
    var produced = 0
    var acc = 0L
    var nbits = 0
    var pos = 0
    var codeSize = minCode + 1
    // dictionary as prefix-linked strings: code -> (prefix code, last byte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val strBuf = new Array[Byte](4096)
    var next = eoi + 1
    var prev = -1
    def emit(code: Int): Int = { // writes code's string, returns first byte
      var c = code
      var n = 0
      while (c >= clear) { strBuf(n) = suffix(c); n += 1; c = prefix(c) }
      val first = c
      require(produced + n + 1 <= expect,
        s"GIF LZW produced more than the expected $expect pixels")
      out(produced) = first.toByte
      produced += 1
      var j = n - 1
      while (j >= 0) { out(produced) = strBuf(j); produced += 1; j -= 1 }
      first
    }
    var done = false
    while (!done) {
      while (nbits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8
        pos += 1
      }
      require(nbits >= codeSize, s"GIF LZW stream truncated at bit ${8 * pos}")
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        next = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        require(code < clear, s"GIF LZW first code $code after clear is not a root")
        require(produced < expect, s"GIF LZW produced more than the expected $expect pixels")
        out(produced) = code.toByte
        produced += 1
        prev = code
      } else {
        require(code <= next && code < 4096,
          s"GIF LZW code $code out of range (table has $next entries)")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: the new string is string(prev) + first(string(prev))
            val f = emit(prev)
            require(produced < expect,
              s"GIF LZW produced more than the expected $expect pixels")
            out(produced) = f.toByte
            produced += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first.toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(produced == expect,
      s"GIF LZW produced $produced pixels, expected $expect")
    out
  }

  private def writeGifSubBlocks(out: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
  }

  /** The Paeth predictor (PNG spec §9.4): nearest of a (left), b (up),
    * c (up-left) to a + b - c, ties a > b > c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writePngChunk(
      out: java.io.ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4); putBeInt(lenB, 0, data.length); out.write(lenB, 0, 4)
    val typeB = ctype.getBytes("US-ASCII"); out.write(typeB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(typeB); crc.update(data)
    val crcB = new Array[Byte](4); putBeInt(crcB, 0, crc.getValue.toInt); out.write(crcB, 0, 4)
  }

  // ------------------------------------------------------- byte utilities

  private def putBeInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >>> 24) & 0xff).toByte
    out(off + 1) = ((v >>> 16) & 0xff).toByte
    out(off + 2) = ((v >>> 8) & 0xff).toByte
    out(off + 3) = (v & 0xff).toByte
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  // -------------------------------------------------------------- JPEG

  final case class Jpeg(width: Int, height: Int, rgb: Array[Byte])

  /** Zigzag scan order: zigzag index -> natural (row-major) index. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: idctCos(u)(x) = C(u) * cos((2x + 1) * u * pi / 16),
    * C(0) = 1/sqrt(2) else 1 — StrictMath for cross-JVM determinism. */
  private val JpegIdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** Canonical Huffman decode table from the DHT BITS/HUFFVAL lists. */
  private final class JpegHuff(bits: Array[Int], vals: Array[Byte]) {
    // minCode/maxCode/valPtr per code length (1-16) — the standard
    // canonical-code decode structure (JPEG spec F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        if (bits(l - 1) > 0) {
          k += bits(l - 1)
          code += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int = {
      require(len <= 16 && has(len, code),
        s"JPEG: invalid Huffman code (len $len)")
      vals(valPtr(len) + (code - minCode(len))) & 0xff
    }
    def has(len: Int, code: Int): Boolean =
      maxCode(len) >= 0 && code >= minCode(len) && code <= maxCode(len)
  }

  /** Dequantize one ZIGZAG-ordered quantized coefficient block (`coefs`
    * from `off`, 64 entries) with table `q` and IDCT into natural-order
    * level-shifted clamped pixels in `blk` — shared by the baseline
    * per-block decode and the progressive at-EOI finisher. DC-only
    * blocks short-circuit to the (bit-identical) DC term. */
  private def jpegIdctBlock(
      coefs: Array[Int], off: Int, q: Array[Int], blk: Array[Int]): Unit = {
    val f = new Array[Double](64)
    var anyAc = false
    var z = 0
    while (z < 64) {
      f(JpegZigzag(z)) = (coefs(off + z) * q(z)).toDouble
      if (z > 0 && coefs(off + z) != 0) anyAc = true
      z += 1
    }
    if (!anyAc) {
      // DC-only block: every AC term of the IDCT sum is exactly 0.0, so
      // the full loop reduces BIT-IDENTICALLY to the DC term — C(0)^2/4
      // * F00 — flat-filled (the dominant case in flat regions; ~64x
      // less arithmetic per block)
      val sum = JpegIdctCos(0)(0) * JpegIdctCos(0)(0) * f(0)
      val px0 = StrictMath.round(sum / 4.0 + 128.0).toInt
      val px = if (px0 < 0) 0 else if (px0 > 255) 255 else px0
      java.util.Arrays.fill(blk, px)
    } else {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              sum += JpegIdctCos(v)(y) * JpegIdctCos(u)(x) * f(v * 8 + u)
              v += 1
            }
            u += 1
          }
          val px = StrictMath.round(sum / 4.0 + 128.0).toInt
          blk(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
          x += 1
        }
        y += 1
      }
    }
  }

  /**
   * Baseline-sequential JPEG decode (SOF0: 8-bit Huffman DCT, the format
   * the overwhelming majority of web images use): marker walk (APPn/COM
   * skipped, DQT 8-bit tables, DHT canonical tables, DRI restart
   * interval), interleaved MCU scan with per-component DC prediction and
   * RSTn handling (predictor reset + byte realign), FF00 byte
   * unstuffing, dequantize + dezigzag, naive double IDCT (StrictMath —
   * deterministic across JVMs), level shift, sample-replication chroma
   * upsampling for any h/v factors, and JFIF YCbCr -> RGB (1-component
   * images replicate Y). PROGRESSIVE (SOF2) decodes too — the format the
   * majority of large web JPEGs use: spectral selection (interleaved or
   * single-component DC scans, single-component AC band scans) and
   * successive approximation (DC bit refinement; the G.1.2.3 AC
   * correction-bit algorithm with EOB runs), coefficients accumulated
   * across scans and IDCT'd once at EOI. Every other frame type fails
   * loudly — skip-corrupt belongs to the CALLER's dispatch, a
   * half-decoded image must never become features. Output rows are
   * row-major RGB triplets.
   */
  def decodeJpeg(bytes: Array[Byte]): Jpeg = {
    def u8(i: Int): Int = {
      require(i < bytes.length, s"JPEG: unexpected end of input at byte $i")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(bytes.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8,
      s"not JPEG: magic ${bytes.take(2).map(b => f"${b & 0xff}%02x").mkString(" ")}")

    var i = 2
    // entropy bit reader (FF00 unstuffing) — shared by the baseline scan
    // and every progressive scan; reset (bitCnt = 0) at each scan start
    // and at restart markers
    var bitBuf = 0
    var bitCnt = 0
    def nextBit(): Int = {
      if (bitCnt == 0) {
        var b = u8(i); i += 1
        if (b == 0xff) {
          val b2 = u8(i); i += 1
          require(b2 == 0x00,
            f"JPEG: marker FF$b2%02x inside entropy data (truncated scan?)")
          b = 0xff
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | nextBit(); k += 1 }
      v
    }
    def extend(v: Int, t: Int): Int =
      if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
    def decodeHuff(tab: JpegHuff): Int = {
      var code = nextBit()
      var len = 1
      while (!tab.has(len, code)) {
        code = (code << 1) | nextBit()
        len += 1
        require(len <= 16, "JPEG: Huffman code longer than 16 bits")
      }
      tab.symbol(len, code)
    }

    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var dri = 0
    // frame state
    var width = 0
    var height = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    var planes: Array[Array[Int]] = null
    var planeW: Array[Int] = null
    var planeH: Array[Int] = null
    var sawFrame = false
    var sawScan = false
    // progressive (SOF2) state: coefficients ACCUMULATE across scans in
    // zigzag order per block; IDCT runs once at EOI
    var progressive = false
    var coefArr: Array[Array[Int]] = null // per comp: padded block grid * 64
    var blocksW: Array[Int] = null // padded grid width in blocks (mcusX * h)
    var blocksH: Array[Int] = null
    var cBlocksX: Array[Int] = null // the comp's OWN block dims (non-interleaved scans)
    var cBlocksY: Array[Int] = null

    var done = false
    while (!done) {
      // marker: skip fill bytes (FF FF ... xx)
      require(u8(i) == 0xff, f"JPEG: expected marker at byte $i, got ${u8(i)}%02x")
      while (u8(i + 1) == 0xff) i += 1
      val marker = u8(i + 1)
      i += 2
      marker match {
        case 0xd9 => // EOI
          done = true
        case 0xdb => // DQT
          val end = i + u16(i)
          var p = i + 2
          while (p < end) {
            val pq = u8(p) >> 4
            val tq = u8(p) & 0x0f
            require(pq == 0, s"JPEG: only 8-bit quant tables supported (Pq $pq)")
            require(tq < 4, s"JPEG: quant table id $tq out of range")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(k) = u8(p + 1 + k); k += 1 }
            quant(tq) = t
            p += 65
          }
          i = end
        case 0xc4 => // DHT
          val end = i + u16(i)
          var p = i + 2
          while (p < end) {
            val tc = u8(p) >> 4
            val th = u8(p) & 0x0f
            require(tc <= 1 && th < 4, s"JPEG: bad Huffman table class/id ($tc, $th)")
            val bits = new Array[Int](16)
            var total = 0
            var k = 0
            while (k < 16) { bits(k) = u8(p + 1 + k); total += bits(k); k += 1 }
            val vals = new Array[Byte](total)
            k = 0
            while (k < total) { vals(k) = bytes(p + 17 + k); k += 1 }
            val tab = new JpegHuff(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            p += 17 + total
          }
          i = end
        case 0xdd => // DRI
          dri = u16(i + 2)
          i += u16(i)
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          require(!sawFrame, "JPEG: multiple frame headers")
          sawFrame = true
          progressive = marker == 0xc2
          require(u8(i + 2) == 8, s"JPEG: only 8-bit precision supported (${u8(i + 2)})")
          height = u16(i + 3)
          width = u16(i + 5)
          nComp = u8(i + 7)
          require(width > 0 && height > 0, s"JPEG: bad dimensions ${width}x$height")
          require(nComp == 1 || nComp == 3, s"JPEG: $nComp components unsupported")
          compId = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compTq = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = u8(i + 8 + 3 * c)
            compH(c) = u8(i + 9 + 3 * c) >> 4
            compV(c) = u8(i + 9 + 3 * c) & 0x0f
            compTq(c) = u8(i + 10 + 3 * c)
            require(compH(c) >= 1 && compH(c) <= 4 && compV(c) >= 1 && compV(c) <= 4,
              s"JPEG: bad sampling factors ${compH(c)}x${compV(c)}")
            c += 1
          }
          if (progressive) {
            // coefficient planes: padded MCU block grid per component
            // (interleaved DC scans walk the padding too); AC scans walk
            // only the component's own ceil-dims
            val hMax = compH.max
            val vMax = compV.max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            blocksW = Array.tabulate(nComp)(c0 => mcusX * compH(c0))
            blocksH = Array.tabulate(nComp)(c0 => mcusY * compV(c0))
            cBlocksX = Array.tabulate(nComp)(c0 =>
              ((width * compH(c0) + hMax - 1) / hMax + 7) / 8)
            cBlocksY = Array.tabulate(nComp)(c0 =>
              ((height * compV(c0) + vMax - 1) / vMax + 7) / 8)
            coefArr = Array.tabulate(nComp)(c0 =>
              new Array[Int](blocksW(c0) * blocksH(c0) * 64))
            planeW = Array.tabulate(nComp)(c0 => blocksW(c0) * 8)
            planeH = Array.tabulate(nComp)(c0 => blocksH(c0) * 8)
            planes = Array.tabulate(nComp)(c0 => new Array[Int](planeW(c0) * planeH(c0)))
          }
          i += u16(i)
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          throw new IllegalArgumentException(
            f"JPEG: frame type SOF${m - 0xc0} unsupported (baseline SOF0 and progressive SOF2 only)")
        case 0xda if progressive => // SOS (progressive: one of many scans)
          require(sawFrame, "JPEG: scan before frame header")
          sawScan = true
          val ns = u8(i + 2)
          require(ns >= 1 && ns <= nComp,
            s"JPEG: progressive scan names $ns components (frame has $nComp)")
          val scomp = new Array[Int](ns)
          val sdc = new Array[JpegHuff](ns)
          val sac = new Array[JpegHuff](ns)
          var c = 0
          while (c < ns) {
            val cs = u8(i + 3 + 2 * c)
            val idx = compId.indexOf(cs)
            require(idx >= 0, s"JPEG: scan names unknown component $cs")
            scomp(c) = idx
            sdc(c) = dcTabs(u8(i + 4 + 2 * c) >> 4)
            sac(c) = acTabs(u8(i + 4 + 2 * c) & 0x0f)
            c += 1
          }
          val ss = u8(i + 3 + 2 * ns)
          val se = u8(i + 4 + 2 * ns)
          val ah = u8(i + 5 + 2 * ns) >> 4
          val al = u8(i + 5 + 2 * ns) & 0x0f
          require(al <= 13 && ah <= 13, s"JPEG: successive approximation $ah/$al out of range")
          i += u16(i)
          bitBuf = 0; bitCnt = 0
          var eobrun = 0
          var rstIdx = 0
          var unit = 0 // MCU (interleaved) or block (single-comp) counter
          def restartCheck(): Unit = {
            if (dri > 0 && unit > 0 && unit % dri == 0) {
              bitCnt = 0
              require(u8(i) == 0xff && u8(i + 1) == 0xd0 + rstIdx,
                f"JPEG: expected RST$rstIdx at byte $i")
              i += 2
              rstIdx = (rstIdx + 1) % 8
              eobrun = 0
            }
          }
          if (ss == 0) {
            // ---- DC scan (first or refinement); interleaved when ns > 1
            require(se == 0,
              "JPEG: progressive DC scan must have Se = 0 (no combined DC+AC scans)")
            if (ah == 0) (0 until ns).foreach(ci => require(sdc(ci) != null,
              "JPEG: DC scan references undefined Huffman table"))
            val pred = new Array[Int](ns)
            def dcBlock(ci: Int, base: Int): Unit = {
              val arr = coefArr(scomp(ci))
              if (ah == 0) {
                val t = decodeHuff(sdc(ci))
                require(t <= 11, s"JPEG: DC category $t out of range")
                pred(ci) += extend(receive(t), t)
                arr(base) = pred(ci) << al
              } else if (nextBit() == 1) {
                arr(base) |= (1 << al)
              }
            }
            if (ns == 1) {
              val c0 = scomp(0)
              val total = cBlocksX(c0) * cBlocksY(c0)
              while (unit < total) {
                restartCheck()
                if (dri > 0 && unit % dri == 0) java.util.Arrays.fill(pred, 0)
                val bx = unit % cBlocksX(c0)
                val by = unit / cBlocksX(c0)
                dcBlock(0, (by * blocksW(c0) + bx) * 64)
                unit += 1
              }
            } else {
              val hMax = compH.max
              val vMax = compV.max
              val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
              val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
              val nMcus = mcusX * mcusY
              while (unit < nMcus) {
                restartCheck()
                if (dri > 0 && unit % dri == 0) java.util.Arrays.fill(pred, 0)
                val mx = unit % mcusX
                val my = unit / mcusX
                var ci = 0
                while (ci < ns) {
                  val c0 = scomp(ci)
                  var v0 = 0
                  while (v0 < compV(c0)) {
                    var h0 = 0
                    while (h0 < compH(c0)) {
                      val bx = mx * compH(c0) + h0
                      val by = my * compV(c0) + v0
                      dcBlock(ci, (by * blocksW(c0) + bx) * 64)
                      h0 += 1
                    }
                    v0 += 1
                  }
                  ci += 1
                }
                unit += 1
              }
            }
          } else {
            // ---- AC scan: always single-component, over ITS block grid
            require(ns == 1, "JPEG: progressive AC scans are single-component")
            require(ss <= se && se <= 63, s"JPEG: bad spectral band $ss..$se")
            val c0 = scomp(0)
            val arr = coefArr(c0)
            val ac = sac(0)
            require(ac != null, "JPEG: AC scan references undefined Huffman table")
            val p1 = 1 << al
            def acFirst(base: Int): Unit = {
              if (eobrun > 0) { eobrun -= 1 }
              else {
                var k = ss
                var stop = false
                while (k <= se && !stop) {
                  val rs = decodeHuff(ac)
                  val r = rs >> 4
                  val s = rs & 0x0f
                  if (s == 0) {
                    if (r < 15) {
                      eobrun = (1 << r) - 1
                      if (r > 0) eobrun += receive(r)
                      stop = true
                    } else k += 16 // ZRL
                  } else {
                    k += r
                    require(k <= se, "JPEG: AC coefficient index past Se")
                    arr(base + k) = extend(receive(s), s) << al
                    k += 1
                  }
                }
              }
            }
            // refinement: the spec G.1.2.3 correction-bit walk — nonzero-
            // history coefficients read one correction bit each; a run of
            // r ZERO-history coefficients precedes each newly-significant
            // +-1; EOB runs correct the remaining nonzeros of each block
            def refineStep(idx: Int): Unit = {
              if (nextBit() == 1 && (arr(idx) & p1) == 0)
                arr(idx) += (if (arr(idx) >= 0) p1 else -p1)
            }
            def acRefine(base: Int): Unit = {
              var k = ss
              if (eobrun == 0) {
                var stop = false
                while (k <= se && !stop) {
                  val rs = decodeHuff(ac)
                  var r = rs >> 4
                  val s = rs & 0x0f
                  var newval = 0
                  if (s == 0) {
                    if (r < 15) {
                      eobrun = 1 << r
                      if (r > 0) eobrun += receive(r)
                      stop = true
                    }
                    // r == 15 (ZRL): skip 16 zero-history coefficients
                  } else {
                    require(s == 1, s"JPEG: refinement magnitude must be 1, got $s")
                    newval = if (nextBit() == 1) p1 else -p1
                  }
                  if (!stop) {
                    var placed = false
                    while (k <= se && !placed) {
                      val idx = base + k
                      if (arr(idx) != 0) refineStep(idx)
                      else if (r == 0) {
                        if (newval != 0) { arr(idx) = newval; placed = true }
                        else placed = true // ZRL's 16th zero
                      } else r -= 1
                      k += 1
                    }
                    require(placed || newval == 0,
                      "JPEG: refinement run past Se without placing its coefficient")
                  }
                }
              }
              if (eobrun > 0) {
                while (k <= se) {
                  val idx = base + k
                  if (arr(idx) != 0) refineStep(idx)
                  k += 1
                }
                eobrun -= 1
              }
            }
            val total = cBlocksX(c0) * cBlocksY(c0)
            while (unit < total) {
              restartCheck()
              val bx = unit % cBlocksX(c0)
              val by = unit / cBlocksX(c0)
              val base = (by * blocksW(c0) + bx) * 64
              if (ah == 0) acFirst(base) else acRefine(base)
              unit += 1
            }
            require(eobrun == 0, "JPEG: EOB run extends past the last block of the scan")
          }
          bitCnt = 0 // byte-align for the trailing marker

        case 0xda => // SOS (baseline: the single scan)
          require(sawFrame, "JPEG: scan before frame header")
          require(!sawScan, "JPEG: multiple scans unsupported (baseline has one)")
          sawScan = true
          val ns = u8(i + 2)
          require(ns == nComp, s"JPEG: scan components $ns != frame components $nComp")
          val scanDc = new Array[JpegHuff](nComp)
          val scanAc = new Array[JpegHuff](nComp)
          var c = 0
          while (c < ns) {
            val cs = u8(i + 3 + 2 * c)
            val idx = compId.indexOf(cs)
            require(idx >= 0, s"JPEG: scan names unknown component $cs")
            val td = u8(i + 4 + 2 * c) >> 4
            val ta = u8(i + 4 + 2 * c) & 0x0f
            scanDc(idx) = dcTabs(td)
            scanAc(idx) = acTabs(ta)
            require(scanDc(idx) != null && scanAc(idx) != null,
              s"JPEG: scan references undefined Huffman table ($td/$ta)")
            c += 1
          }
          i += u16(i)
          // --- entropy-coded scan ---
          val hMax = compH.max
          val vMax = compV.max
          val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          planeW = Array.tabulate(nComp)(c0 => mcusX * compH(c0) * 8)
          planeH = Array.tabulate(nComp)(c0 => mcusY * compV(c0) * 8)
          planes = Array.tabulate(nComp)(c0 => new Array[Int](planeW(c0) * planeH(c0)))
          c = 0
          while (c < nComp) {
            require(quant(compTq(c)) != null,
              s"JPEG: component $c references undefined quant table ${compTq(c)}")
            c += 1
          }
          bitBuf = 0
          bitCnt = 0
          val pred = new Array[Int](nComp)
          val coef = new Array[Int](64)
          val blk = new Array[Int](64)
          def decodeBlock(c0: Int): Unit = {
            java.util.Arrays.fill(coef, 0)
            val t = decodeHuff(scanDc(c0))
            require(t <= 11, s"JPEG: DC category $t out of range")
            pred(c0) += extend(receive(t), t)
            coef(0) = pred(c0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(scanAc(c0))
              val r = rs >> 4
              val ss = rs & 0x0f
              if (ss == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                require(k < 64, "JPEG: AC coefficient index past 63")
                coef(k) = extend(receive(ss), ss)
                k += 1
              }
            }
            // dequantize (zigzag-ordered) + IDCT into blk
            jpegIdctBlock(coef, 0, quant(compTq(c0)), blk)
          }
          var mcu = 0
          val nMcus = mcusX * mcusY
          var rstIdx = 0
          while (mcu < nMcus) {
            if (dri > 0 && mcu > 0 && mcu % dri == 0) {
              // restart: byte-align, expect RSTn in sequence, reset preds
              bitCnt = 0
              require(u8(i) == 0xff && u8(i + 1) == 0xd0 + rstIdx,
                f"JPEG: expected RST$rstIdx at byte $i")
              i += 2
              rstIdx = (rstIdx + 1) % 8
              java.util.Arrays.fill(pred, 0)
            }
            val mx = mcu % mcusX
            val my = mcu / mcusX
            var c0 = 0
            while (c0 < nComp) {
              var v0 = 0
              while (v0 < compV(c0)) {
                var h0 = 0
                while (h0 < compH(c0)) {
                  decodeBlock(c0)
                  val ox = (mx * compH(c0) + h0) * 8
                  val oy = (my * compV(c0) + v0) * 8
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      planes(c0)((oy + yy) * planeW(c0) + ox + xx) = blk(yy * 8 + xx)
                      xx += 1
                    }
                    yy += 1
                  }
                  h0 += 1
                }
                v0 += 1
              }
              c0 += 1
            }
            mcu += 1
          }
          // byte-align for the trailing marker
          bitCnt = 0
        case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => // APPn / COM
          i += u16(i)
        case 0x01 =>
          throw new IllegalArgumentException(
            "JPEG: unexpected TEM marker FF01 outside a scan")
        case m if m >= 0xd0 && m <= 0xd7 =>
          throw new IllegalArgumentException(
            f"JPEG: unexpected restart marker FF$m%02x outside a scan")
        case other =>
          // unknown-but-lengthed segment: skip by its declared length
          i += u16(i)
      }
    }
    require(sawScan, "JPEG: no scan data before EOI")
    if (progressive) {
      // coefficients are complete only at EOI: dequantize + IDCT every
      // block of every component into its plane (blocks the scans never
      // touched stay all-zero and render as flat 128 — the partial-
      // render semantics every progressive decoder shares)
      val blk = new Array[Int](64)
      var c0 = 0
      while (c0 < nComp) {
        val q = quant(compTq(c0))
        require(q != null,
          s"JPEG: component $c0 references undefined quant table ${compTq(c0)}")
        val arr = coefArr(c0)
        var by = 0
        while (by < blocksH(c0)) {
          var bx = 0
          while (bx < blocksW(c0)) {
            jpegIdctBlock(arr, (by * blocksW(c0) + bx) * 64, q, blk)
            val ox = bx * 8
            val oy = by * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c0)((oy + yy) * planeW(c0) + ox + xx) = blk(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c0 += 1
      }
    }
    // color convert with sample-replication upsampling
    val hMax = compH.max
    val vMax = compV.max
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (nComp == 1) {
          val g = planes(0)(y * planeW(0) + x)
          out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
        } else {
          def sample(c0: Int): Int =
            planes(c0)((y * compV(c0) / vMax) * planeW(c0) + (x * compH(c0) / hMax))
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = StrictMath.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Jpeg(width, height, out)
  }

  /** JPEG spec Annex K.3.3.1 luminance DC table (BITS, HUFFVAL 0-11). */
  private val JpegK3DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegK3DcVals: Array[Byte] =
    Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.3.2 luminance AC table — only the two symbols this
    * encoder emits, kept at their SPEC code lengths so the stream is a
    * valid subset of the standard table: EOB (0x00, 4 bits '1010') and
    * ZRL (0xF0, 11 bits). Shorter codes in the table are left unused by
    * the encoder; the decode side handles any conforming table. */
  private val JpegK5AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val JpegK5AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81.toByte, 0x91.toByte, 0xa1.toByte, 0x08,
    0x23, 0x42, 0xb1.toByte, 0xc1.toByte, 0x15, 0x52, 0xd1.toByte, 0xf0.toByte,
    0x24, 0x33, 0x62, 0x72, 0x82.toByte, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83.toByte, 0x84.toByte, 0x85.toByte, 0x86.toByte, 0x87.toByte, 0x88.toByte, 0x89.toByte,
    0x8a.toByte, 0x92.toByte, 0x93.toByte, 0x94.toByte, 0x95.toByte, 0x96.toByte, 0x97.toByte, 0x98.toByte,
    0x99.toByte, 0x9a.toByte, 0xa2.toByte, 0xa3.toByte, 0xa4.toByte, 0xa5.toByte, 0xa6.toByte, 0xa7.toByte,
    0xa8.toByte, 0xa9.toByte, 0xaa.toByte, 0xb2.toByte, 0xb3.toByte, 0xb4.toByte, 0xb5.toByte, 0xb6.toByte,
    0xb7.toByte, 0xb8.toByte, 0xb9.toByte, 0xba.toByte, 0xc2.toByte, 0xc3.toByte, 0xc4.toByte, 0xc5.toByte,
    0xc6.toByte, 0xc7.toByte, 0xc8.toByte, 0xc9.toByte, 0xca.toByte, 0xd2.toByte, 0xd3.toByte, 0xd4.toByte,
    0xd5.toByte, 0xd6.toByte, 0xd7.toByte, 0xd8.toByte, 0xd9.toByte, 0xda.toByte, 0xe1.toByte, 0xe2.toByte,
    0xe3.toByte, 0xe4.toByte, 0xe5.toByte, 0xe6.toByte, 0xe7.toByte, 0xe8.toByte, 0xe9.toByte, 0xea.toByte,
    0xf1.toByte, 0xf2.toByte, 0xf3.toByte, 0xf4.toByte, 0xf5.toByte, 0xf6.toByte, 0xf7.toByte, 0xf8.toByte,
    0xf9.toByte, 0xfa.toByte)

  /**
   * DC-ONLY baseline JPEG encoder (grayscale, 4:4:4 shape): one flat
   * 8x8 block per entry of `blockVals` (natural values -1024..1016,
   * quantized DC = v with the all-8s quant table, so the decoded block
   * is EXACTLY `v / 8 + 128` clamped — integer when v is a multiple of
   * 8). Blocks lay out row-major, `blocksWide` per row; the block count
   * must fill the rectangle. Uses the Annex K tables above — the
   * fixture generator for the decode path and the q282 oracle's
   * arithmetic ground truth. `driEvery > 0` inserts DRI + RSTn markers
   * every that many MCUs (restart handling must reset DC prediction).
   */
  def encodeJpegGrayDc(blockVals: Array[Int], blocksWide: Int, driEvery: Int = 0): Array[Byte] = {
    require(blocksWide >= 1 && blockVals.nonEmpty && blockVals.length % blocksWide == 0,
      s"blockVals (${blockVals.length}) must fill a rectangle $blocksWide wide")
    require(blockVals.forall(v => v >= -1024 && v <= 1016 && v % 8 == 0),
      "block values must be multiples of 8 in [-1024, 1016] (DC = v/8+128 exact)")
    val out = new java.io.ByteArrayOutputStream()
    def w(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def seg(marker: Int, body: Int*): Unit = {
      w(0xff, marker)
      w((body.length + 2) >> 8, (body.length + 2) & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    w(0xff, 0xd8) // SOI
    // DQT: table 0, all 8s
    seg(0xdb, (Seq(0x00) ++ Seq.fill(64)(8)): _*)
    // SOF0: 8-bit, h x w, 1 component (id 1, 1x1, quant 0)
    val h = 8 * (blockVals.length / blocksWide)
    val wdt = 8 * blocksWide
    seg(0xc0, 8, h >> 8, h & 0xff, wdt >> 8, wdt & 0xff, 1, 1, 0x11, 0)
    // DHT: DC table 0 + AC table 0 (Annex K luminance)
    seg(0xc4, (Seq(0x00) ++ JpegK3DcBits ++ JpegK3DcVals.map(_.toInt)
      ++ Seq(0x10) ++ JpegK5AcBits ++ JpegK5AcVals.map(_ & 0xff)): _*)
    if (driEvery > 0) seg(0xdd, driEvery >> 8, driEvery & 0xff)
    // SOS: 1 component, DC 0 / AC 0
    seg(0xda, 1, 1, 0x00, 0, 63, 0)
    // entropy: per block DC diff (Annex K DC codes) + EOB; FF stuffing
    var bitBuf = 0
    var bitCnt = 0
    val scan = new java.io.ByteArrayOutputStream()
    def putBits(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) {
        bitBuf = (bitBuf << 1) | ((code >> k) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          scan.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) scan.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        k -= 1
      }
    }
    def flushBits(): Unit = if (bitCnt > 0) {
      val pad = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      scan.write(pad & 0xff)
      if ((pad & 0xff) == 0xff) scan.write(0x00)
      bitBuf = 0; bitCnt = 0
    }
    // canonical DC codes from the BITS list (same construction the
    // decoder walks): category -> (code, len)
    val dcCode = new Array[(Int, Int)](12)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var c = 0
        while (c < JpegK3DcBits(l - 1)) {
          dcCode(JpegK3DcVals(k) & 0xff) = (code, l)
          code += 1; k += 1; c += 1
        }
        code <<= 1
        l += 1
      }
    }
    val eobCode = { // AC symbol 0x00 position in the canonical Annex K AC table
      var code = 0
      var k = 0
      var found: (Int, Int) = null
      var l = 1
      while (l <= 16) {
        var c = 0
        while (c < JpegK5AcBits(l - 1)) {
          if ((JpegK5AcVals(k) & 0xff) == 0x00) found = (code, l)
          code += 1; k += 1; c += 1
        }
        code <<= 1
        l += 1
      }
      found
    }
    var pred = 0
    var rstIdx = 0
    blockVals.zipWithIndex.foreach { case (v, bi) =>
      if (driEvery > 0 && bi > 0 && bi % driEvery == 0) {
        flushBits()
        scan.write(0xff); scan.write(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        pred = 0
      }
      val dcVal = v / 8 // quantized DC under the all-8s table
      var diff = dcVal - pred
      pred = dcVal
      var cat = 0
      var mag = if (diff < 0) -diff else diff
      while (mag > 0) { cat += 1; mag >>= 1 }
      val (code, len) = dcCode(cat)
      putBits(code, len)
      if (cat > 0) {
        val extra = if (diff < 0) diff + (1 << cat) - 1 else diff
        putBits(extra, cat)
      }
      putBits(eobCode._1, eobCode._2)
    }
    flushBits()
    out.write(scan.toByteArray)
    w(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** Canonical (code,len) per symbol from a DHT BITS/HUFFVAL pair — the
    * encoder-side mirror of [[JpegHuff]]'s decode structure. */
  private def jpegCanonicalCodes(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < bits(l - 1)) {
        out(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  /** Magnitude category (SSSS) of a coefficient value. */
  private def jpegCat(v: Int): Int = {
    var m = if (v < 0) -v else v
    var c = 0
    while (m > 0) { c += 1; m >>= 1 }
    c
  }

  /** FF00-stuffing entropy bit writer (1-padded flush — the spec's
    * marker-alignment fill). */
  private final class JpegBitWriter(scan: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def putBits(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) {
        buf = (buf << 1) | ((code >> k) & 1)
        cnt += 1
        if (cnt == 8) {
          scan.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) scan.write(0x00)
          buf = 0; cnt = 0
        }
        k -= 1
      }
    }
    def putSym(codes: Array[(Int, Int)], sym: Int): Unit = {
      val c = codes(sym)
      require(c != null, f"JPEG encode: symbol $sym%02x not in the table")
      putBits(c._1, c._2)
    }
    /** Extra bits of a coefficient in category `cat` (spec F.1.2.2.1). */
    def putExtra(v: Int, cat: Int): Unit =
      if (cat > 0) putBits(if (v < 0) v + (1 << cat) - 1 else v, cat)
    def flush(): Unit = if (cnt > 0) {
      val pad = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      scan.write(pad & 0xff)
      if ((pad & 0xff) == 0xff) scan.write(0x00)
      buf = 0; cnt = 0
    }
    /** Byte-align and emit RSTn (restart markers ride unstuffed). */
    def restart(n: Int): Unit = {
      flush()
      scan.write(0xff)
      scan.write(0xd0 + (n % 8))
    }
  }

  /** AC table for the PROGRESSIVE encoder's scans: the Annex K tables
    * carry no EOB-run symbols (EOBn = n<<4, n >= 1 — baseline never
    * emits them), so progressive scans use this flat 8-bit canonical
    * table over every symbol they can emit: EOB0..EOB14, ZRL, and
    * (run,size) for run 0-15 / size 1-10 (176 symbols, all length 8 —
    * valid canonical: 176 <= 2^8). */
  private val JpegProgAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegProgAcVals: Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    (0 to 14).foreach(n => buf += (n << 4).toByte)
    buf += 0xf0.toByte
    for (r <- 0 to 15; s <- 1 to 10) buf += ((r << 4) | s).toByte
    buf.toArray
  }

  /**
   * General BASELINE grayscale encoder over QUANTIZED zigzag-ordered
   * 64-coefficient blocks (all-8s quant table, Annex K tables): DC diff
   * coding + the full (run,size) AC grammar with ZRL and EOB. The
   * coefficient-level twin of [[encodeJpegProgressive]] — encoding the
   * SAME blocks both ways must decode to identical pixels, which is the
   * progressive decoder's ground-truth test.
   */
  def encodeJpegGrayCoefs(blocks: Array[Array[Int]], blocksWide: Int): Array[Byte] = {
    require(blocksWide >= 1 && blocks.nonEmpty && blocks.length % blocksWide == 0,
      s"blocks (${blocks.length}) must fill a rectangle $blocksWide wide")
    require(blocks.forall(_.length == 64), "each block carries 64 zigzag coefficients")
    val out = new java.io.ByteArrayOutputStream()
    def w(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def seg(marker: Int, body: Int*): Unit = {
      w(0xff, marker)
      w((body.length + 2) >> 8, (body.length + 2) & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    w(0xff, 0xd8)
    seg(0xdb, (Seq(0x00) ++ Seq.fill(64)(8)): _*)
    val h = 8 * (blocks.length / blocksWide)
    val wdt = 8 * blocksWide
    seg(0xc0, 8, h >> 8, h & 0xff, wdt >> 8, wdt & 0xff, 1, 1, 0x11, 0)
    seg(0xc4, (Seq(0x00) ++ JpegK3DcBits ++ JpegK3DcVals.map(_.toInt)
      ++ Seq(0x10) ++ JpegK5AcBits ++ JpegK5AcVals.map(_ & 0xff)): _*)
    seg(0xda, 1, 1, 0x00, 0, 63, 0)
    val dcCodes = jpegCanonicalCodes(JpegK3DcBits, JpegK3DcVals)
    val acCodes = jpegCanonicalCodes(JpegK5AcBits, JpegK5AcVals)
    val scan = new java.io.ByteArrayOutputStream()
    val bw = new JpegBitWriter(scan)
    var pred = 0
    blocks.foreach { b =>
      val diff = b(0) - pred
      pred = b(0)
      val cat = jpegCat(diff)
      require(cat <= 11, s"JPEG encode: DC diff $diff out of range")
      bw.putSym(dcCodes, cat)
      bw.putExtra(diff, cat)
      var k = 1
      var r = 0
      while (k < 64) {
        if (b(k) == 0) r += 1
        else {
          while (r > 15) { bw.putSym(acCodes, 0xf0); r -= 16 }
          val s = jpegCat(b(k))
          require(s <= 10, s"JPEG encode: AC coefficient ${b(k)} out of range")
          bw.putSym(acCodes, (r << 4) | s)
          bw.putExtra(b(k), s)
          r = 0
        }
        k += 1
      }
      if (r > 0) bw.putSym(acCodes, 0x00) // EOB
    }
    bw.flush()
    out.write(scan.toByteArray)
    w(0xff, 0xd9)
    out.toByteArray
  }

  /**
   * PROGRESSIVE (SOF2) encoder over QUANTIZED zigzag-ordered coefficient
   * blocks, grayscale or multi-component with sampling factors. Scan
   * script (the classic spectral-selection + successive-approximation
   * ladder):
   *
   *   1. DC first, ALL components interleaved (Ah=0, Al=dcAl)
   *   2. dcAl refinement DC scans (Al = dcAl-1 .. 0, one bit per block)
   *   3. per component: AC first (Ss=1, Se=63, Ah=0, Al=acAl) with
   *      EOB-run coding, then acAl refinement AC scans (the G.1.2.3
   *      correction-bit algorithm with buffered bits and EOB runs)
   *
   * `comps`: per component `(h, v, blocks)` with blocks in PADDED
   * MCU-grid raster order (mcusX*h across, mcusY*v down — the caller
   * pads edge blocks), each 64 zigzag coefficients quantized under the
   * all-8s table this encoder writes. Produces exactly the pixels of
   * the baseline encoding of the same blocks.
   */
  def encodeJpegProgressive(
      width: Int,
      height: Int,
      comps: Array[(Int, Int, Array[Array[Int]])],
      dcAl: Int = 1,
      acAl: Int = 1,
      driEvery: Int = 0): Array[Byte] = {
    require(comps.length == 1 || comps.length == 3,
      s"JPEG encode: ${comps.length} components unsupported")
    require(dcAl >= 0 && acAl >= 0, "point transforms must be non-negative")
    require(driEvery >= 0, "driEvery must be non-negative")
    val nComp = comps.length
    val hMax = comps.map(_._1).max
    val vMax = comps.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.zipWithIndex.foreach { case ((h, v, blocks), c) =>
      require(h >= 1 && h <= 4 && v >= 1 && v <= 4, s"bad sampling ${h}x$v")
      require(blocks.length == mcusX * h * mcusY * v,
        s"component $c: ${blocks.length} blocks != padded grid ${mcusX * h}x${mcusY * v}")
      require(blocks.forall(_.length == 64), "each block carries 64 zigzag coefficients")
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def seg(marker: Int, body: Int*): Unit = {
      w(0xff, marker)
      w((body.length + 2) >> 8, (body.length + 2) & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    w(0xff, 0xd8)
    seg(0xdb, (Seq(0x00) ++ Seq.fill(64)(8)): _*)
    val sof = Seq(8, height >> 8, height & 0xff, width >> 8, width & 0xff, nComp) ++
      comps.zipWithIndex.flatMap { case ((h, v, _), c) => Seq(c + 1, (h << 4) | v, 0) }
    seg(0xc2, sof: _*)
    seg(0xc4, (Seq(0x00) ++ JpegK3DcBits ++ JpegK3DcVals.map(_.toInt)
      ++ Seq(0x10) ++ JpegProgAcBits ++ JpegProgAcVals.map(_ & 0xff)): _*)
    if (driEvery > 0) seg(0xdd, driEvery >> 8, driEvery & 0xff)
    val dcCodes = jpegCanonicalCodes(JpegK3DcBits, JpegK3DcVals)
    val acCodes = jpegCanonicalCodes(JpegProgAcBits, JpegProgAcVals)
    def sos(compIds: Seq[Int], tables: Int, ss: Int, se: Int, ah: Int, al: Int)(
        body: JpegBitWriter => Unit): Unit = {
      seg(0xda, (Seq(compIds.length) ++
        compIds.flatMap(c => Seq(c, tables)) ++ Seq(ss, se, (ah << 4) | al)): _*)
      val scan = new java.io.ByteArrayOutputStream()
      val bw = new JpegBitWriter(scan)
      body(bw)
      bw.flush()
      out.write(scan.toByteArray)
    }
    // ---- scan 1: DC first, interleaved, point transform dcAl
    sos((1 to nComp), 0x00, 0, 0, 0, dcAl) { bw =>
      val pred = new Array[Int](nComp)
      var rst = 0
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        if (driEvery > 0 && mcu > 0 && mcu % driEvery == 0) {
          bw.restart(rst); rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (c < nComp) {
          val (ch, cv, blocks) = comps(c)
          var v0 = 0
          while (v0 < cv) {
            var h0 = 0
            while (h0 < ch) {
              val bi = (my * cv + v0) * (mcusX * ch) + mx * ch + h0
              val dc = blocks(bi)(0) >> dcAl // DC point transform: arithmetic shift
              val diff = dc - pred(c)
              pred(c) = dc
              val cat = jpegCat(diff)
              require(cat <= 11, s"JPEG encode: DC diff $diff out of range")
              bw.putSym(dcCodes, cat)
              bw.putExtra(diff, cat)
              h0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mcu += 1
      }
    }
    // ---- DC refinement ladder: one raw bit per block per level
    var al = dcAl - 1
    while (al >= 0) {
      val lvl = al
      sos((1 to nComp), 0x00, 0, 0, lvl + 1, lvl) { bw =>
        var rst = 0
        var mcu = 0
        while (mcu < mcusX * mcusY) {
          if (driEvery > 0 && mcu > 0 && mcu % driEvery == 0) {
            bw.restart(rst); rst += 1
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var c = 0
          while (c < nComp) {
            val (ch, cv, blocks) = comps(c)
            var v0 = 0
            while (v0 < cv) {
              var h0 = 0
              while (h0 < ch) {
                val bi = (my * cv + v0) * (mcusX * ch) + mx * ch + h0
                bw.putBits((blocks(bi)(0) >> lvl) & 1, 1)
                h0 += 1
              }
              v0 += 1
            }
            c += 1
          }
          mcu += 1
        }
      }
      al -= 1
    }
    // ---- per-component AC scans over the component's OWN block grid
    var c = 0
    while (c < nComp) {
      val (ch, cv, blocks) = comps(c)
      val cbx = ((width * ch + hMax - 1) / hMax + 7) / 8
      val cby = ((height * cv + vMax - 1) / vMax + 7) / 8
      def blockAt(bx: Int, by: Int): Array[Int] = blocks(by * (mcusX * ch) + bx)
      // AC first: EOB-run grammar at point transform acAl (divide toward 0)
      sos(Seq(c + 1), 0x00, 1, 63, 0, acAl) { bw =>
        var eobrun = 0
        def emitEobrun(): Unit = if (eobrun > 0) {
          val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
          bw.putSym(acCodes, nbits << 4)
          if (nbits > 0) bw.putBits(eobrun & ((1 << nbits) - 1), nbits)
          eobrun = 0
        }
        var rst = 0
        var bi = 0
        while (bi < cbx * cby) {
          if (driEvery > 0 && bi > 0 && bi % driEvery == 0) {
            emitEobrun()
            bw.restart(rst); rst += 1
          }
          val b = blockAt(bi % cbx, bi / cbx)
          var r = 0
          var any = false
          var k = 1
          while (k < 64) {
            val t0 = b(k)
            val t = if (t0 >= 0) t0 >> acAl else -((-t0) >> acAl)
            if (t == 0) r += 1
            else {
              emitEobrun()
              while (r > 15) { bw.putSym(acCodes, 0xf0); r -= 16 }
              val s = jpegCat(t)
              require(s <= 10, s"JPEG encode: AC coefficient $t out of range")
              bw.putSym(acCodes, (r << 4) | s)
              bw.putExtra(t, s)
              r = 0
              any = true
            }
            k += 1
          }
          if (r > 0 || !any) {
            eobrun += 1
            if (eobrun == 0x7fff) emitEobrun()
          }
          bi += 1
        }
        emitEobrun()
      }
      // AC refinement ladder: spec G.1.2.3 (buffered correction bits,
      // EOB runs carrying them, ZRL only when foldable history remains)
      var aal = acAl - 1
      while (aal >= 0) {
        val lvl = aal
        sos(Seq(c + 1), 0x00, 1, 63, lvl + 1, lvl) { bw =>
          var eobrun = 0
          val beBits = scala.collection.mutable.ArrayBuffer.empty[Int]
          def emitEobrun(): Unit = if (eobrun > 0 || beBits.nonEmpty) {
            require(eobrun > 0, "refinement correction bits without an EOB run")
            val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
            bw.putSym(acCodes, nbits << 4)
            if (nbits > 0) bw.putBits(eobrun & ((1 << nbits) - 1), nbits)
            beBits.foreach(bit => bw.putBits(bit, 1))
            beBits.clear()
            eobrun = 0
          }
          var rst = 0
          var bi = 0
          while (bi < cbx * cby) {
            if (driEvery > 0 && bi > 0 && bi % driEvery == 0) {
              emitEobrun()
              bw.restart(rst); rst += 1
            }
            val b = blockAt(bi % cbx, bi / cbx)
            // history magnitude at THIS scan's precision
            val abs = new Array[Int](64)
            var eob = 0
            var k = 1
            while (k < 64) {
              abs(k) = (if (b(k) < 0) -b(k) else b(k)) >> lvl
              if (abs(k) == 1) eob = k
              k += 1
            }
            var r = 0
            val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
            k = 1
            while (k < 64) {
              val t = abs(k)
              if (t == 0) r += 1
              else {
                // ZRLs are emitted on reaching ANY nonzero coefficient
                // (history included) while a newly-significant one still
                // lies ahead (k <= eob) — the decoder's ZRL walk corrects
                // only the nonzeros among its 16 zero-history positions,
                // so bits buffered for LATER history positions must ride
                // a later symbol, never this ZRL (spec G.1.2.3 order)
                while (r > 15 && k <= eob) {
                  emitEobrun()
                  bw.putSym(acCodes, 0xf0)
                  r -= 16
                  brBits.foreach(bit => bw.putBits(bit, 1))
                  brBits.clear()
                }
                if (t > 1) {
                  // history-nonzero: buffer its correction bit
                  brBits += (t & 1)
                } else {
                  // newly significant under this point transform
                  emitEobrun()
                  bw.putSym(acCodes, (r << 4) | 1)
                  bw.putBits(if (b(k) < 0) 0 else 1, 1)
                  brBits.foreach(bit => bw.putBits(bit, 1))
                  brBits.clear()
                  r = 0
                }
              }
              k += 1
            }
            if (r > 0 || brBits.nonEmpty) {
              eobrun += 1
              beBits ++= brBits
              if (eobrun == 0x7fff || beBits.length > 900) emitEobrun()
            }
            bi += 1
          }
          emitEobrun()
        }
        aal -= 1
      }
      c += 1
    }
    w(0xff, 0xd9)
    out.toByteArray
  }

  /** [[encodeJpegProgressive]] for the grayscale block-grid shape
    * [[encodeJpegGrayCoefs]] takes. */
  def encodeJpegGrayProgressive(
      blocks: Array[Array[Int]], blocksWide: Int,
      dcAl: Int = 1, acAl: Int = 1, driEvery: Int = 0): Array[Byte] = {
    require(blocksWide >= 1 && blocks.nonEmpty && blocks.length % blocksWide == 0,
      s"blocks (${blocks.length}) must fill a rectangle $blocksWide wide")
    encodeJpegProgressive(blocksWide * 8, (blocks.length / blocksWide) * 8,
      Array((1, 1, blocks)), dcAl, acAl, driEvery)
  }

  private def putAscii(out: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
  }

  private def putLeInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
    out(off + 2) = ((v >>> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putLeShort(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def leShort16Signed(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")
}
