package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata, and run decode / feature-extraction
 * as a partition-local batch transform.
 *
 * The Spark side is real and tested — schema handling, per-partition batch
 * iteration (no full-partition materialization), output row shape. Media
 * decoding is a pluggable [[MediaDecoder]]: [[RealMediaDecoder]] decodes
 * REAL format bytes (WAV RIFF PCM, 24-bit BMP, Netpbm P6 — the three
 * zero-dependency public byte layouts in [[MediaCodecs]]) into a metadata +
 * banded-statistics feature vector; [[FakeMediaDecoder]] remains as the
 * format-agnostic deterministic stand-in for opaque payloads.
 *
 * At 100 TB this is the right execution shape: decoding is embarrassingly
 * parallel, CPU-bound, and must stream — one payload in flight per core,
 * features (small) retained, payloads (large) dropped immediately after
 * decode so executor memory stays O(batch), never O(partition).
 */
object Multimodal {

  /** Pluggable payload -> feature-vector decoder. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  /**
   * Real media decode over the public zero-dependency byte layouts in
   * [[MediaCodecs]] — dispatches on the payload's magic bytes:
   *
   *  - `RIFF…WAVE` -> PCM WAV: features are
   *    `[1, sampleRate, channels, nFrames, band-mean amplitudes…]`
   *  - `BM` -> 24-bit BMP: `[2, width, height, 3, band-mean pixel values…]`
   *  - `P6` -> Netpbm PPM: `[3, width, height, 3, band-mean pixel values…]`
   *  - `\x89PNG` -> 8-bit RGB/RGBA PNG (zlib IDAT, all five row filters):
   *    `[4, width, height, channels, band-mean pixel values…]`
   *  - `GIF8` -> GIF87a/89a (variable-width LZW, palette):
   *    `[5, width, height, 3, band-mean palette-expanded RGB values…]`
   *  - `\xFF\xD8` -> baseline-sequential JPEG (SOF0 Huffman + IDCT +
   *    YCbCr->RGB): `[6, width, height, 3, band-mean RGB values…]`
   *
   * Feature layout: slot 0 is the format code, slots 1-3 are format
   * metadata, and the remaining `dim - 4` slots are the means of `dim - 4`
   * equal contiguous bands of the decoded signal (samples for audio,
   * RGB bytes for images) — the fixed-width "thumbnail" that downstream
   * similarity operators consume. An unknown magic or corrupt payload
   * throws (loud contract): garbage must never silently become features.
   */
  final class RealMediaDecoder(val dim: Int) extends MediaDecoder {
    require(dim >= 5, s"dim ($dim) must be at least 5: 4 metadata slots + >=1 band")

    /** Unsigned byte array -> double array in one primitive loop — the
      * `.map(b => (b & 0xff).toDouble)` spelling boxes every element
      * (Function1 is not specialized on Byte arguments), and this
      * conversion runs over every decoded pixel of every payload
      * (measured ~3x of the whole dispatch pass at sf0.1, r11). */
    private def unsignedToDoubles(bytes: Array[Byte]): Array[Double] = {
      val out = new Array[Double](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
      out
    }

    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F') {
        val wav = MediaCodecs.decodeWav(payload)
        val sig = new Array[Double](wav.samples.length)
        var i = 0
        while (i < wav.samples.length) { sig(i) = wav.samples(i).toDouble; i += 1 }
        build(1f, wav.sampleRate.toFloat, wav.channels.toFloat, wav.nFrames.toFloat, sig)
      } else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
        val bmp = MediaCodecs.decodeBmp(payload)
        build(2f, bmp.width.toFloat, bmp.height.toFloat, 3f, unsignedToDoubles(bmp.rgb))
      } else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') {
        val ppm = MediaCodecs.decodePpm(payload)
        build(3f, ppm.width.toFloat, ppm.height.toFloat, 3f, unsignedToDoubles(ppm.rgb))
      } else if (payload.length >= 4 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') {
        val png = MediaCodecs.decodePng(payload)
        build(4f, png.width.toFloat, png.height.toFloat, png.channels.toFloat,
          unsignedToDoubles(png.pix))
      } else if (payload.length >= 4 &&
        payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == '8') {
        val gif = MediaCodecs.decodeGif(payload)
        val sig = new Array[Double](3 * gif.indices.length)
        var i = 0
        while (i < gif.indices.length) {
          sig(3 * i) = gif.channel(i, 0)
          sig(3 * i + 1) = gif.channel(i, 1)
          sig(3 * i + 2) = gif.channel(i, 2)
          i += 1
        }
        build(5f, gif.width.toFloat, gif.height.toFloat, 3f, sig)
      } else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8) {
        val jpg = MediaCodecs.decodeJpeg(payload)
        build(6f, jpg.width.toFloat, jpg.height.toFloat, 3f, unsignedToDoubles(jpg.rgb))
      } else {
        throw new IllegalArgumentException(
          s"unknown media magic (first bytes: ${payload.take(4).map(b => f"$b%02x").mkString(" ")})")
      }
    }

    /** [code, m1, m2, m3] ++ means of (dim-4) equal contiguous signal bands
      * (empty signal -> 0-filled bands; trailing band takes the remainder). */
    private def build(
        code: Float, m1: Float, m2: Float, m3: Float, signal: Array[Double]): Array[Float] = {
      val out = new Array[Float](dim)
      out(0) = code; out(1) = m1; out(2) = m2; out(3) = m3
      val nBands = dim - 4
      if (signal.nonEmpty) {
        var b = 0
        while (b < nBands) {
          val from = (b.toLong * signal.length / nBands).toInt
          val until = ((b + 1).toLong * signal.length / nBands).toInt
          if (until > from) {
            var s = 0.0
            var i = from
            while (i < until) { s += signal(i); i += 1 }
            out(4 + b) = (s / (until - from)).toFloat
          }
          b += 1
        }
      }
      out
    }
  }

  /**
   * Deterministic stand-in decoder: `dim` banded rolling-hash statistics of
   * the payload bytes, scaled to [0, 1). Stable across JVMs and runs.
   */
  final class FakeMediaDecoder(val dim: Int) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        acc(i % dim) = (acc(i % dim) * 31 + b) & 0xffffffffL
        i += 1
      }
      acc.map(v => (v.toDouble / 4294967296.0).toFloat)
    }
  }

  /**
   * Frame sampling: treat the payload as a sequence of fixed-size frames
   * and keep every `stride`-th one (video keyframe extraction's execution
   * shape). The byte-level slicing is the REAL partition/batch plumbing; a
   * codec would only change how frame boundaries are found. Output:
   * (`idCol`, n_frames: int, frames: array<binary>) — sampled frames only,
   * so output rows shrink by ~`stride`x.
   */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameBytes: Int,
      stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("frames", ArrayType(BinaryType, containsNull = false), nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null)
        else {
          val total = payload.length / frameBytes // trailing partial dropped
          val sampled = (0 until total by stride).map { f =>
            java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes)
          }
          Row(r.getLong(idIdx), total, sampled)
        }
      }
    }
  }

  /**
   * REAL multi-frame frame sampling: the payload is a sequence of
   * concatenated Netpbm P6 frames (the zero-dependency "video" container);
   * walk the frame boundaries by parsing each frame's ASCII header
   * ([[MediaCodecs.decodePpmAt]] — header width varies with the dimension
   * digits, so this is container parsing, not fixed-stride slicing), keep
   * every `stride`-th frame, and report exact integer stats over the
   * SAMPLED frames only: (`idCol`, n_bytes: long, n_frames: int,
   * n_sampled: int, sum_px: long, wsum_px: long, max_px: int), where
   * wsum_px weights each sampled frame's pixel sum by `1 + frame_no % 97`
   * — a right sum from the wrong frames cannot pass. Trailing garbage
   * after the last frame fails loudly (the magic check). Map-only: one
   * payload resident per core, dropped after the walk.
   */
  def ppmVideoStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, s"stride ($stride) must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("n_sampled", IntegerType, nullable = true),
      StructField("sum_px", LongType, nullable = true),
      StructField("wsum_px", LongType, nullable = true),
      StructField("max_px", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          var off = 0
          var f = 0
          var sampled = 0
          var sum = 0L
          var wsum = 0L
          var max = 0
          while (off < payload.length) {
            val (img, used) = MediaCodecs.decodePpmAt(payload, off)
            if (f % stride == 0) {
              var frameSum = 0L
              var i = 0
              while (i < img.rgb.length) {
                val v = img.rgb(i) & 0xff
                frameSum += v
                if (v > max) max = v
                i += 1
              }
              sum += frameSum
              wsum += (1L + f % 97) * frameSum
              sampled += 1
            }
            off += used
            f += 1
          }
          Row(r.getLong(idIdx), payload.length.toLong, f, sampled, sum, wsum, max)
        }
      }
    }
  }

  /**
   * Temporal motion energy over a concatenated-PPM "video" payload: walk
   * the frame boundaries ([[MediaCodecs.decodePpmAt]]), and for every
   * CONSECUTIVE frame pair (f, f+1) accumulate the sum of absolute
   * per-byte pixel differences (SAD — the block-matching primitive of
   * every video codec). Reports (`idCol`, n_frames: int, n_pairs: int,
   * sad_sum: long, wsad_sum: long, max_pair_sad: long), where wsad_sum
   * weights pair f by `1 + f % 97` so a right total from the wrong pair
   * positions cannot pass. Frames of mismatched dimensions fail loudly
   * (SAD over different geometries is meaningless). Static scenes read
   * sad 0; cuts/high motion read large — the scene-change / dead-video
   * screen. Map-only: one payload resident per core, previous frame
   * buffer only, dropped after the walk.
   */
  def ppmMotionStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("n_pairs", IntegerType, nullable = true),
      StructField("sad_sum", LongType, nullable = true),
      StructField("wsad_sum", LongType, nullable = true),
      StructField("max_pair_sad", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null)
        else {
          var off = 0
          var f = 0
          var pairs = 0
          var sad = 0L
          var wsad = 0L
          var maxSad = 0L
          var prev: Array[Byte] = null
          while (off < payload.length) {
            val (img, used) = MediaCodecs.decodePpmAt(payload, off)
            if (prev != null) {
              if (prev.length != img.rgb.length)
                throw new IllegalArgumentException(
                  s"ppmMotionStats: frame ${f} geometry changed mid-video " +
                    s"(${prev.length} vs ${img.rgb.length} pixel bytes) — " +
                    "SAD over mismatched frames is meaningless")
              var pairSad = 0L
              var i = 0
              while (i < img.rgb.length) {
                val d = (img.rgb(i) & 0xff) - (prev(i) & 0xff)
                pairSad += (if (d < 0) -d else d)
                i += 1
              }
              sad += pairSad
              wsad += (1L + (f - 1) % 97) * pairSad
              if (pairSad > maxSad) maxSad = pairSad
              pairs += 1
            }
            prev = img.rgb
            off += used
            f += 1
          }
          Row(r.getLong(idIdx), f, pairs, sad, wsad, maxSad)
        }
      }
    }
  }

  /** Feature resize: shrink a feature vector to `newDim` by averaging equal
    * buckets (image thumbnail / embedding truncation shape). Pure
    * arithmetic — nothing to stub. Expressed as a column op so it stays in
    * whole-stage codegen next to the similarity operators. */
  def resizeFeatures(features: org.apache.spark.sql.Column, newDim: Int): org.apache.spark.sql.Column = {
    require(newDim > 0, "newDim must be positive")
    import org.apache.spark.sql.functions._
    val n = size(features)
    // bucket b averages elements [floor(b*n/newDim), floor((b+1)*n/newDim)).
    // Column '/' is DOUBLE division, so the boundaries must be floored to
    // ints EXPLICITLY: letting slice() truncate the fractions while the mean
    // divisor stayed fractional skewed every bucket whenever n % newDim != 0.
    transform(sequence(lit(0), lit(newDim - 1)), b => {
      val from = floor((b * n) / lit(newDim)).cast("int")
      val until = floor(((b + lit(1)) * n) / lit(newDim)).cast("int")
      val len = greatest(until - from, lit(1))
      aggregate(
        slice(features, from + 1, len),
        lit(0.0d),
        (acc, x) => acc + x.cast("double")) / len.cast("double")
    })
  }

  /**
   * Decode a WAV (RIFF PCM) binary column into exact typed stats:
   * (`idCol`, n_bytes: long, sample_rate: int, n_channels: int,
   * n_samples: long, sum_amp: long, max_amp: int). Sums/extrema are over
   * the decoded integer samples — EXACT integers, so the whole row is
   * arithmetic any oracle can re-derive from the source signal. Null
   * payloads propagate as null stats; corrupt payloads throw (the decoder's
   * loud contract). Map-only: one payload resident per core, payload
   * dropped after decode.
   */
  def wavStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_amp", LongType, nullable = true),
      StructField("max_amp", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val wav = MediaCodecs.decodeWav(payload)
          var sum = 0L
          var max = 0
          var i = 0
          while (i < wav.samples.length) {
            sum += wav.samples(i)
            if (wav.samples(i) > max || i == 0) max = wav.samples(i)
            i += 1
          }
          Row(r.getLong(idIdx), payload.length.toLong, wav.sampleRate, wav.channels,
            wav.samples.length.toLong, sum, max)
        }
      }
    }
  }

  /**
   * Decode a PNG binary column ([[MediaCodecs.decodePng]]: CRC-checked
   * chunks, zlib IDAT, all five row filters reversed) into exact typed
   * stats: (`idCol`, width: int, height: int, channels: int, sum_px: long,
   * wsum_px: long, max_px: int). `wsum_px` weights decoded byte p by
   * `1 + p % 97`, so a right total from wrong positions — ANY filter
   * mis-reversal shifts bytes — cannot pass. No n_bytes column on
   * purpose: the deflated payload length is compressor-dependent, not a
   * decode contract. Same null/loudness/streaming contract as
   * [[wavStats]]; map-only, payloads die in-stage.
   */
  def pngStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sum_px", LongType, nullable = true),
      StructField("wsum_px", LongType, nullable = true),
      StructField("max_px", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val png = MediaCodecs.decodePng(payload)
          var sum = 0L
          var wsum = 0L
          var max = 0
          var i = 0
          while (i < png.pix.length) {
            val v = png.pix(i) & 0xff
            sum += v
            wsum += (1L + i % 97) * v
            if (v > max) max = v
            i += 1
          }
          Row(r.getLong(idIdx), png.width, png.height, png.channels, sum, wsum, max)
        }
      }
    }
  }

  /**
   * Decode a GIF binary column into exact typed stats over the
   * palette-EXPANDED pixels: (`idCol`, width, height, n_colors,
   * sum_rgb: long, wsum_idx: long, max_idx: int) — sum_rgb sums the
   * palette RGB bytes of every pixel (so both the LZW index stream AND the
   * color table must decode byte-exactly), wsum_idx position-weights the
   * raw indices (a single LZW slip shifts every later pixel and breaks
   * it), n_colors is the active color table's entry count. Same
   * null/loudness/streaming contract as [[wavStats]]: map-only, payloads
   * die in-stage.
   */
  def gifStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_colors", IntegerType, nullable = true),
      StructField("sum_rgb", LongType, nullable = true),
      StructField("wsum_idx", LongType, nullable = true),
      StructField("max_idx", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val gif = MediaCodecs.decodeGif(payload)
          var sumRgb = 0L
          var wsumIdx = 0L
          var maxIdx = 0
          var i = 0
          while (i < gif.indices.length) {
            val idx = gif.indices(i) & 0xff
            sumRgb += gif.channel(i, 0) + gif.channel(i, 1) + gif.channel(i, 2)
            wsumIdx += (1L + i % 97) * idx
            if (idx > maxIdx) maxIdx = idx
            i += 1
          }
          Row(r.getLong(idIdx), gif.width, gif.height, gif.palette.length / 3,
            sumRgb, wsumIdx, maxIdx)
        }
      }
    }
  }

  /**
   * Decode a 24-bit BMP (or PPM P6) binary column into exact typed stats:
   * (`idCol`, n_bytes: long, width: int, height: int, sum_px: long,
   * max_px: int) — sum/max over all decoded RGB bytes (padding stripped),
   * exact integers. Same null/loudness/streaming contract as [[wavStats]].
   */
  def imageStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_px", LongType, nullable = true),
      StructField("max_px", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null, null, null, null)
        else {
          val img =
            if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
              MediaCodecs.decodePpm(payload)
            else MediaCodecs.decodeBmp(payload)
          var sum = 0L
          var max = 0
          var i = 0
          while (i < img.rgb.length) {
            val v = img.rgb(i) & 0xff
            sum += v
            if (v > max) max = v
            i += 1
          }
          Row(r.getLong(idIdx), payload.length.toLong, img.width, img.height, sum, max)
        }
      }
    }
  }

  /**
   * Decode -> block-mean DOWNSAMPLE -> re-encode for audio — the
   * [[resizeImageStats]] discipline on the time axis: every `factor`
   * consecutive frames pool to their per-channel FLOOR-mean
   * (`Math.floorDiv`, so negative amplitudes floor exactly like DuckDB's
   * `//`), the tail block pools over the frames that exist, and the
   * result re-encodes as 16-bit PCM at `max(1, rate / factor)`. Output:
   * (`idCol`, n_in, n_out: long frames, out_rate: int, out_bytes: long —
   * re-encoded size locking the header math, sum_amp: long, wsum_amp:
   * long — position-weighted `Σ pooled[i] * (1 + i % 97)` pinning every
   * pooled sample to its slot). Same null/loudness/streaming contract as
   * [[wavStats]].
   */
  /**
   * The audio AUGMENTATION step: decode the 16-bit PCM payload, apply an
   * integer gain with int16 SATURATION (the arithmetic real audio chains
   * get wrong first: a sample at 20000 under gain 3 must clamp to 32767,
   * not wrap to -5536), re-encode, and emit exact positional stats —
   * `n_clipped` counts saturated samples, `wsum_amp` pins every scaled
   * sample to its slot with weights `1 + i % 97`. Fused map-only shape:
   * payloads die inside the stage.
   */
  def gainWavStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      gain: Int): DataFrame = {
    require(gain >= 1, s"gain ($gain) must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("n_clipped", LongType, nullable = true),
      StructField("out_bytes", LongType, nullable = true),
      StructField("sum_amp", LongType, nullable = true),
      StructField("wsum_amp", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null)
        else {
          val wav = MediaCodecs.decodeWav(payload)
          val scaled = new Array[Short](wav.samples.length)
          var clipped = 0L
          var i = 0
          while (i < wav.samples.length) {
            val v = wav.samples(i).toLong * gain
            val c =
              if (v > Short.MaxValue) { clipped += 1; Short.MaxValue.toLong }
              else if (v < Short.MinValue) { clipped += 1; Short.MinValue.toLong }
              else v
            scaled(i) = c.toShort
            i += 1
          }
          val reenc = MediaCodecs.encodeWavPcm16(wav.sampleRate, wav.channels, scaled)
          var sum = 0L
          var wsum = 0L
          var j = 0
          while (j < scaled.length) {
            sum += scaled(j)
            wsum += scaled(j).toLong * (1L + j % 97)
            j += 1
          }
          Row(r.getLong(idIdx), scaled.length.toLong, clipped,
            reenc.length.toLong, sum, wsum)
        }
      }
    }
  }

  def downsampleWavStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      factor: Int): DataFrame = {
    require(factor >= 1, s"factor ($factor) must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_in", LongType, nullable = true),
      StructField("n_out", LongType, nullable = true),
      StructField("out_rate", IntegerType, nullable = true),
      StructField("out_bytes", LongType, nullable = true),
      StructField("sum_amp", LongType, nullable = true),
      StructField("wsum_amp", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val wav = MediaCodecs.decodeWav(payload)
          val ch = wav.channels
          val nFrames = wav.nFrames
          val outFrames = (nFrames + factor - 1) / factor
          val pooled = new Array[Short](outFrames * ch)
          var j = 0
          while (j < outFrames) {
            val f0 = j * factor
            val f1 = math.min(f0 + factor, nFrames)
            var c = 0
            while (c < ch) {
              var sum = 0L
              var f = f0
              while (f < f1) { sum += wav.samples(f * ch + c); f += 1 }
              pooled(j * ch + c) = Math.floorDiv(sum, (f1 - f0).toLong).toShort
              c += 1
            }
            j += 1
          }
          val outRate = math.max(1, wav.sampleRate / factor)
          val reenc = MediaCodecs.encodeWavPcm16(outRate, ch, pooled)
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < pooled.length) {
            sum += pooled(i)
            wsum += pooled(i).toLong * (1L + i % 97)
            i += 1
          }
          Row(r.getLong(idIdx), nFrames.toLong, outFrames.toLong, outRate,
            reenc.length.toLong, sum, wsum)
        }
      }
    }
  }

  /**
   * Decode -> block-mean RESIZE -> re-encode, with exact positional stats:
   * the image-preprocessing step of a multimodal ingest (thumbnailing /
   * patch-grid normalization) as one `mapPartitions` pass. Output per row:
   * (`idCol`, in_w, in_h, out_w, out_h, out_bytes: long — the re-encoded
   * BMP's size, locking the stride/padding math; sum_px: long — sum over
   * the resized RGB bytes; wsum_px: long — the POSITION-WEIGHTED sum
   * `Σ rgb[i] * (1 + i % 97)`, which pins every resized byte to its
   * location, so a correct sum with a wrong layout cannot pass).
   * Downscale semantics are [[MediaCodecs.downscaleBmp]]'s all-integer
   * floor-means — every number re-derivable arithmetically by an oracle.
   * Same null/loudness/streaming contract as [[wavStats]].
   */
  def resizeImageStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      fx: Int,
      fy: Int): DataFrame = {
    require(fx >= 1 && fy >= 1, s"scale factors ($fx, $fy) must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("in_w", IntegerType, nullable = true),
      StructField("in_h", IntegerType, nullable = true),
      StructField("out_w", IntegerType, nullable = true),
      StructField("out_h", IntegerType, nullable = true),
      StructField("out_bytes", LongType, nullable = true),
      StructField("sum_px", LongType, nullable = true),
      StructField("wsum_px", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null, null)
        else {
          val img =
            if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
              MediaCodecs.decodePpm(payload)
            else MediaCodecs.decodeBmp(payload)
          val small = MediaCodecs.downscaleBmp(img, fx, fy)
          val reenc = MediaCodecs.encodeBmp24(small.width, small.height, small.rgb)
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < small.rgb.length) {
            val v = small.rgb(i) & 0xff
            sum += v
            wsum += v.toLong * (1L + i % 97)
            i += 1
          }
          Row(r.getLong(idIdx), img.width, img.height, small.width, small.height,
            reenc.length.toLong, sum, wsum)
        }
      }
    }
  }

  /**
   * The AUGMENTATION step of multimodal ingest: decode the image payload
   * (BMP or PPM), mirror it horizontally, re-encode, and emit exact
   * positional stats — `sum_px` (flip-invariant: catches value corruption),
   * `wsum_px` with weights `1 + i % 97` over the flipped byte layout
   * (position-sensitive: catches a flip that didn't happen, reversed
   * channels, or wrong stride), and `out_bytes` for the re-encoded size.
   * Same fused map-only shape as [[resizeImageStats]]: payloads die inside
   * the stage, only fixed-width stat rows survive.
   */
  def flipImageStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("in_w", IntegerType, nullable = true),
      StructField("in_h", IntegerType, nullable = true),
      StructField("out_bytes", LongType, nullable = true),
      StructField("sum_px", LongType, nullable = true),
      StructField("wsum_px", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null)
        else {
          val img =
            if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
              MediaCodecs.decodePpm(payload)
            else MediaCodecs.decodeBmp(payload)
          val flipped = MediaCodecs.flipBmpHorizontal(img)
          val reenc = MediaCodecs.encodeBmp24(flipped.width, flipped.height, flipped.rgb)
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < flipped.rgb.length) {
            val v = flipped.rgb(i) & 0xff
            sum += v
            wsum += v.toLong * (1L + i % 97)
            i += 1
          }
          Row(r.getLong(idIdx), img.width, img.height,
            reenc.length.toLong, sum, wsum)
        }
      }
    }
  }

  /**
   * Perceptual average-hash (aHash) over the DECODED image: the first
   * `nBits` pixels' gray values (red channel of the row-major decode;
   * the synth payloads are grayscale so R==G==B), zero-extended past the
   * image end, vote against their own integer floor-mean — bit i set iff
   * `gray(i) > floor(sum / nBits)`. The classic near-dup screen for image
   * corpora: re-encodes, format changes, and metadata edits keep the hash,
   * so exact-byte dedup misses what aHash catches. `nBits <= 62` keeps the
   * hash in a signed long with exact cross-engine `2^i` arithmetic.
   * Output: (`idCol`, width, height, ahash: long, n_set: int). Same fused
   * map-only shape as [[imageStats]]: payloads die inside the stage.
   */
  def imageAhash(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      nBits: Int): DataFrame = {
    require(nBits >= 1 && nBits <= 62, s"nBits ($nBits) must be in [1, 62]")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("ahash", LongType, nullable = true),
      StructField("n_set", IntegerType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null, null, null)
        else {
          val img =
            if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
              MediaCodecs.decodePpm(payload)
            else MediaCodecs.decodeBmp(payload)
          val nPx = img.width * img.height
          var sum = 0L
          var i = 0
          while (i < nBits) {
            if (i < nPx) sum += (img.rgb(3 * i) & 0xff)
            i += 1
          }
          val mean = sum / nBits
          var hash = 0L
          var nSet = 0
          i = 0
          while (i < nBits) {
            val g = if (i < nPx) img.rgb(3 * i) & 0xff else 0
            if (g > mean) { hash |= (1L << i); nSet += 1 }
            i += 1
          }
          Row(r.getLong(idIdx), img.width, img.height, hash, nSet)
        }
      }
    }
  }

  /**
   * 2D SPATIAL CONVOLUTION over the decoded image — Sobel edge response,
   * the feature class the other image ops don't touch (stats/resize/flip/
   * aHash are all pointwise or pooling; this one reads a 3x3 NEIGHBORHOOD
   * per pixel). For every interior pixel (1 <= r <= h-2, 1 <= c <= w-2)
   * of the gray grid (red channel of the row-major decode):
   *
   *   gx = (g[r-1][c+1] + 2*g[r][c+1] + g[r+1][c+1])
   *      - (g[r-1][c-1] + 2*g[r][c-1] + g[r+1][c-1])
   *   gy = (g[r+1][c-1] + 2*g[r+1][c] + g[r+1][c+1])
   *      - (g[r-1][c-1] + 2*g[r-1][c] + g[r-1][c+1])
   *
   * and the L1 gradient magnitude |gx| + |gy| — all-integer, exactly
   * oracle-replayable (the true L2 magnitude needs sqrt; L1 is the
   * standard integer-exact variant). Output: (`idCol`, n_interior: long,
   * edge_energy: long Σ|mag|, max_grad: int, wsum_grad: long
   * Σ mag*(1 + j % 97) — the positional pin locking every interior pixel
   * to its row-major slot j). Images with h < 3 or w < 3 have no interior:
   * zeros, not nulls. Same fused map-only shape as [[imageStats]]:
   * payloads die inside the stage, executor memory stays O(image).
   */
  def bmpSobelStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_interior", LongType, nullable = true),
      StructField("edge_energy", LongType, nullable = true),
      StructField("max_grad", IntegerType, nullable = true),
      StructField("wsum_grad", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null, null, null)
        else {
          val img =
            if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
              MediaCodecs.decodePpm(payload)
            else MediaCodecs.decodeBmp(payload)
          val w = img.width
          val h = img.height
          @inline def g(rr: Int, cc: Int): Int = img.rgb(3 * (rr * w + cc)) & 0xff
          var energy = 0L
          var wsum = 0L
          var maxG = 0
          var nInt = 0L
          if (w >= 3 && h >= 3) {
            nInt = (w - 2).toLong * (h - 2)
            var rr = 1
            while (rr < h - 1) {
              var cc = 1
              while (cc < w - 1) {
                val gx = (g(rr - 1, cc + 1) + 2 * g(rr, cc + 1) + g(rr + 1, cc + 1)) -
                  (g(rr - 1, cc - 1) + 2 * g(rr, cc - 1) + g(rr + 1, cc - 1))
                val gy = (g(rr + 1, cc - 1) + 2 * g(rr + 1, cc) + g(rr + 1, cc + 1)) -
                  (g(rr - 1, cc - 1) + 2 * g(rr - 1, cc) + g(rr - 1, cc + 1))
                val mag = math.abs(gx) + math.abs(gy)
                val j = (rr - 1).toLong * (w - 2) + (cc - 1)
                energy += mag
                wsum += mag.toLong * (1L + j % 97)
                if (mag > maxG) maxG = mag
                cc += 1
              }
              rr += 1
            }
          }
          Row(r.getLong(idIdx), nInt, energy, maxG, wsum)
        }
      }
    }
  }

  /**
   * Frame-level voice-activity detection (VAD) over the DECODED 16-bit PCM
   * stream: consecutive `frameLen`-sample frames (tail partial frame
   * dropped — a VAD decides on full analysis windows) are ACTIVE when the
   * integer floor-mean of |amplitude| reaches `threshold`, SILENT below it.
   * All-integer arithmetic (`Σ|amp| / frameLen` floor-divides), so every
   * frame decision is exactly re-derivable by an oracle. Output: (`idCol`,
   * n_samples: long, n_frames, n_active, n_silent: long, silence_frac:
   * double round 6). The speech-pipeline pre-filter that decides which
   * audio is worth transcribing; fused map-only shape as [[wavStats]].
   */
  /**
   * Integer spectral energies over decoded 16-bit PCM — the frequency-
   * domain feature class (spectrogram bands) with EXACT arithmetic: for
   * every 8-sample frame, the 8-point DFT bins k in {0, 2, 4} have
   * twiddle factors in {0, +-1} only, so their energies are exact
   * integers: e0 = (sum x)^2 (DC), e2 = (x0-x2+x4-x6)^2 + (x1-x3+x5-x7)^2
   * (mid band), e4 = (sum (-1)^n x_n)^2 (Nyquist). Reports per payload
   * (`idCol`, n_frames: long, e0_sum, e2_sum, e4_sum: long,
   * hf_frames: long — frames whose Nyquist energy exceeds DC, the
   * high-frequency/noise census — and we4_sum: long weighting each
   * frame's e4 by `1 + f % 97` so right totals from wrong frame
   * positions cannot pass). Trailing partial frame dropped. Map-only.
   */
  def wavSpectralStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_frames", LongType, nullable = true),
      StructField("e0_sum", LongType, nullable = true),
      StructField("e2_sum", LongType, nullable = true),
      StructField("e4_sum", LongType, nullable = true),
      StructField("hf_frames", LongType, nullable = true),
      StructField("we4_sum", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          Row(r.getLong(idIdx), null, null, null, null, null, null)
        else {
          val wav = MediaCodecs.decodeWav(payload)
          val n = wav.samples.length
          val nFrames = n / 8
          var e0 = 0L; var e2 = 0L; var e4 = 0L
          var hf = 0L; var we4 = 0L
          var f = 0
          while (f < nFrames) {
            val b = f * 8
            var s = 0L; var alt = 0L
            var re2 = 0L; var im2 = 0L
            var i = 0
            while (i < 8) {
              val x = wav.samples(b + i).toLong
              s += x
              if (i % 2 == 0) { alt += x; re2 += (if (i % 4 == 0) x else -x) }
              else { alt -= x; im2 += (if (i % 4 == 1) -x else x) }
              i += 1
            }
            val f0 = s * s
            val f2 = re2 * re2 + im2 * im2
            val f4 = alt * alt
            e0 += f0; e2 += f2; e4 += f4
            if (f4 > f0) hf += 1
            we4 += (1L + f % 97) * f4
            f += 1
          }
          Row(r.getLong(idIdx), nFrames.toLong, e0, e2, e4, hf, we4)
        }
      }
    }
  }

  def wavVadStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameLen: Int,
      threshold: Int): DataFrame = {
    require(frameLen >= 1, s"frameLen ($frameLen) must be positive")
    require(threshold >= 0, s"threshold ($threshold) must be non-negative")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_active", LongType, nullable = true),
      StructField("n_silent", LongType, nullable = true),
      StructField("silence_frac", DoubleType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null, null, null, null)
        else {
          val wav = MediaCodecs.decodeWav(payload)
          val n = wav.samples.length
          val nFrames = n / frameLen
          var active = 0L
          var f = 0
          while (f < nFrames) {
            var s = 0L
            var i = f * frameLen
            val end = i + frameLen
            while (i < end) {
              s += math.abs(wav.samples(i).toLong)
              i += 1
            }
            if (s / frameLen >= threshold) active += 1
            f += 1
          }
          val silent = nFrames - active
          val frac =
            if (nFrames == 0) 0.0d
            else {
              val raw = silent.toDouble / nFrames.toDouble
              BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
          Row(r.getLong(idIdx), n.toLong, nFrames.toLong, active, silent, frac)
        }
      }
    }
  }

  /**
   * Decode an opaque binary column into metadata + feature vector.
   *
   * Input: any DataFrame with (`idCol`: long, `payloadCol`: binary).
   * Output: (`idCol`, n_bytes: long, features: array<float>) — payload
   * dropped, so only small rows survive the transform.
   */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // Streaming per-row decode: one payload resident at a time. A null
      // payload (nullable binary columns are the parquet norm) propagates as
      // null metadata/features instead of failing the task.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row(r.getLong(idIdx), null, null)
        else Row(r.getLong(idIdx), payload.length.toLong, decoder.decode(payload).toSeq)
      }
    }
  }
}
