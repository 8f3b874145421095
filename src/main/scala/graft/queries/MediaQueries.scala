package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal queries over REAL media format bytes — the documents table's
 * text bytes are deterministically synthesized into WAV (RIFF PCM) and BMP
 * payloads executor-side, then decoded back through the zero-dependency
 * [[graft.operators.MediaCodecs]] decoders. The oracle re-derives every
 * output column ARITHMETICALLY from the source text (it never sees the
 * media bytes), so a single wrong header field, endianness slip, or row-
 * padding error in either the encoder or the decoder breaks the hash.
 *
 * Scale shape: synth and decode are two fused map-only passes (no shuffle);
 * payloads live one-per-core and die inside the stage — only fixed-width
 * stats rows survive, exactly how a 100 TB media-feature extraction keeps
 * executor memory O(batch) rather than O(partition).
 */
object MediaQueries {

  import Tables.table

  /** (doc_id, payload): each document's UTF-8 bytes as 16-bit PCM samples
    * `(b - 64) * 256` (ASCII 32..126 -> -8192..15872, well inside int16)
    * at 1 channel, sample rate `8000 + doc_id % 100`. */
  private def wavPayloads(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = r.getString(textIdx)
        if (text == null) Row(id, null)
        else {
          val bytes = text.getBytes("UTF-8")
          val samples = new Array[Short](bytes.length)
          var i = 0
          while (i < bytes.length) {
            samples(i) = (((bytes(i) & 0xff) - 64) * 256).toShort
            i += 1
          }
          Row(id, graft.operators.MediaCodecs.encodeWavPcm16(
            8000 + (id % 100).toInt, 1, samples))
        }
      }
    }
  }

  /** (doc_id, payload): each document's UTF-8 bytes as a width-5 grayscale
    * 24-bit BMP (pixel RGB = (b, b, b)), height ceil(n/5) (min 1), the tail
    * row zero-padded — width 5 forces a 15-byte pixel row inside a 16-byte
    * stride, so the BMP 4-byte row padding is exercised on every row. */
  private def bmpPayloads(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = r.getString(textIdx)
        if (text == null) Row(id, null)
        else {
          val bytes = text.getBytes("UTF-8")
          val width = 5
          val height = math.max(1, (bytes.length + width - 1) / width)
          val rgb = new Array[Byte](3 * width * height)
          var i = 0
          while (i < width * height) {
            val v: Byte = if (i < bytes.length) bytes(i) else 0
            rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
            i += 1
          }
          Row(id, graft.operators.MediaCodecs.encodeBmp24(width, height, rgb))
        }
      }
    }
  }

  /** DuckDB list of the document's byte values (pure-ASCII corpus, so code
    * point == byte value; TESTDATA's generator emits printable ASCII). */
  private val duckBytes =
    "list_transform(range(1, octet_length(encode(text)) + 1), i -> unicode(substr(text, i, 1)))"

  /** (doc_id, payload): a "video" of `1 + doc_id % 4` concatenated 4x3 PPM
    * P6 frames; frame f's pixel i is the gray byte `text[(f*12 + i) % n]`
    * (RGB all equal), so every frame's content is position-derived and the
    * oracle can replay the full frame walk arithmetically. */
  private def videoPayloads(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = r.getString(textIdx)
        if (text == null || text.isEmpty) Row(id, null)
        else {
          val bytes = text.getBytes("UTF-8")
          val n = bytes.length
          val nf = 1 + (id % 4).toInt
          val out = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nf) {
            val rgb = new Array[Byte](36)
            var i = 0
            while (i < 12) {
              val v = bytes((f * 12 + i) % n)
              rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
              i += 1
            }
            out.write(graft.operators.MediaCodecs.encodePpm(4, 3, rgb))
            f += 1
          }
          Row(id, out.toByteArray)
        }
      }
    }
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q101
    Q(
      "q101_wav_decode",
      (s, dir) => {
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .wavStats(wavPayloads(docs), "doc_id", "payload")
          .withColumn("mean_amp",
            when(col("n_samples") === 0, lit(0.0d))
              .otherwise(col("sum_amp").cast("double") / col("n_samples").cast("double")))
          .select("doc_id", "n_bytes", "sample_rate", "n_channels",
            "n_samples", "sum_amp", "mean_amp", "max_amp")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> (v - 64) * 256) AS samples
          FROM documents)
        SELECT doc_id,
               CAST(44 + 2 * n AS BIGINT) AS n_bytes,
               CAST(8000 + doc_id % 100 AS INTEGER) AS sample_rate,
               CAST(1 AS INTEGER) AS n_channels,
               CAST(n AS BIGINT) AS n_samples,
               CAST(COALESCE(list_sum(samples), 0) AS BIGINT) AS sum_amp,
               CASE WHEN n = 0 THEN 0.0
                    ELSE CAST(list_sum(samples) AS DOUBLE) / CAST(n AS DOUBLE) END AS mean_amp,
               CAST(COALESCE(list_max(samples), 0) AS INTEGER) AS max_amp
        FROM b
        ORDER BY doc_id"""),
      "Real WAV decode: text bytes synthesized into RIFF PCM payloads executor-side, " +
        "decoded back by the zero-dependency chunk-walking WAV parser — every stat " +
        "re-derived arithmetically by the oracle from the source bytes, so one wrong " +
        "header field or endianness slip breaks the hash. Two fused map-only passes."),

    // ---------------------------------------------------------------- q104
    Q(
      "q104_bmp_decode",
      (s, dir) => {
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .imageStats(bmpPayloads(docs), "doc_id", "payload")
          .withColumn("mean_px",
            col("sum_px").cast("double")
              / (col("width") * col("height") * 3).cast("double"))
          .select("doc_id", "n_bytes", "width", "height", "sum_px", "mean_px", "max_px")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text)) / 5.0) AS INTEGER)) AS h,
                 $duckBytes AS vals
          FROM documents)
        SELECT doc_id,
               CAST(54 + 16 * h AS BIGINT) AS n_bytes,
               CAST(5 AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(3 * COALESCE(list_sum(vals), 0) AS BIGINT) AS sum_px,
               CAST(3 * COALESCE(list_sum(vals), 0) AS DOUBLE)
                 / CAST(15 * h AS DOUBLE) AS mean_px,
               CAST(COALESCE(list_max(vals), 0) AS INTEGER) AS max_px
        FROM b
        ORDER BY doc_id"""),
      "Real BMP decode: text bytes as a width-5 grayscale 24-bit bitmap (15-byte pixel " +
        "rows inside 16-byte strides, so the 4-byte row padding is load-bearing), decoded " +
        "back with padding stripped — n_bytes locks the stride math, sum/mean/max lock " +
        "the BGR pixel walk; all re-derived arithmetically by the oracle."),

    // ---------------------------------------------------------------- q123
    Q(
      "q123_bmp_resize",
      (s, dir) => {
        // The RESIZE step of multimodal ingest: decode the width-5 BMP,
        // block-mean downscale 2x horizontally / 3x vertically (integer
        // floor-means, edge blocks over the pixels that exist), re-encode,
        // and report exact positional stats. out_bytes locks the
        // re-encoded stride/padding math (width 3 -> 9-byte rows padded
        // to 12); wsum_px pins every resized byte to its location with
        // position weights (1 + i % 97), so a right sum in a wrong layout
        // cannot pass. The oracle re-derives the full decode -> block
        // means -> layout chain arithmetically from the text bytes.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .resizeImageStats(bmpPayloads(docs), "doc_id", "payload", fx = 2, fy = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text)) / 5.0) AS INTEGER)) AS h,
                 $duckBytes AS vals
          FROM documents),
        g AS (
          SELECT doc_id, n, h,
                 CAST((h + 2) // 3 AS INTEGER) AS outh,
                 flatten(list_transform(range(0, (h + 2) // 3), j ->
                   list_transform(range(0, 3), i ->
                     list_sum(flatten(list_transform(range(j*3, least(j*3+3, h)), rr ->
                       list_transform(range(i*2, least(i*2+2, 5)), cc ->
                         CASE WHEN rr*5+cc < n THEN vals[CAST(rr*5+cc+1 AS INTEGER)]
                              ELSE 0 END))))
                     // ((least(j*3+3, h) - j*3) * (least(i*2+2, 5) - i*2))))) AS px
          FROM b)
        SELECT doc_id,
               CAST(5 AS INTEGER) AS in_w,
               CAST(h AS INTEGER) AS in_h,
               CAST(3 AS INTEGER) AS out_w,
               CAST(outh AS INTEGER) AS out_h,
               CAST(54 + 12 * outh AS BIGINT) AS out_bytes,
               CAST(3 * list_sum(px) AS BIGINT) AS sum_px,
               CAST(list_sum(list_transform(range(0, len(px)), p ->
                 px[CAST(p + 1 AS INTEGER)]
                   * (3 + (3*p) % 97 + (3*p + 1) % 97 + (3*p + 2) % 97))) AS BIGINT)
                 AS wsum_px
        FROM g
        ORDER BY doc_id"""),
      "Block-mean image resize (2x3 floor-means, edge-complete) with re-encode: " +
        "out_bytes locks stride/padding, position-weighted wsum_px locks the full " +
        "resized layout — the thumbnailing step of multimodal ingest, every number " +
        "re-derived arithmetically by the oracle."),

    // ---------------------------------------------------------------- q124
    Q(
      "q124_wav_downsample",
      (s, dir) => {
        // The audio-side resize: decode the 16-bit PCM payload, pool every
        // 4 frames to their floor-mean (Math.floorDiv == DuckDB's `//`,
        // so NEGATIVE amplitudes floor identically — plain integer
        // division would truncate toward zero and diverge), re-encode at
        // rate/4, and report exact positional stats; wsum_amp pins every
        // pooled sample to its slot. Decimation is the preprocessing a
        // speech pipeline runs before feature extraction; the oracle
        // re-derives pooling, header math, and rate arithmetic from the
        // text bytes.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .downsampleWavStats(wavPayloads(docs), "doc_id", "payload", factor = 4)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> (v - 64) * 256) AS samples
          FROM documents),
        g AS (
          SELECT doc_id, n, (n + 3) // 4 AS outn,
                 list_transform(range(0, (n + 3) // 4), j ->
                   list_sum(list_transform(range(j*4, least(j*4+4, n)), r ->
                     samples[CAST(r + 1 AS INTEGER)]))
                   // (least(j*4+4, n) - j*4)) AS pooled
          FROM b)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_in,
               CAST(outn AS BIGINT) AS n_out,
               CAST((8000 + doc_id % 100) // 4 AS INTEGER) AS out_rate,
               CAST(44 + 2 * outn AS BIGINT) AS out_bytes,
               CAST(COALESCE(list_sum(pooled), 0) AS BIGINT) AS sum_amp,
               CAST(COALESCE(list_sum(list_transform(range(0, len(pooled)), p ->
                 pooled[CAST(p + 1 AS INTEGER)] * (1 + p % 97))), 0) AS BIGINT)
                 AS wsum_amp
        FROM g
        ORDER BY doc_id"""),
      "Audio decimation: 4-frame floor-mean pooling (floorDiv == //, exact for " +
        "negative amplitudes) with 16-bit re-encode at rate/4 — out_bytes locks " +
        "the RIFF header math, position-weighted wsum_amp locks every pooled " +
        "sample's slot; the speech-pipeline preprocessing step, fully " +
        "oracle-replayed.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q139
    Q(
      "q139_bmp_flip",
      (s, dir) => {
        // The AUGMENTATION step of multimodal ingest: decode the width-5
        // BMP, mirror horizontally, re-encode, report exact positional
        // stats. sum_px is flip-INVARIANT (a permutation preserves the
        // sum — catches value corruption only), so wsum_px with position
        // weights (1 + i % 97) over the FLIPPED layout carries the real
        // assertion: a flip that didn't happen, reversed channel order,
        // or a stride slip all move bytes to wrongly-weighted positions
        // and break the hash. The oracle re-derives the mirrored layout
        // arithmetically from the text bytes (pixel (r,c) <- byte at
        // r*5 + (4-c), zero beyond the text).
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .flipImageStats(bmpPayloads(docs), "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text)) / 5.0) AS INTEGER)) AS h,
                 $duckBytes AS vals
          FROM documents),
        f AS (
          SELECT doc_id, n, h,
                 list_transform(range(0, 5 * h), p ->
                   CASE WHEN (p // 5) * 5 + (4 - (p % 5)) < n
                        THEN vals[CAST((p // 5) * 5 + (4 - (p % 5)) + 1 AS INTEGER)]
                        ELSE 0 END) AS px
          FROM b)
        SELECT doc_id,
               CAST(5 AS INTEGER) AS in_w,
               CAST(h AS INTEGER) AS in_h,
               CAST(54 + 16 * h AS BIGINT) AS out_bytes,
               CAST(3 * list_sum(px) AS BIGINT) AS sum_px,
               CAST(list_sum(list_transform(range(0, len(px)), p ->
                 px[CAST(p + 1 AS INTEGER)]
                   * (3 + (3*p) % 97 + (3*p + 1) % 97 + (3*p + 2) % 97))) AS BIGINT)
                 AS wsum_px
        FROM f
        ORDER BY doc_id"""),
      "Horizontal-flip augmentation with re-encode: flip-invariant sum_px " +
        "catches value corruption, position-weighted wsum_px over the " +
        "mirrored layout catches a missing flip / channel reversal / stride " +
        "slip; map-only, payloads die in-stage, oracle fully re-derived.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q140
    Q(
      "q140_wav_gain",
      (s, dir) => {
        // Audio gain augmentation with int16 SATURATION: samples are
        // (byte-64)*256 in [-8192, 15872], so gain 3 pushes every byte
        // above ~106 past 32767 and the clamp must engage (wrap-around
        // would flip the sign and wreck wsum_amp). n_clipped counts the
        // saturated samples — the loudness-headroom report an audio
        // pipeline checks before augmenting; out_bytes locks the RIFF
        // header math at the unchanged rate. Map-only; the oracle
        // re-derives scale, clamp, count, and positional sums from the
        // text bytes.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .gainWavStats(wavPayloads(docs), "doc_id", "payload", gain = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v ->
                   least(greatest((v - 64) * 256 * 3, -32768), 32767)) AS scaled,
                 list_transform($duckBytes, v ->
                   CASE WHEN (v - 64) * 256 * 3 > 32767
                          OR (v - 64) * 256 * 3 < -32768 THEN 1 ELSE 0 END) AS clip
          FROM documents)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST(COALESCE(list_sum(clip), 0) AS BIGINT) AS n_clipped,
               CAST(44 + 2 * n AS BIGINT) AS out_bytes,
               CAST(COALESCE(list_sum(scaled), 0) AS BIGINT) AS sum_amp,
               CAST(COALESCE(list_sum(list_transform(range(0, n), p ->
                 scaled[CAST(p + 1 AS INTEGER)] * (1 + p % 97))), 0) AS BIGINT)
                 AS wsum_amp
        FROM b
        ORDER BY doc_id"""),
      "Gain-3 audio augmentation with int16 saturation: n_clipped counts " +
        "engaged clamps (high-ASCII samples exceed 32767 by construction), " +
        "position-weighted wsum_amp locks every scaled sample's slot — " +
        "map-only re-encode, oracle fully re-derived from text bytes.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q150
    Q(
      "q150_image_ahash",
      (s, dir) => {
        // Perceptual average-hash over the DECODED image: the first 48
        // gray pixels (zero-extended past the image end) vote against
        // their own integer floor-mean — the classic image near-dup
        // screen (re-encodes and metadata edits keep the hash where
        // exact-byte dedup misses). 48 bits keeps 2^i exact in a signed
        // long on both engines; the oracle re-derives every bit from the
        // text bytes (pixel i == byte i, zero beyond), so one wrong
        // stride, channel order, or mean-floor slip breaks the hash.
        // Map-only: payloads die inside the stage, 5 fixed-width columns
        // survive.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .imageAhash(bmpPayloads(docs), "doc_id", "payload", nBits = 48)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text)) / 5.0) AS INTEGER)) AS h,
                 $duckBytes AS vals
          FROM documents),
        g AS (
          SELECT doc_id, h,
                 list_transform(range(0, 48), i ->
                   CASE WHEN i < n THEN vals[CAST(i + 1 AS INTEGER)] ELSE 0 END) AS gs
          FROM b),
        m AS (SELECT doc_id, h, gs, list_sum(gs) // 48 AS mean FROM g)
        SELECT doc_id,
               CAST(5 AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(list_sum(list_transform(range(0, 48), i ->
                 CASE WHEN gs[CAST(i + 1 AS INTEGER)] > mean
                      THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
                 AS BIGINT) AS ahash,
               CAST(list_sum(list_transform(range(0, 48), i ->
                 CASE WHEN gs[CAST(i + 1 AS INTEGER)] > mean THEN 1 ELSE 0 END))
                 AS INTEGER) AS n_set
        FROM m
        ORDER BY doc_id"""),
      "48-bit perceptual average-hash from decoded pixels: first-48-gray " +
        "floor-mean vote, every bit oracle-re-derived from the source bytes " +
        "— the image near-dup fingerprint exact-byte dedup can't provide; " +
        "map-only decode, payloads die in-stage."),

    // ---------------------------------------------------------------- q152
    Q(
      "q152_wav_vad",
      (s, dir) => {
        // Frame-level voice-activity detection on the decoded PCM: 32-
        // sample frames (tail dropped), ACTIVE when floor-mean |amp| >=
        // 10500 — spaces sit at |amp| 8192 and lowercase letters span
        // 8448..14848, so only word-dense frames of high-value letters
        // fire and space-heavy frames read as silence (976 of 4538 frames
        // at sf0.001), a non-degenerate frame mix. All-integer frame
        // decisions; the oracle replays Σ|amp|//32 per frame from the
        // text bytes. The speech-ingest pre-filter (what's worth
        // transcribing); map-only, payloads die in-stage.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .wavVadStats(wavPayloads(docs), "doc_id", "payload",
            frameLen = 32, threshold = 10500)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> abs((v - 64) * 256)) AS a
          FROM documents),
        f AS (
          SELECT doc_id, n, n // 32 AS nf,
                 list_transform(range(0, greatest(n // 32, 0)), fr ->
                   CASE WHEN list_sum(list_slice(a,
                          CAST(fr * 32 + 1 AS INTEGER),
                          CAST(fr * 32 + 32 AS INTEGER))) // 32 >= 10500
                        THEN 1 ELSE 0 END) AS act
          FROM b)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(COALESCE(list_sum(act), 0) AS BIGINT) AS n_active,
               CAST(nf - COALESCE(list_sum(act), 0) AS BIGINT) AS n_silent,
               round(CASE WHEN nf = 0 THEN 0.0
                          ELSE CAST(nf - COALESCE(list_sum(act), 0) AS DOUBLE)
                                 / CAST(nf AS DOUBLE) END, 6) AS silence_frac
        FROM f
        ORDER BY doc_id"""),
      "Frame-VAD over decoded 16-bit PCM: 32-sample frames vote active at " +
        "floor-mean |amp| >= 10500 (letters fire, space runs read silent) — " +
        "all-integer frame decisions fully oracle-replayed; the " +
        "transcription-worthiness pre-filter, map-only."),

    // ---------------------------------------------------------------- q172
    Q(
      "q172_image_neardup",
      (s, dir) => {
        // Image NEAR-DUP SCREEN over perceptual hashes — q117's banding
        // family applied to the decoded-pixel fingerprint: the 48-bit
        // aHash splits into 3 x 16-bit bands, so by pigeonhole any pair
        // within Hamming distance 2 shares an intact band (recall 1.0
        // over surviving buckets); candidates verify by exact bit_count
        // and only confirmed pairs (<= 2) are emitted. Perceptual-hash
        // buckets are far hotter than token-simhash buckets (images of
        // the same "template" collapse to few gray profiles), so the
        // q48 stop-shingle discipline applies to BUCKETS: bands with
        // > 25 members are degenerate template buckets, not near-dup
        // signal, and are cut by a broadcast anti-join before the
        // self-join (measured: 464k -> 19k candidates at sf0.1). Scale:
        // decode+hash is map-only, the bucket join is equi-keyed on
        // (band_no, band_val), pair cost is bounded by the cutoff —
        // never corpus².
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val ah = graft.operators.Multimodal
          .imageAhash(bmpPayloads(docs), "doc_id", "payload", nBits = 48)
          .select("doc_id", "ahash")
        val banded = ah.select(col("doc_id"), col("ahash"),
          explode(expr(
            """transform(sequence(0, 2), b ->
                 named_struct('band_no', b, 'band_val', shiftright(ahash, b * 16) & 65535))"""))
            .as("bv"))
          .select(col("doc_id"), col("ahash"),
            col("bv.band_no").as("band_no"), col("bv.band_val").as("band_val"))
        val hot = banded.groupBy("band_no", "band_val")
          .agg(count(lit(1)).as("c")).filter(col("c") > 25)
          .select("band_no", "band_val")
        val cold = banded.join(broadcast(hot), Seq("band_no", "band_val"), "left_anti")
        val a = cold.select(col("doc_id").as("doc_a"), col("ahash").as("ah_a"),
          col("band_no"), col("band_val"))
        val b = cold.select(col("doc_id").as("doc_b"), col("ahash").as("ah_b"),
          col("band_no"), col("band_val"))
        a.join(b, Seq("band_no", "band_val"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "ah_a", "ah_b").distinct()
          .selectExpr("doc_a", "doc_b",
            "cast(bit_count(ah_a ^ ah_b) as integer) as hamming")
          .filter(col("hamming") <= 2)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n, $duckBytes AS vals
          FROM documents),
        g AS (
          SELECT doc_id,
                 list_transform(range(0, 48), i ->
                   CASE WHEN i < n THEN vals[CAST(i + 1 AS INTEGER)] ELSE 0 END) AS gs
          FROM b),
        m AS (SELECT doc_id, gs, list_sum(gs) // 48 AS mean FROM g),
        ah AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 48), i ->
                   CASE WHEN gs[CAST(i + 1 AS INTEGER)] > mean
                        THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
                   AS BIGINT) AS ahash
          FROM m),
        bk AS (
          SELECT doc_id, ahash, band_no,
                 (ahash >> CAST(band_no * 16 AS INTEGER)) & 65535 AS band_val
          FROM ah, (SELECT unnest(range(0, 3)) AS band_no)),
        hot AS (
          SELECT band_no, band_val FROM (
            SELECT band_no, band_val, COUNT(1) AS c FROM bk GROUP BY 1, 2)
          WHERE c > 25),
        cold AS (
          SELECT bk.* FROM bk LEFT JOIN hot USING (band_no, band_val)
          WHERE hot.band_no IS NULL),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.ahash AS ah_a, b.ahash AS ah_b
          FROM cold a JOIN cold b
            ON a.band_no = b.band_no AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(ah_a, ah_b)) AS INTEGER) AS hamming
        FROM pairs
        WHERE bit_count(xor(ah_a, ah_b)) <= 2
        ORDER BY doc_a, doc_b"""),
      "Image near-dup screen: 48-bit perceptual aHash banded 3 x 16 bits " +
        "(pigeonhole recall for Hamming <= 2), degenerate template buckets " +
        "cut by a broadcast anti-join (the stop-shingle discipline applied " +
        "to LSH buckets), candidates verified by exact bit_count — the " +
        "multimodal twin of the token-simhash band screen.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q180
    Q(
      "q180_video_framesample",
      (s, dir) => {
        // The VIDEO leg of multimodal ingest: each doc becomes a container
        // of 1..4 concatenated PPM P6 frames, and the keyframe-extraction
        // step walks REAL frame boundaries (each frame's ASCII header is
        // parsed to find its length — not fixed-stride slicing), samples
        // every 2nd frame, and reports exact integer stats over sampled
        // frames only. wsum_px weights each frame's pixel sum by
        // (1 + frame_no), so sampling the WRONG frames (off-by-one, wrong
        // stride, a header mis-parse skewing the walk) breaks the hash
        // even when the value sum survives. The oracle replays the whole
        // chain — frame count, 47-byte frame size (11-byte header + 36
        // px), per-frame sums from the text bytes — arithmetically.
        // Scale: synth and walk are two fused map-only passes; payloads
        // die in-stage, 7 fixed-width columns survive.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .ppmVideoStats(videoPayloads(docs), "doc_id", "payload", stride = 2)
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 1 + doc_id % 4 AS nf, $duckBytes AS vals
          FROM documents),
        fr AS (
          SELECT doc_id, n, nf,
                 list_transform(range(0, nf), f ->
                   list_sum(list_transform(range(0, 12), i ->
                     vals[CAST((f * 12 + i) % n + 1 AS INTEGER)]))) AS fsums,
                 list_transform(range(0, nf), f ->
                   list_max(list_transform(range(0, 12), i ->
                     vals[CAST((f * 12 + i) % n + 1 AS INTEGER)]))) AS fmaxs
          FROM b)
        SELECT doc_id,
               CAST(nf * 47 AS BIGINT) AS n_bytes,
               CAST(nf AS INTEGER) AS n_frames,
               CAST((nf + 1) // 2 AS INTEGER) AS n_sampled,
               CAST(3 * list_sum(list_transform(range(0, nf), f ->
                 CASE WHEN f % 2 = 0 THEN fsums[CAST(f + 1 AS INTEGER)]
                      ELSE 0 END)) AS BIGINT) AS sum_px,
               CAST(3 * list_sum(list_transform(range(0, nf), f ->
                 CASE WHEN f % 2 = 0 THEN (1 + f) * fsums[CAST(f + 1 AS INTEGER)]
                      ELSE 0 END)) AS BIGINT) AS wsum_px,
               CAST(list_max(list_transform(range(0, nf), f ->
                 CASE WHEN f % 2 = 0 THEN fmaxs[CAST(f + 1 AS INTEGER)]
                      ELSE -1 END)) AS INTEGER) AS max_px
        FROM fr
        ORDER BY doc_id"""),
      "Video frame sampling over a real multi-frame container: concatenated " +
        "PPM P6 frames walked by parsing each header for its length, every " +
        "2nd frame sampled, frame-position-weighted pixel sums locking WHICH " +
        "frames were read — the keyframe-extraction step of video ingest, " +
        "map-only with the oracle replaying the full walk arithmetically."),

    Q(
      "q186_image_sobel",
      (s, dir) => {
        // 2D spatial convolution on decoded image bytes: Sobel L1 edge
        // response per interior pixel — the NEIGHBORHOOD feature class
        // (every other image op here is pointwise or pooling). Edge
        // energy is the classic screen for synthetic/blank/low-detail
        // images in a vision-corpus curation pass. All-integer: the
        // oracle replays the full 3x3 stencil from the source bytes, so
        // one wrong neighbor index, padding byte, or BMP row-stride slip
        // breaks the hash; wsum_grad pins every interior pixel to its
        // row-major slot. Map-only fused decode -> convolve; payloads
        // die in-stage.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .bmpSobelStats(bmpPayloads(docs), "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some {
        // pixel (r, c) of the zero-padded 5-wide gray grid, 1-based list
        // index; j walks the interior row-major: r = j//3 + 1, c = j%3 + 1
        def pix(dr: Int, dc: Int) =
          s"px[CAST((j // 3 + 1 + ($dr)) * 5 + (j % 3 + 1 + ($dc)) + 1 AS INTEGER)]"
        val gx = s"((${pix(-1, 1)} + 2 * ${pix(0, 1)} + ${pix(1, 1)}) - " +
          s"(${pix(-1, -1)} + 2 * ${pix(0, -1)} + ${pix(1, -1)}))"
        val gy = s"((${pix(1, -1)} + 2 * ${pix(1, 0)} + ${pix(1, 1)}) - " +
          s"(${pix(-1, -1)} + 2 * ${pix(-1, 0)} + ${pix(-1, 1)}))"
        s"""
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text)) / 5.0) AS BIGINT)) AS h,
                 $duckBytes AS vals
          FROM documents),
        p AS (
          SELECT doc_id, h,
                 list_transform(range(0, 5 * h), i ->
                   CASE WHEN i < n THEN vals[CAST(i + 1 AS INTEGER)] ELSE 0 END) AS px
          FROM b),
        m AS (
          SELECT doc_id, h,
                 list_transform(range(0, CASE WHEN h >= 3 THEN 3 * (h - 2) ELSE 0 END),
                   j -> abs($gx) + abs($gy)) AS mags,
                 list_transform(range(0, CASE WHEN h >= 3 THEN 3 * (h - 2) ELSE 0 END),
                   j -> (abs($gx) + abs($gy)) * (1 + j % 97)) AS wmags
          FROM p)
        SELECT doc_id,
               CASE WHEN h >= 3 THEN 3 * (h - 2) ELSE CAST(0 AS BIGINT) END AS n_interior,
               CAST(coalesce(list_sum(mags), 0) AS BIGINT) AS edge_energy,
               CAST(coalesce(list_max(mags), 0) AS INTEGER) AS max_grad,
               CAST(coalesce(list_sum(wmags), 0) AS BIGINT) AS wsum_grad
        FROM m
        ORDER BY doc_id"""
      },
      "Sobel L1 edge energy from decoded pixels — 2D neighborhood " +
        "convolution, the low-detail/blank-image screen of vision-corpus " +
        "curation; the oracle replays the full 3x3 stencil including the " +
        "zero-padded tail row, so neighbor indexing and BMP row stride are " +
        "both locked; map-only, payloads die in-stage.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q208
    Q(
      "q208_video_motion",
      (s, dir) => {
        // The TEMPORAL feature of the video leg (q180 walks frames, this
        // differences them): per-video sum of absolute pixel differences
        // between consecutive PPM frames — the block-matching SAD
        // primitive; static scenes read 0, cuts read large, and the
        // dead-video screen drops payloads whose every pair is silent.
        // wsad weights pair p by (1 + p % 97), so right totals from wrong
        // pair positions cannot pass. The oracle replays every pair's
        // SAD from the position-derived frame bytes arithmetically.
        // Scale: synth + walk fuse into one map-only pass; only the 6
        // fixed-width columns survive the stage.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .ppmMotionStats(videoPayloads(docs), "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 1 + doc_id % 4 AS nf, $duckBytes AS vals
          FROM documents),
        ps AS (
          SELECT doc_id, n, nf,
                 list_transform(range(0, nf - 1), p ->
                   3 * list_sum(list_transform(range(0, 12), i ->
                     abs(vals[CAST(((p + 1) * 12 + i) % n + 1 AS INTEGER)]
                         - vals[CAST((p * 12 + i) % n + 1 AS INTEGER)])))) AS psads
          FROM b)
        SELECT doc_id,
               CAST(nf AS INTEGER) AS n_frames,
               CAST(nf - 1 AS INTEGER) AS n_pairs,
               CAST(coalesce(list_sum(psads), 0) AS BIGINT) AS sad_sum,
               CAST(coalesce(list_sum(list_transform(range(0, nf - 1), p ->
                 (1 + p % 97) * psads[CAST(p + 1 AS INTEGER)])), 0) AS BIGINT) AS wsad_sum,
               CAST(coalesce(list_max(psads), 0) AS BIGINT) AS max_pair_sad
        FROM ps
        ORDER BY doc_id"""),
      "Video motion energy: consecutive-frame SAD over the real PPM " +
        "container walk (the codec block-matching primitive) with pair-" +
        "position weights — scene-change vs static-video separation, " +
        "fully oracle-replayed; map-only, payloads die in-stage.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q210
    Q(
      "q210_audio_spectrum",
      (s, dir) => {
        // The FREQUENCY-DOMAIN audio feature class with exact
        // arithmetic: 8-point DFT per frame over decoded PCM, keeping
        // the bins whose twiddle factors are all 0/+-1 — DC (k=0), mid
        // band (k=2), Nyquist (k=4) — so every energy is an exact
        // INTEGER: e0 = (sum x)^2, e2 = (x0-x2+x4-x6)^2 +
        // (x1-x3+x5-x7)^2, e4 = (sum (-1)^n x)^2. hf_frames counts
        // frames whose Nyquist energy beats DC (rapid sample
        // alternation - the aliasing/noise census); we4 weights each
        // frame's e4 by (1 + frame_no), locking frame positions. The
        // oracle replays every frame's three bins from the position-
        // derived sample bytes. Map-only; payloads die in-stage.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .wavSpectralStats(wavPayloads(docs), "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> (v - 64) * 256) AS x
          FROM documents),
        fr AS (
          SELECT doc_id, n // 8 AS nf,
                 list_transform(range(0, n // 8), p ->
                   list_sum(list_transform(range(0, 8),
                     i -> x[CAST(p * 8 + i + 1 AS INTEGER)]))) AS ss,
                 list_transform(range(0, n // 8), p ->
                   x[CAST(p * 8 + 1 AS INTEGER)] - x[CAST(p * 8 + 3 AS INTEGER)]
                   + x[CAST(p * 8 + 5 AS INTEGER)] - x[CAST(p * 8 + 7 AS INTEGER)]) AS re2,
                 list_transform(range(0, n // 8), p ->
                   - x[CAST(p * 8 + 2 AS INTEGER)] + x[CAST(p * 8 + 4 AS INTEGER)]
                   - x[CAST(p * 8 + 6 AS INTEGER)] + x[CAST(p * 8 + 8 AS INTEGER)]) AS im2,
                 list_transform(range(0, n // 8), p ->
                   list_sum(list_transform(range(0, 8),
                     i -> CASE WHEN i % 2 = 0
                               THEN x[CAST(p * 8 + i + 1 AS INTEGER)]
                               ELSE -x[CAST(p * 8 + i + 1 AS INTEGER)] END))) AS alts
          FROM b),
        e AS (
          SELECT doc_id, nf,
                 list_transform(range(0, nf), p ->
                   ss[CAST(p + 1 AS INTEGER)] * ss[CAST(p + 1 AS INTEGER)]) AS f0,
                 list_transform(range(0, nf), p ->
                   re2[CAST(p + 1 AS INTEGER)] * re2[CAST(p + 1 AS INTEGER)]
                   + im2[CAST(p + 1 AS INTEGER)] * im2[CAST(p + 1 AS INTEGER)]) AS f2,
                 list_transform(range(0, nf), p ->
                   alts[CAST(p + 1 AS INTEGER)] * alts[CAST(p + 1 AS INTEGER)]) AS f4
          FROM fr)
        SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
               CAST(coalesce(list_sum(f0), 0) AS BIGINT) AS e0_sum,
               CAST(coalesce(list_sum(f2), 0) AS BIGINT) AS e2_sum,
               CAST(coalesce(list_sum(f4), 0) AS BIGINT) AS e4_sum,
               CAST(coalesce(list_sum(list_transform(range(0, nf), p ->
                 CASE WHEN f4[CAST(p + 1 AS INTEGER)] > f0[CAST(p + 1 AS INTEGER)]
                      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS hf_frames,
               CAST(coalesce(list_sum(list_transform(range(0, nf), p ->
                 (1 + p % 97) * f4[CAST(p + 1 AS INTEGER)])), 0) AS BIGINT) AS we4_sum
        FROM e
        ORDER BY doc_id"""),
      "Integer spectral energies from decoded PCM: per-frame 8-point DFT " +
        "bins k in {0,2,4} (twiddles all 0/+-1, so energies are exact " +
        "integers) — DC vs mid vs Nyquist separation, high-frequency " +
        "frame census, position-weighted checksum; the frequency-domain " +
        "feature class fully oracle-replayed. Map-only.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q225
    Q(
      "q225_png_decode",
      (s, dir) => {
        // The fourth real container — PNG, the web-scrape image format:
        // text bytes become width-4 pixels whose channel count cycles
        // 1/2/3/4 by doc_id (grayscale, gray+alpha, RGB, RGBA — all four
        // direct color types), encoded through
        // MediaCodecs.encodePng with row filter y % 5 (all FIVE PNG
        // filters in every image — height is floored at 5), zlib-deflated,
        // CRC-stamped; decodePng walks chunks, checks CRCs, inflates, and
        // reverses the filters. The oracle re-derives every stat
        // arithmetically from the text bytes (it never sees PNG bytes, so
        // the whole deflate+filter round trip must be byte-exact);
        // wsum_px's position weights mean a single mis-reversed filter
        // row shifts bytes and fails the hash. Deliberately no n_bytes:
        // compressed length is compressor detail, not decode contract.
        // Scale: synth + decode fuse into one map-only pass; payloads die
        // in-stage, 7 fixed-width columns survive.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .pngStats(pngPayloads(docs), "doc_id", "payload")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 CAST(1 + doc_id % 4 AS INTEGER) AS c,
                 $duckBytes AS vals
          FROM documents),
        g AS (
          SELECT doc_id, n, c,
                 greatest(5, CAST(ceil(n / (4.0 * c)) AS INTEGER)) AS h
          FROM b),
        px AS (
          SELECT doc_id, n, c, h,
                 list_transform(range(0, 4 * h * c), i ->
                   vals[CAST(i % greatest(n, 1) + 1 AS INTEGER)]) AS p
          FROM g JOIN b USING (doc_id, n, c))
        SELECT doc_id,
               CASE WHEN n = 0 THEN NULL ELSE CAST(4 AS INTEGER) END AS width,
               CASE WHEN n = 0 THEN NULL ELSE CAST(h AS INTEGER) END AS height,
               CASE WHEN n = 0 THEN NULL ELSE c END AS channels,
               CASE WHEN n = 0 THEN NULL ELSE CAST(list_sum(p) AS BIGINT) END AS sum_px,
               CASE WHEN n = 0 THEN NULL ELSE
                 CAST(list_sum(list_transform(range(0, len(p)), i ->
                   (1 + i % 97) * p[CAST(i + 1 AS INTEGER)])) AS BIGINT) END AS wsum_px,
               CASE WHEN n = 0 THEN NULL ELSE CAST(list_max(p) AS INTEGER) END AS max_px
        FROM px
        ORDER BY doc_id"""),
      "Real PNG decode: text bytes as width-4 pixels cycling all four " +
        "direct color types by doc_id (color type " +
        "alternating by doc parity), encoded with all five row filters, " +
        "zlib-deflated, CRC-stamped — decoded back through chunk walk + " +
        "inflate + filter reversal; position-weighted wsum_px locks every " +
        "byte to its place, all stats re-derived arithmetically by the " +
        "oracle from text alone. Map-only, payloads die in-stage.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q230
    Q(
      "q230_gif_decode",
      (s, dir) => {
        // The fifth real container — GIF, the only mainstream image format
        // whose COMPRESSION layer (12-bit-capped variable-width LZW with
        // clear/EOI codes and LSB-first bit packing) is zero-dependency
        // decodable. Text bytes become width-6 palette indices in a
        // GIF89a with an arithmetic 128-entry color table; decodeGif
        // walks blocks, reassembles sub-blocks, LZW-decompresses, and
        // expands the palette. The oracle re-derives every stat from text
        // bytes alone (it never sees GIF bytes): wsum_idx position-weights
        // raw indices, so a single LZW width-schedule slip shifts every
        // later pixel and fails the hash; sum_rgb runs the indices through
        // the palette arithmetic, locking the color-table bytes too.
        // Scale: synth + decode fuse into one map-only pass; payloads die
        // in-stage, 7 fixed-width columns survive.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Multimodal
          .gifStats(gifPayloads(docs), "doc_id", "payload")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 $duckBytes AS vals
          FROM documents),
        g AS (
          SELECT doc_id, n,
                 greatest(1, CAST(ceil(n / 6.0) AS INTEGER)) AS h
          FROM b),
        px AS (
          SELECT doc_id, n, h,
                 list_transform(range(0, 6 * h), i ->
                   vals[CAST(i % greatest(n, 1) + 1 AS INTEGER)]) AS p
          FROM g JOIN b USING (doc_id, n))
        SELECT doc_id,
               CASE WHEN n = 0 THEN NULL ELSE CAST(6 AS INTEGER) END AS width,
               CASE WHEN n = 0 THEN NULL ELSE CAST(h AS INTEGER) END AS height,
               CASE WHEN n = 0 THEN NULL ELSE CAST(128 AS INTEGER) END AS n_colors,
               CASE WHEN n = 0 THEN NULL ELSE
                 CAST(list_sum(list_transform(p, v ->
                   v + (3 * v) % 256 + (7 * v) % 251)) AS BIGINT) END AS sum_rgb,
               CASE WHEN n = 0 THEN NULL ELSE
                 CAST(list_sum(list_transform(range(0, len(p)), i ->
                   (1 + i % 97) * p[CAST(i + 1 AS INTEGER)])) AS BIGINT) END AS wsum_idx,
               CASE WHEN n = 0 THEN NULL ELSE CAST(list_max(p) AS INTEGER) END AS max_idx
        FROM px
        ORDER BY doc_id"""),
      "Real GIF decode: text bytes as width-6 palette indices LZW-" +
        "compressed into a GIF89a with an arithmetic 128-entry color " +
        "table, decoded back through block walk + sub-block reassembly + " +
        "variable-width LZW + palette expansion — the position-weighted " +
        "index checksum locks every pixel to its place and the RGB sum " +
        "locks the color table, all re-derived by the oracle from text " +
        "alone. Map-only, payloads die in-stage."),

    // ---------------------------------------------------------------- q282
    Q(
      "q282_jpeg_stats",
      (s, dir) => {
        // Real BASELINE JPEG decode — the dominant web image format,
        // closing the crawl-realism gap beside PNG/GIF/BMP/PPM: each
        // doc's text bytes become DC coefficients of a 4-blocks-wide
        // grayscale JPEG (block b = text byte -> DC (b%64 - 32)*8 under
        // the all-8s quant table -> decoded block EXACTLY b%64 + 96;
        // tail padded with 128-blocks), Huffman-encoded with the Annex K
        // tables, then decoded back through the FULL pipeline (marker
        // walk, canonical Huffman, DC prediction, dequant + IDCT, level
        // shift) AND dispatched through RealMediaDecoder (format code
        // 6). The oracle re-derives width/height/sums/extremes/mean from
        // text alone — any slip in either the encoder or decoder (a
        // Huffman code, a predictor, one IDCT constant) shifts a block
        // value and breaks the row. Map-only, payloads die in-stage.
        val docs = Tables.spreadSmall(s, dir, "documents",
          table(s, dir, "documents").select("doc_id", "text"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("fmt_code", IntegerType, nullable = false),
          StructField("width", IntegerType, nullable = false),
          StructField("height", IntegerType, nullable = false),
          StructField("px_sum", LongType, nullable = false),
          StructField("px_min", IntegerType, nullable = false),
          StructField("px_max", IntegerType, nullable = false),
          StructField("mean_px", DoubleType, nullable = false)))
        implicit val enc = RowEncoder.encoderFor(outSchema)
        val idIdx = docs.schema.fieldIndex("doc_id")
        val textIdx = docs.schema.fieldIndex("text")
        docs.mapPartitions { rows =>
          val dec = new graft.operators.Multimodal.RealMediaDecoder(5)
          rows.map { r =>
            val id = r.getLong(idIdx)
            val bytes = r.getString(textIdx).getBytes("UTF-8")
            val pad = (4 - bytes.length % 4) % 4
            val vals = new Array[Int](bytes.length + pad)
            var i = 0
            while (i < bytes.length) {
              vals(i) = ((bytes(i) & 0x3f) - 32) * 8
              i += 1
            }
            val payload = graft.operators.MediaCodecs.encodeJpegGrayDc(vals, 4)
            val img = graft.operators.MediaCodecs.decodeJpeg(payload)
            val code = dec.decode(payload)(0).toInt
            var sum = 0L
            var mn = 255
            var mx = 0
            var k = 0
            while (k < img.rgb.length) {
              val v = img.rgb(k) & 0xff
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              k += 1
            }
            Row(id, code, img.width, img.height, sum, mn, mx,
              BigDecimal(sum.toDouble / img.rgb.length)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }.transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> v % 64 + 96) AS px
          FROM documents),
        g AS (
          SELECT doc_id, n, px,
                 CAST((4 - n % 4) % 4 AS INTEGER) AS pad,
                 CAST(8 * ((n + (4 - n % 4) % 4) / 4) AS INTEGER) AS h
          FROM b),
        st AS (
          SELECT doc_id, pad, h,
                 CAST(3 * 64 * (list_sum(px) + 128 * pad) AS BIGINT) AS px_sum,
                 CAST(CASE WHEN pad > 0 THEN least(list_min(px), 128)
                           ELSE list_min(px) END AS INTEGER) AS px_min,
                 CAST(CASE WHEN pad > 0 THEN greatest(list_max(px), 128)
                           ELSE list_max(px) END AS INTEGER) AS px_max
          FROM g)
        SELECT doc_id, CAST(6 AS INTEGER) AS fmt_code,
               CAST(32 AS INTEGER) AS width, h AS height,
               px_sum, px_min, px_max,
               round(CAST(px_sum AS DOUBLE) / (32 * h * 3), 6) AS mean_px
        FROM st ORDER BY doc_id"""),
      "Baseline JPEG end to end: text-derived DC-only blocks Huffman-" +
        "encoded with the Annex K tables, decoded back through marker " +
        "walk + canonical Huffman + DC prediction + dequant + IDCT + " +
        "level shift, dispatched via RealMediaDecoder magic (code 6); " +
        "the oracle re-derives every stat arithmetically from text."),

    // ---------------------------------------------------------------- q288
    Q(
      "q288_jpeg_progressive_stats",
      (s, dir) => {
        // PROGRESSIVE (SOF2) JPEG decode through the full pipeline — the
        // format the majority of large web JPEGs actually use (the r9
        // verdict's gap: a crawl's image stats skipped it). Each doc's
        // text bytes become quantized DC coefficients of a 6-blocks-wide
        // grayscale image encoded as a REAL multi-scan progressive
        // stream: DC first (Al=1), DC refinement, AC first over the
        // empty band (pure EOB-run coding), AC refinement, restart
        // markers every 3 blocks — then decoded back through the SOF2
        // path (coefficient accumulation across scans, successive-
        // approximation bit assembly, EOB runs, restarts, at-EOI IDCT)
        // and dispatched through RealMediaDecoder. Blocks stay DC-only
        // so the oracle re-derives every stat arithmetically from text
        // (the q282 discipline; AC-content progressive correctness is
        // locked by the baseline-equality property specs). Map-only;
        // payloads die in-stage.
        val docs = Tables.spreadSmall(s, dir, "documents",
          table(s, dir, "documents").select("doc_id", "text"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("fmt_code", IntegerType, nullable = false),
          StructField("width", IntegerType, nullable = false),
          StructField("height", IntegerType, nullable = false),
          StructField("px_sum", LongType, nullable = false),
          StructField("px_min", IntegerType, nullable = false),
          StructField("px_max", IntegerType, nullable = false),
          StructField("mean_px", DoubleType, nullable = false)))
        implicit val enc = RowEncoder.encoderFor(outSchema)
        val idIdx = docs.schema.fieldIndex("doc_id")
        val textIdx = docs.schema.fieldIndex("text")
        docs.mapPartitions { rows =>
          val dec = new graft.operators.Multimodal.RealMediaDecoder(5)
          rows.map { r =>
            val id = r.getLong(idIdx)
            val bytes = r.getString(textIdx).getBytes("UTF-8")
            val pad = (6 - bytes.length % 6) % 6
            val blocks = Array.tabulate(bytes.length + pad) { i =>
              val b = new Array[Int](64)
              b(0) = if (i < bytes.length) (bytes(i) & 0x3f) - 32 else 0
              b
            }
            val payload = graft.operators.MediaCodecs
              .encodeJpegGrayProgressive(blocks, 6, dcAl = 1, acAl = 1, driEvery = 3)
            val img = graft.operators.MediaCodecs.decodeJpeg(payload)
            val code = dec.decode(payload)(0).toInt
            var sum = 0L
            var mn = 255
            var mx = 0
            var k = 0
            while (k < img.rgb.length) {
              val v = img.rgb(k) & 0xff
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              k += 1
            }
            Row(id, code, img.width, img.height, sum, mn, mx,
              BigDecimal(sum.toDouble / img.rgb.length)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }.transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n,
                 list_transform($duckBytes, v -> v % 64 + 96) AS px
          FROM documents),
        g AS (
          SELECT doc_id, n, px,
                 CAST((6 - n % 6) % 6 AS INTEGER) AS pad,
                 CAST(8 * ((n + (6 - n % 6) % 6) / 6) AS INTEGER) AS h
          FROM b),
        st AS (
          SELECT doc_id, pad, h,
                 CAST(3 * 64 * (list_sum(px) + 128 * pad) AS BIGINT) AS px_sum,
                 CAST(CASE WHEN pad > 0 THEN least(list_min(px), 128)
                           ELSE list_min(px) END AS INTEGER) AS px_min,
                 CAST(CASE WHEN pad > 0 THEN greatest(list_max(px), 128)
                           ELSE list_max(px) END AS INTEGER) AS px_max
          FROM g)
        SELECT doc_id, CAST(6 AS INTEGER) AS fmt_code,
               CAST(48 AS INTEGER) AS width, h AS height,
               px_sum, px_min, px_max,
               round(CAST(px_sum AS DOUBLE) / (48 * h * 3), 6) AS mean_px
        FROM st ORDER BY doc_id"""),
      "Progressive (SOF2) JPEG end to end: multi-scan successive-" +
        "approximation streams (DC first + refine, EOB-run AC band " +
        "scans, restart markers) decoded through coefficient " +
        "accumulation and at-EOI IDCT, dispatched via RealMediaDecoder; " +
        "the oracle re-derives every stat arithmetically from text.")
  )

  /** (doc_id, payload): each document's UTF-8 bytes as a width-4 PNG —
    * channel count cycling 1/2/3/4 by doc_id (grayscale, gray+alpha,
    * RGB, RGBA — all four direct color types exercised);
    * height `max(5, ceil(n / (4 * channels)))` so every image carries all
    * five row filters (encodePng uses filter `y % 5`); flattened pixel
    * byte i is `text[i % n]` (modular wrap — every stat derivable from
    * text arithmetic alone). Null/empty text -> null payload. */
  private def pngPayloads(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = r.getString(textIdx)
        if (text == null || text.isEmpty) Row(id, null)
        else {
          val bytes = text.getBytes("UTF-8")
          val n = bytes.length
          val channels = 1 + (id % 4).toInt
          val width = 4
          val height = math.max(5,
            math.ceil(n / (width.toDouble * channels)).toInt)
          val pix = new Array[Byte](width * height * channels)
          var i = 0
          while (i < pix.length) {
            pix(i) = bytes(i % n)
            i += 1
          }
          Row(id, graft.operators.MediaCodecs.encodePng(width, height, channels, pix))
        }
      }
    }
  }

  /** (doc_id, payload): each document's UTF-8 bytes as width-6 palette
    * indices (wrapping via i % n) in a real single-frame GIF89a with a
    * 128-entry global color table whose entry i is
    * (i, (3*i) % 256, (7*i) % 251) — the palette itself is arithmetic, so
    * the oracle re-derives decoded RGB sums from text bytes alone. */
  private def gifPayloads(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      val palette = new Array[Byte](3 * 128)
      var e = 0
      while (e < 128) {
        palette(3 * e) = e.toByte
        palette(3 * e + 1) = ((3 * e) % 256).toByte
        palette(3 * e + 2) = ((7 * e) % 251).toByte
        e += 1
      }
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = r.getString(textIdx)
        if (text == null || text.isEmpty) Row(id, null)
        else {
          val bytes = text.getBytes("UTF-8")
          val n = bytes.length
          val width = 6
          val height = math.max(1, (n + width - 1) / width)
          val indices = new Array[Byte](width * height)
          var i = 0
          while (i < indices.length) {
            indices(i) = bytes(i % n)
            i += 1
          }
          Row(id, graft.operators.MediaCodecs.encodeGif(width, height, indices, palette))
        }
      }
    }
  }
}
