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
 * iteration (no full-partition materialization), output row shape. The
 * actual media decoding is a pluggable [[MediaDecoder]]; the container has
 * no image/audio libraries, so [[RealMediaDecoder]] is an explicit stub and
 * [[FakeMediaDecoder]] provides a deterministic byte-derived feature vector
 * so the pipeline is end-to-end testable.
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
   * STUB: real image/audio decode (JPEG -> pixels -> embedding, PCM ->
   * mel-spectrogram, ...). The required native/media libraries are not
   * available in this environment; wire a real implementation here when they
   * are. Everything around it (schema, partitioning, batching) is live.
   */
  final class RealMediaDecoder(val dim: Int) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] =
      throw new UnsupportedOperationException(
        "Real media decoding is stubbed in this environment; use FakeMediaDecoder")
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
