package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING sequence packing under a frozen tokenizer — the live tail of
 * the tensor-delivery chain: a production pipeline trains the tokenizer
 * once offline (q285), packs and ships the historical corpus in batch
 * ([[graft.operators.Packer.packTokenIds]] -> writeTokenContexts), and
 * then documents KEEP ARRIVING. This operator continues the committed id
 * stream over the live ingest: each closed micro-batch encodes under the
 * frozen spec (stateless expression — the streaming plan is the batch
 * plan), packs CONTINUED from the committed position
 * ([[graft.operators.Packer.packTokenIdsContinued]]), emits the full
 * ctx-windows, and carries the partial tail forward.
 *
 * Scale shape: all heavy work (offsets, fragment explode, equi-shuffle
 * reassembly) runs the batch packer's two-phase distributed plan on each
 * micro-batch; what crosses batches is [[PackPosition]] — two counters
 * and at most `ctxLen - 1` carried ids. Window numbering is globally
 * continuous: the stream's windows are BIT-IDENTICAL to what one batch
 * run over the concatenated corpus would produce (the parity law
 * `PackStreamsSpec` locks), so a consumer cannot tell whether a shard
 * was packed live or offline.
 *
 * Ordering contract: packing is defined over a total document order, so
 * each batch's keys must all EXCEED every previously packed key (the
 * append-only ingest-tail contract — a monotone file sequence, a log
 * offset, an assigned ingest id). Violations fail loudly via
 * [[PackPosition.lastOrd]]; they cannot be silently reordered without
 * keeping every historical key.
 */
object PackStreams {

  /** The committed position of a packed token stream: `nextSeq` full
    * windows are already delivered, `carry` (length < ctxLen) holds the
    * partial tail window `nextSeq`, and `lastOrd` is the largest packed
    * order key (the monotone-ingest guard). O(ctxLen) state — this is
    * what a restart persists, NOT data. */
  final case class PackPosition(nextSeq: Long, carry: Seq[Int], lastOrd: Long)

  /** The position of an empty stream. */
  val Start: PackPosition = PackPosition(0L, Nil, Long.MinValue)

  /**
   * Pack ONE closed micro-batch against a committed position. Returns
   * the FULL windows to deliver (globally-numbered `seq`, exactly
   * `ctxLen` ids each) and the advanced position. The partial tail is
   * NOT emitted — it is not yet immutable (the next batch extends it);
   * it rides in the returned position. The tail extraction is a bounded
   * collect: at most one window, at most `ctxLen - 1` ids.
   */
  def packClosedBatch(
      batch: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      pos: PackPosition): (DataFrame, PackPosition) = {
    val spark = batch.sparkSession
    if (batch.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("seq",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_ids",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("ids",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType), nullable = false))))
      return (empty, pos)
    }
    // monotone-ingest guard: one tiny aggregate, fails loudly before any
    // window could silently land out of order
    val r = batch.agg(
      min(col(orderCol).cast("long")), max(col(orderCol).cast("long"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    require(lo > pos.lastOrd,
      s"PackStreams: batch order keys start at $lo but ${pos.lastOrd} is " +
        "already packed — the ingest tail must be append-only in the order column")
    val win = graft.operators.Packer
      .packTokenIdsContinued(batch, orderCol, idsCol, ctxLen, eosId,
        pos.nextSeq, pos.carry)
      .localCheckpoint(true) // read twice: full-window emit + tail extract
    val full = win.filter(col("n_ids") === ctxLen)
    val tail = win.filter(col("n_ids") < ctxLen)
      .select("seq", "ids").collect()
    val next = tail.headOption match {
      case Some(t) =>
        PackPosition(t.getLong(0), t.getSeq[Int](1), hi)
      case None =>
        // the batch landed exactly on a window boundary
        PackPosition(win.agg(max("seq")).head().getLong(0) + 1, Nil, hi)
    }
    (full, next)
  }

  /**
   * Attach continuation packing to a STREAMING document frame via
   * `foreachBatch`: every micro-batch packs against the committed
   * position and `deliver` receives (full windows, batchId) — typically
   * a `writeTokenContexts`-style sharded append. Returns the running
   * query and a position accessor (what a checkpointing deployment
   * would persist alongside the sink commit).
   */
  def packStream(
      docs: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      start: PackPosition = Start)(
      deliver: (DataFrame, Long) => Unit): (StreamingQuery, () => PackPosition) = {
    val ref = new AtomicReference[PackPosition](start)
    val q = docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: java.lang.Long) =>
        val (full, next) = packClosedBatch(
          b.toDF(), orderCol, idsCol, ctxLen, eosId, ref.get)
        deliver(full, id)
        ref.set(next)
      }
      .start()
    (q, () => ref.get)
  }
}
