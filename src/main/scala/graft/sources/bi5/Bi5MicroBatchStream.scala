package graft.sources.bi5

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/**
 * Micro-batch streaming over a growing bi5 tree: each trigger picks up hour
 * files that appeared since the last processed offset. The natural workflow
 * for this format — Dukascopy publishes one `<hh>h_ticks.bi5` per hour — so
 * `spark.readStream.format("bi5")` tails the directory.
 *
 * Offset model: the (derived hour base, path) KEY of the last processed
 * file, with files totally ordered by that key. A batch covers the key range
 * `(start, end]`, so the assignment of files to batches is a pure predicate
 * on the key — stable under listing shifts. Two deliberate choices:
 *
 *  - Ordering by the PATH-DERIVED HOUR TIMESTAMP (path as tiebreak), not the
 *    raw path: the layout regex admits unpadded components (`9h_ticks.bi5`),
 *    and lexicographic path order would sort hour 10 BEFORE hour 9 — newly
 *    published files would land behind the committed offset and be silently
 *    skipped. Event-time order is publication order for this format.
 *  - Not a count-based offset (index into the sorted list): a back-filled
 *    file arriving behind the cursor renumbers every index after it, and
 *    retention deleting a processed file shifts indices down — both re-emit
 *    or lose files. With key ranges, a late file sorting inside a *future*
 *    batch's range is simply processed then; only files at-or-before the
 *    committed offset are skipped (same contract as Spark's file source
 *    without `latestFirst`).
 *
 * Admission control: `maxFilesPerTrigger` bounds each batch, so starting a
 * stream over years of history progresses in resumable increments instead of
 * one giant batch 0.
 *
 * Batch readers (row + columnar) are reused verbatim — identical
 * decode/skip-corrupt semantics in both execution modes.
 */
class Bi5MicroBatchStream(
    opts: Bi5Options,
    required: StructType,
    filters: Array[Filter],
    checkpointLocation: String,
    store: Bi5Store)
    extends MicroBatchStream
    with SupportsAdmissionControl {

  /** All decodable-layout files keyed by (hour base micros, path) at or after
    * the given hour base, sorted. The listing itself is PRUNED by the
    * committed hour: day/month/year directories whose names prove every file
    * inside sorts before `minBaseMicros` are never enumerated, so an idle
    * tail re-lists the frontier, not the archive. Files whose path doesn't
    * parse can't produce rows (skip-corrupt) and carry no event time, so
    * they are excluded from the stream. */
  private def listSorted(minBaseMicros: Long): Vector[(Long, String)] =
    Bi5FileLister.listBi5FilesSince(store, opts.path, minBaseMicros, opts.monthOffset)
      .filter { case (p, _) => Bi5FilePruner.mayMatch(p, opts.monthOffset, filters) }
      .flatMap { case (p, _) =>
        Bi5PathMeta.parse(p, opts.monthOffset).map(m => (m.baseEpochMicros, p))
      }
      .sorted
      .toVector

  private def key(o: Offset): (Long, String) = {
    val s = o.asInstanceOf[Bi5StreamOffset]
    (s.baseMicros, s.lastPath)
  }

  private def gt(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  override def initialOffset(): Offset = Bi5StreamOffset.Initial

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (opts.maxFilesPerTrigger > 0) ReadLimit.maxFiles(opts.maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = key(start)
    val pending = listSorted(from._1).filter(gt(_, from))
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _               => pending
    }
    if (capped.isEmpty) start
    else Bi5StreamOffset(capped.last._1, capped.last._2)
  }

  override def deserializeOffset(json: String): Offset = Bi5StreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = key(start)
    val to = key(end)
    val newFiles = listSorted(from._1).filter(k => gt(k, from) && !gt(k, to))
    // one partition per arriving hour file: hour files are small (a few MB
    // compressed), and per-file tasks keep latency low per trigger
    newFiles.map { case (_, f) => Bi5Partition(Array(f), walk = false): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Bi5PartitionReaderFactory(opts, required, filters, store)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Checkpoint offset: `<hourBaseMicros>|<path>` of the last processed file
  * (empty string = nothing processed yet). */
case class Bi5StreamOffset(baseMicros: Long, lastPath: String) extends Offset {
  // NB: the Offset base class implements equals() by comparing json()
  // strings, so json() must never itself compare offsets (infinite mutual
  // recursion) — test the sentinel FIELDS directly.
  override def json(): String =
    if (baseMicros == Long.MinValue && lastPath.isEmpty) "" else s"$baseMicros|$lastPath"
}

object Bi5StreamOffset {
  val Initial: Bi5StreamOffset = Bi5StreamOffset(Long.MinValue, "")

  /** Strict parse: an unrecognized offset (e.g. a checkpoint written by a
    * different source or format revision) must fail LOUDLY — accepting it
    * as a path would silently stall or re-read the stream forever. */
  def fromJson(json: String): Bi5StreamOffset = {
    if (json.isEmpty) return Initial
    val sep = json.indexOf('|')
    if (sep > 0) {
      try return Bi5StreamOffset(json.substring(0, sep).toLong, json.substring(sep + 1))
      catch { case _: NumberFormatException => }
    }
    throw new IllegalStateException(
      s"Unrecognized bi5 streaming offset '$json' (expected '<epochMicros>|<path>'); " +
        "the checkpoint was written by an incompatible version — restart the query " +
        "with a fresh checkpointLocation.")
  }
}
