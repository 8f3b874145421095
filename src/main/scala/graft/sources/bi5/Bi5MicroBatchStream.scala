package graft.sources.bi5

import java.nio.file.Paths

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
 * Offset model: the PATH of the last processed file, with files ordered by
 * sorted absolute path. A batch covers the path range `(start, end]`, so the
 * assignment of files to batches is a pure predicate on the path — stable
 * under listing shifts. A count-based offset (index into the sorted list)
 * would re-emit or skip files whenever the listing shifts: a back-filled
 * file arriving behind the cursor renumbers every index after it, and
 * retention deleting a processed file shifts indices down. With path ranges,
 * a late file sorting inside `(start, end]` of a *future* batch is simply
 * processed then; only files sorting at-or-before the committed offset are
 * skipped (same contract as Spark's file source without `latestFirst`).
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
    checkpointLocation: String)
    extends MicroBatchStream
    with SupportsAdmissionControl {

  private def listSorted(): Vector[String] =
    Bi5FileLister.listBi5Files(Paths.get(opts.path))
      .filter { case (p, _) => Bi5FilePruner.mayMatch(p, opts.monthOffset, filters) }
      .map(_._1)
      .sorted
      .toVector

  override def initialOffset(): Offset = Bi5StreamOffset("")

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (opts.maxFilesPerTrigger > 0) ReadLimit.maxFiles(opts.maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[Bi5StreamOffset].lastPath
    val pending = listSorted().filter(_ > from)
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _               => pending
    }
    if (capped.isEmpty) start else Bi5StreamOffset(capped.last)
  }

  override def deserializeOffset(json: String): Offset = Bi5StreamOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[Bi5StreamOffset].lastPath
    val to = end.asInstanceOf[Bi5StreamOffset].lastPath
    val newFiles = listSorted().filter(p => p > from && p <= to)
    // one partition per arriving hour file: hour files are small (a few MB
    // compressed), and per-file tasks keep latency low per trigger
    newFiles.map(f => Bi5Partition(Array(f), walk = false): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Bi5PartitionReaderFactory(opts, required, filters)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Serialized into the checkpoint log as the raw last-processed path. */
case class Bi5StreamOffset(lastPath: String) extends Offset {
  override def json(): String = lastPath
}
