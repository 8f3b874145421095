package graft.sources.warc

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}

import graft.sources.bi5.Bi5Store

/**
 * Micro-batch streaming over a growing crawl directory:
 * `spark.readStream.format("warc")` tails arriving segment files — the
 * live-ingest half of the web-corpus story (a crawler drops finished
 * `.warc.gz` segments into the tree; the stream picks each up exactly
 * once and the SAME curation operators run on the tail as on the batch
 * backfill).
 *
 * Offset model (the bi5 stream's key-range discipline,
 * `Bi5MicroBatchStream.scala`, specialized to pathless-metadata files):
 * files are totally ordered by PATH, the offset is the last processed
 * path, and a batch covers the range `(start, end]` — membership is a
 * pure predicate on the path, stable under listing shifts, so neither a
 * retention-deleted processed file nor a concurrently-appearing new one
 * can renumber a pending batch (the failure count-based offsets have).
 *
 * CONTRACT (documented, not silent): segment names must sort
 * lexicographically in publication order — true of Common Crawl's
 * `CC-MAIN-<ts>-<seq>` naming and of any timestamp-prefixed scheme. A
 * file that appears BEHIND the committed path is skipped, exactly like
 * Spark's own file source without `latestFirst`; publishers that cannot
 * guarantee ordered names should land files under a staging prefix and
 * rename into the watched tree in order.
 *
 * `maxFilesPerTrigger` bounds each batch (admission control), so starting
 * over a multi-TB backlog progresses in resumable increments.
 */
class WarcMicroBatchStream(
    opts: WarcOptions,
    fieldNames: Array[String],
    typeKeep: Option[Set[String]],
    maxFilesPerTrigger: Int,
    store: Bi5Store)
    extends MicroBatchStream
    with SupportsAdmissionControl {

  /** Sorted recursive listing — the batch scan's walk, shared contract. */
  private def listSorted(): Vector[String] = {
    val out = Vector.newBuilder[String]
    def walk(p: String): Unit =
      if (store.isDirectory(p)) store.children(p).sortBy(_.path).foreach(e => walk(e.path))
      else if (opts.extensions.exists(p.toLowerCase.endsWith)) out += p
    if (store.exists(opts.path)) walk(opts.path)
    out.result().sorted
  }

  override def initialOffset(): Offset = WarcStreamOffset("")

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[WarcStreamOffset].lastPath
    val pending = listSorted().filter(_ > from)
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _               => pending
    }
    if (capped.isEmpty) start else WarcStreamOffset(capped.last)
  }

  override def deserializeOffset(json: String): Offset = WarcStreamOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WarcStreamOffset].lastPath
    val to = end.asInstanceOf[WarcStreamOffset].lastPath
    listSorted().filter(p => p > from && p <= to)
      .map(f => WarcFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(store, fieldNames, typeKeep)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Checkpoint offset: the last processed path verbatim (empty = initial).
  * Paths cannot contain the characters an offset wrapper would need to
  * escape, so the json IS the path — trivially stable across versions. */
case class WarcStreamOffset(lastPath: String) extends Offset {
  override def json(): String = lastPath
}
