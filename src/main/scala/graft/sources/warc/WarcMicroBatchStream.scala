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
    required: org.apache.spark.sql.types.StructType,
    typeKeep: Option[Set[String]],
    maxFilesPerTrigger: Int,
    store: Bi5Store)
    extends MicroBatchStream
    with SupportsAdmissionControl {

  /** Sorted listing of files strictly AFTER `from` — [[WarcLister.list]]
    * with committed-subtree pruning, so an idle tail over a multi-dump
    * archive re-lists the frontier's subtree and genuinely new directories,
    * never the whole committed tree (the bi5 stream's `listBi5FilesSince`
    * discipline, here over raw path order). */
  private def listAfter(from: String): Vector[String] =
    WarcLister.list(store, opts.path, opts.extensions, sincePath = from).map(_._1)

  override def initialOffset(): Offset = WarcStreamOffset("")

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[WarcStreamOffset].lastPath
    val pending = listAfter(from)
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _               => pending
    }
    if (capped.isEmpty) start else WarcStreamOffset(capped.last)
  }

  override def deserializeOffset(json: String): Offset = WarcStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WarcStreamOffset].lastPath
    val to = end.asInstanceOf[WarcStreamOffset].lastPath
    listAfter(from).filter(_ <= to)
      .map(f => WarcFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(store, required, typeKeep)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Checkpoint offset: the last processed path (empty = initial), emitted
  * as a real JSON object `{"v":1,"path":...}` — POSIX paths may legally
  * contain quotes, spaces, even newlines, and a raw-path offset with a
  * newline in it would corrupt the checkpoint's line-oriented offset log.
  * Parsing still accepts the legacy raw-path form so pre-v1 checkpoints
  * keep resuming. */
case class WarcStreamOffset(lastPath: String) extends Offset {
  override def json(): String =
    if (lastPath.isEmpty) ""
    else {
      val m = WarcStreamOffset.mapper
      val node = m.createObjectNode()
      node.put("v", 1)
      node.put("path", lastPath)
      m.writeValueAsString(node)
    }
}

object WarcStreamOffset {
  // Offset.equals compares json() strings, so json() runs several times per
  // trigger; ObjectMapper construction is expensive and the instance is
  // thread-safe after configuration — share one (the Bi5StreamOffset note).
  private[warc] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Strict for the JSON form (an unrecognized object means the checkpoint
    * was written by an incompatible version — fail loudly); any non-JSON
    * string is a legacy raw-path offset and is accepted verbatim. */
  def fromJson(json: String): WarcStreamOffset = {
    if (json.isEmpty) return WarcStreamOffset("")
    if (json.startsWith("{")) {
      try {
        val n = mapper.readTree(json)
        if (n.path("v").asInt() == 1 && n.hasNonNull("path"))
          return WarcStreamOffset(n.get("path").asText())
      } catch { case scala.util.control.NonFatal(_) => }
      throw new IllegalStateException(
        s"Unrecognized warc streaming offset '$json' (expected {\"v\":1,\"path\":...}); " +
          "the checkpoint was written by an incompatible version — restart the " +
          "query with a fresh checkpointLocation.")
    }
    WarcStreamOffset(json) // legacy raw-path checkpoint
  }
}
