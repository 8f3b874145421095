package graft.sources.bi5

import java.nio.file.Paths

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/**
 * Micro-batch streaming over a growing bi5 tree: each trigger picks up hour
 * files that appeared since the last processed offset. The natural workflow
 * for this format — Dukascopy publishes one `<hh>h_ticks.bi5` per hour — so
 * `spark.readStream.format("bi5")` tails the directory.
 *
 * Offset model: the count of known files under the root, with files ordered
 * by sorted absolute path. Hour files are append-published in
 * lexicographic-ish order (ticker/year/month/day/hour), so new arrivals sort
 * after processed ones in steady state; a file back-filled BEHIND the offset
 * (e.g. a repaired historical hour) is not re-read — documented limitation,
 * same contract as Spark's file source without `latestFirst`.
 *
 * Batch planning bin-packs the new files exactly like `split=files` batch
 * mode, and the readers (row + columnar) are the batch readers reused
 * verbatim — identical decode/skip-corrupt semantics in both execution modes.
 */
class Bi5MicroBatchStream(
    opts: Bi5Options,
    required: StructType,
    filters: Array[Filter],
    checkpointLocation: String)
    extends MicroBatchStream {

  /** Offset = how many files (in sorted-path order) are fully processed. */
  private def listSorted(): Vector[String] =
    Bi5FileLister.listBi5Files(Paths.get(opts.path))
      .filter { case (p, _) => Bi5FilePruner.mayMatch(p, opts.monthOffset, filters) }
      .map(_._1)
      .sorted
      .toVector

  override def initialOffset(): Offset = Bi5StreamOffset(0)

  override def latestOffset(): Offset = Bi5StreamOffset(listSorted().size)

  override def deserializeOffset(json: String): Offset =
    Bi5StreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[Bi5StreamOffset].fileCount.toInt
    val to = end.asInstanceOf[Bi5StreamOffset].fileCount.toInt
    val newFiles = listSorted().slice(from, to)
    if (newFiles.isEmpty) Array.empty
    else {
      // one partition per arriving hour file: hour files are small (a few MB
      // compressed), and per-file tasks keep latency low per trigger
      newFiles.map(f => Bi5Partition(Array(f), walk = false): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Bi5PartitionReaderFactory(opts, required, filters)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Serialized into the checkpoint log as the plain file count. */
case class Bi5StreamOffset(fileCount: Long) extends Offset {
  override def json(): String = fileCount.toString
}
