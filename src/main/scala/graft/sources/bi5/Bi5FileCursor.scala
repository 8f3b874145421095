package graft.sources.bi5

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.file.{FileVisitOption, Files, Paths}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.sources.Filter
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared executor-side file cursor for both bi5 readers (row + columnar):
 * walks/iterates a partition's candidate files, prunes by path metadata and
 * pushed filters, opens the LZMA stream (buffered — the decoder issues many
 * small reads against its source), and applies the skip-corrupt rule: any
 * failure opening a file silently advances to the next
 * (reference BI5DataSource.scala:149-159).
 *
 * Owns every resource it opens: the current decompression stream AND the
 * underlying Files.walk directory streams (which otherwise hold descriptors
 * until GC), all released by [[close]].
 */
final class Bi5FileCursor(partition: Bi5Partition, opts: Bi5Options, filters: Array[Filter]) {

  import Bi5FileCursor.OpenFile

  private[this] val walkStreams = ArrayBuffer.empty[java.util.stream.Stream[java.nio.file.Path]]

  private[this] val files: Iterator[String] =
    if (partition.walk) {
      partition.roots.iterator.flatMap { root =>
        val p = Paths.get(root)
        if (Files.exists(p)) {
          val stream = Files.walk(p, FileVisitOption.FOLLOW_LINKS)
          walkStreams += stream
          stream.iterator().asScala
            .map(_.toString)
            .filter(_.toLowerCase.endsWith(".bi5"))
        } else Iterator.empty
      }
    } else {
      partition.roots.iterator
    }

  private[this] var currentIn: InputStream = _

  /** Advance to the next decodable file, or None when exhausted. */
  def nextFile(): Option[OpenFile] = {
    closeCurrent()
    while (hasMoreFiles) {
      val path = files.next()
      Bi5PathMeta.parse(path, opts.monthOffset) match {
        case Some(meta) if Bi5FilePruner.mayMatchMeta(meta, filters) =>
          var fis: FileInputStream = null
          try {
            fis = new FileInputStream(path)
            val in = new org.tukaani.xz.LZMAInputStream(new BufferedInputStream(fis, 1 << 16))
            currentIn = in
            return Some(OpenFile(meta, UTF8String.fromString(meta.ticker), Bi5Codec.ticks(in)))
          } catch {
            case _: Throwable =>
              // bad LZMA header, empty file, ... — the LZMAInputStream ctor
              // throws BEFORE currentIn is assigned, so close the raw stream
              // explicitly or its descriptor leaks until GC
              if (fis != null) { try fis.close() catch { case _: Throwable => } }
              closeCurrent()
          }
        case _ => // non-matching layout (reference throws+swallows) or pruned
      }
    }
    None
  }

  /** Walk traversal can itself throw (file deleted mid-walk, unreadable dir,
    * symlink loop). Skip-corrupt extends to the traversal: a failing walk
    * ends this partition's file supply instead of failing the task. Only
    * NonFatal — an OutOfMemoryError or interrupt must kill the task, not
    * masquerade as end-of-data. */
  private[this] def hasMoreFiles: Boolean =
    try files.hasNext
    catch { case scala.util.control.NonFatal(_) => false }

  private[this] def closeCurrent(): Unit = {
    if (currentIn != null) {
      try currentIn.close() catch { case _: Throwable => }
      currentIn = null
    }
  }

  def close(): Unit = {
    closeCurrent()
    walkStreams.foreach(s => try s.close() catch { case _: Throwable => })
    walkStreams.clear()
  }
}

object Bi5FileCursor {

  /** One successfully opened file, ready to decode. */
  final case class OpenFile(
      meta: Bi5PathMeta,
      tickerUtf8: UTF8String,
      ticks: Iterator[Bi5Codec.Tick])

  /** Pruned-schema field -> fixed column ordinal used by both readers. */
  def columnIds(required: org.apache.spark.sql.types.StructType): Array[Int] =
    required.fields.map { f =>
      f.name match {
        case "ticker"     => 0
        case "ts"         => 1
        case "ask"        => 2
        case "bid"        => 3
        case "ask_volume" => 4
        case "bid_volume" => 5
        case other => throw new IllegalArgumentException(s"Unknown bi5 column: $other")
      }
    }
}
