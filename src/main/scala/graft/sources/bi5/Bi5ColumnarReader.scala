package graft.sources.bi5

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.file.{FileVisitOption, Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.tukaani.xz.LZMAInputStream

/**
 * Vectorized bi5 reader: decodes up to [[Bi5ColumnarReader.BatchRows]]
 * records at a time straight into on-heap column vectors and hands Spark a
 * [[ColumnarBatch]]. Identical semantics to the row reader (same file walk,
 * pruning, skip-corrupt, lenient dates) — only the output shape changes:
 * downstream whole-stage codegen reads the vectors directly instead of
 * pulling one InternalRow per record through an iterator.
 *
 * This is the piece that makes the scan survive scale: per-record cost drops
 * to the LZMA decode plus a handful of primitive array writes.
 */
object Bi5ColumnarReader {
  final val BatchRows = 4096
}

class Bi5ColumnarReader(
    partition: Bi5Partition,
    opts: Bi5Options,
    required: StructType,
    filters: Array[Filter])
    extends PartitionReader[ColumnarBatch] {

  import Bi5ColumnarReader.BatchRows

  private[this] val colIds: Array[Int] = required.fields.map { f =>
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
  private[this] val divisor = opts.priceDivisor
  private[this] val numFields = colIds.length

  private[this] val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(BatchRows, required)
      .map(_.asInstanceOf[OnHeapColumnVector])
  private[this] val batch = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])

  private[this] val files: Iterator[String] =
    if (partition.walk) {
      partition.roots.iterator.flatMap { root =>
        val p = Paths.get(root)
        if (Files.exists(p)) {
          Files.walk(p, FileVisitOption.FOLLOW_LINKS).iterator().asScala
            .map(_.toString)
            .filter(_.toLowerCase.endsWith(".bi5"))
        } else Iterator.empty
      }
    } else {
      partition.roots.iterator
    }

  private[this] var currentMeta: Bi5PathMeta = _
  private[this] var currentTickerBytes: Array[Byte] = _
  private[this] var currentIn: java.io.InputStream = _
  private[this] var currentTicks: Iterator[Bi5Codec.Tick] = Iterator.empty

  private[this] def openNextFile(): Boolean = {
    closeCurrent()
    while (files.hasNext) {
      val path = files.next()
      Bi5PathMeta.parse(path, opts.monthOffset) match {
        case Some(meta) if Bi5FilePruner.mayMatchMeta(meta, filters) =>
          try {
            val in = new LZMAInputStream(
              new BufferedInputStream(new FileInputStream(path), 1 << 16))
            currentMeta = meta
            currentTickerBytes = UTF8String.fromString(meta.ticker).getBytes
            currentIn = in
            currentTicks = Bi5Codec.ticks(in)
            return true
          } catch {
            case _: Throwable => closeCurrent()
          }
        case _ =>
      }
    }
    false
  }

  override def next(): Boolean = {
    var row = 0
    var i = 0
    while (i < numFields) { vectors(i).reset(); i += 1 }
    while (row < BatchRows) {
      if (!currentTicks.hasNext && !openNextFile()) {
        batch.setNumRows(row)
        return row > 0
      }
      while (row < BatchRows && currentTicks.hasNext) {
        val t = currentTicks.next()
        var c = 0
        while (c < numFields) {
          colIds(c) match {
            case 0 => vectors(c).putByteArray(row, currentTickerBytes)
            case 1 => vectors(c).putLong(row, currentMeta.tsMicros(t.msOffset))
            case 2 => vectors(c).putDouble(row, t.askRaw / divisor)
            case 3 => vectors(c).putDouble(row, t.bidRaw / divisor)
            case 4 => vectors(c).putDouble(row, t.askVol.toDouble)
            case 5 => vectors(c).putDouble(row, t.bidVol.toDouble)
          }
          c += 1
        }
        row += 1
      }
    }
    batch.setNumRows(row)
    true
  }

  override def get(): ColumnarBatch = batch

  private[this] def closeCurrent(): Unit = {
    if (currentIn != null) {
      try currentIn.close() catch { case _: Throwable => }
      currentIn = null
    }
    currentTicks = Iterator.empty
  }

  override def close(): Unit = {
    closeCurrent()
    batch.close()
  }
}
