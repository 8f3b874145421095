package graft.sources.warc

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `spark.read.format("warc")` — a second zero-dependency DSv2 source beside
 * the bi5 connector, covering the container a web-scraped pretraining
 * corpus actually arrives in (Common Crawl publishes `.warc.gz` where every
 * record is its own gzip member; `java.util.zip.GZIPInputStream` reads
 * concatenated members natively, so decompression needs nothing beyond the
 * JDK). Same architectural conventions as the bi5 source (eager load()-time
 * option validation, fixed schema, skip-corrupt truncation, column pruning
 * and record-level filter pushdown) — see reference
 * BI5DataSource.scala:24-50 for the registration shape both follow.
 */
class WarcDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "warc"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    WarcOptions.from(k => Option(options.get(k)))
    WarcSchema.schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new WarcTable(WarcOptions.from(k => Option(options.get(k))))
  }
}

/** Validated options: `path` (required), `extensions` (CSV of accepted
  * file suffixes, default ".warc,.warc.gz"), `maxFilesPerTrigger`
  * (streaming admission control, 0 = unbounded), `listShards` (N > 0 runs
  * the batch-planning listing as a Spark job over the root's immediate
  * child subtrees instead of a serial driver walk — the bi5 source's
  * extreme-file-count mode, for multi-dump buckets), `memberSplitBytes`
  * (N > 0 fans each `.gz` file larger than N into multiple partitions of
  * ~N compressed bytes, split at gzip MEMBER boundaries indexed at
  * planning time — Common Crawl segments compress each record as its own
  * member, so one multi-GB file no longer pins one task; 0 = one
  * partition per file, the plain-`.warc` unit and the default). */
final case class WarcOptions(
    path: String,
    extensions: Seq[String],
    maxFilesPerTrigger: Int,
    listShards: Int,
    memberSplitBytes: Long)

object WarcOptions {
  def from(get: String => Option[String]): WarcOptions = {
    val path = get("path").getOrElse(
      throw new IllegalArgumentException("'path' must be specified for WARC data."))
    val exts = get("extensions").getOrElse(".warc,.warc.gz")
      .split(",").toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
    if (exts.isEmpty)
      throw new IllegalArgumentException("'extensions' must name at least one file suffix")
    def nonNegInt(name: String): Int = get(name).map(_.trim) match {
      case None => 0
      case Some(s) => s.toIntOption.filter(_ >= 0).getOrElse(
        throw new IllegalArgumentException(
          s"'$name' must be a non-negative integer"))
    }
    val split = get("memberSplitBytes").map(_.trim) match {
      case None => 0L
      case Some(s) => s.toLongOption.filter(_ >= 0L).getOrElse(
        throw new IllegalArgumentException(
          "'memberSplitBytes' must be a non-negative integer"))
    }
    WarcOptions(path, exts, nonNegInt("maxFilesPerTrigger"), nonNegInt("listShards"), split)
  }
}

object WarcSchema {
  /** Fixed 8-column schema; payload prunes to a byte-skip, never a read. */
  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("record_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("source_file", StringType, nullable = false)))
}

/** Batch-readable WARC table. */
class WarcTable(opts: WarcOptions) extends Table with SupportsRead {

  override def name(): String = s"warc(${opts.path})"

  override def schema(): StructType = WarcSchema.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(opts)
}
