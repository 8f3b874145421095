package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Write-side layout utilities — the sink half of a 100 TB pipeline, where
 * HOW data lands determines every downstream scan's cost:
 *
 *  - [[writePartitioned]]: hive-style `partitionBy` layout so downstream
 *    filters on the partition columns become directory pruning (zero I/O
 *    for skipped partitions — `PartitionFilters` in the scan plan, checked
 *    by `SinksSpec`).
 *  - [[writeBucketedTable]]: pre-shuffled bucket layout so repeated joins/
 *    aggregations on the bucket key run with ZERO exchanges at read time
 *    (the `BucketedJoinSpec` plan shape, producible on demand).
 *  - [[compact]]: the small-files fix — rewrite a directory into
 *    size-targeted files. Small files are the classic slow killer at
 *    scale: a 100 TB table left as 10 MB files costs 10M driver file
 *    handles and task-per-file scheduling; compaction amortizes both.
 *
 * All three are thin, deliberately: the point is encoding the LAYOUT
 * decisions (partition granularity, bucket count, file size) as reviewed,
 * reusable code instead of per-job incantations.
 */
object Sinks {

  /**
   * Hive-style partitioned parquet. `maxRecordsPerFile` caps file size
   * inside each partition dir (0 = unlimited); sorting within partitions
   * by `sortCols` gives parquet min/max row-group stats their pruning
   * power for range predicates on those columns.
   */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /**
   * Bucketed + sorted managed table: joins/aggregations keyed on
   * `bucketCols` read it with no Exchange (and no Sort, when `sortCols`
   * covers the join key). Bucketing requires the table-catalog write path
   * (`saveAsTable`) — plain `.parquet(path)` silently drops bucket specs.
   */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      nBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String]): Unit = {
    require(nBuckets >= 1, s"nBuckets ($nBuckets) must be positive")
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Rewrite a parquet directory into ~`targetBytes` files (computed from
   * the directory's actual on-disk size, so the file count tracks data
   * volume, not partition history). Returns the file count written.
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes >= 1, s"targetBytes ($targetBytes) must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }
}
