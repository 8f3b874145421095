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
   * PACKED-CONTEXT DELIVERY: deterministic sharded write of a
   * [[graft.operators.Packer.withSequenceOffsets]] frame plus a per-file
   * MANIFEST the consumer verifies the handoff against — the training-
   * data equivalent of a checksum sidecar. Shard = `first_seq % nShards`
   * (deterministic in the data, balanced since sequence indices are
   * dense); each shard lands in one hive dir sorted by `orderCol`. The
   * manifest row per shard: row count, token sum, and a CONTENT HASH —
   * the exact 48-bit md5 of `order:ntok:first_seq:last_seq` per row,
   * summed in DECIMAL(38) (exact at any scale, no collect, order-free)
   * and reduced mod 1e9+7. After the write the data is READ BACK and
   * re-manifested: `readback_ok` is the per-shard equality of all three
   * fields, so a dropped row, a corrupted value, or a mis-sharded file
   * fails the delivery loudly. The manifest itself is written as JSON
   * beside the data (`<path>/_manifest`). Returns the verified manifest.
   */
  def writePackedManifest(
      packed: DataFrame,
      orderCol: String,
      nTokCol: String,
      path: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards ($nShards) must be positive")
    Seq("first_seq", "last_seq").foreach(c =>
      require(packed.columns.contains(c),
        s"packed must carry $c — run Packer.withSequenceOffsets first"))
    val h = graft.functions.HashConventions.md5long48(
      s"concat(cast($orderCol as string), ':', cast($nTokCol as string), ':', " +
        "cast(first_seq as string), ':', cast(last_seq as string))")
    def manifestOf(df: DataFrame): DataFrame = df
      .withColumn("shard", expr(s"cast(first_seq % $nShards as int)"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(nTokCol).cast("long")).as("n_tokens"),
        expr(s"cast(sum(cast($h as decimal(38,0))) % 1000000007 as bigint)")
          .as("content_hash"))
    val out = packed.withColumn("shard", expr(s"cast(first_seq % $nShards as int)"))
    out
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col(orderCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    val expect = manifestOf(packed)
    val back = manifestOf(
      packed.sparkSession.read.parquet(path))
      .withColumnRenamed("n_rows", "rb_rows")
      .withColumnRenamed("n_tokens", "rb_tokens")
      .withColumnRenamed("content_hash", "rb_hash")
    val manifest = expect.join(back, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_rows"), col("n_tokens"), col("content_hash"),
        // coalesce: a shard entirely missing on read-back (or written but
        // never expected) null-propagates through ===; it must read as a
        // FAILED verification, not a NULL a `= false` filter would skip
        coalesce(
          col("n_rows") === col("rb_rows") &&
            col("n_tokens") === col("rb_tokens") &&
            col("content_hash") === col("rb_hash"),
          lit(false)).as("readback_ok"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/_manifest")
    manifest
  }

  /**
   * TOKEN-CONTEXT DELIVERY: the id-content-verified handoff of
   * [[graft.operators.Packer.packTokenIds]] windows — where
   * [[writePackedManifest]] certifies packing ACCOUNTING (offsets and
   * counts), this certifies the actual TENSOR PAYLOAD: the per-shard
   * content hash covers every window's full id sequence
   * (`seq:id,id,...` through the exact 48-bit md5, summed in
   * DECIMAL(38) — order-free, collect-free, exact at any scale — mod
   * 1e9+7), so a single flipped id anywhere in a shard fails the
   * delivery. Shard = `seq % nShards` (dense window indices — balanced
   * by construction); each shard lands hive-partitioned and sorted by
   * `seq`. After the write the data is READ BACK and re-manifested;
   * `readback_ok` is the per-shard equality of rows, id count, and
   * content hash. The manifest is also written as JSON beside the data
   * (`<path>/_manifest`). Returns the verified manifest.
   */
  def writeTokenContexts(
      contexts: DataFrame,
      path: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards ($nShards) must be positive")
    Seq("seq", "ids").foreach(c =>
      require(contexts.columns.contains(c),
        s"contexts must carry $c — run Packer.packTokenIds first"))
    val h = graft.functions.HashConventions.md5long48(
      "concat(cast(seq as string), ':', " +
        "array_join(transform(ids, i -> cast(i as string)), ','))")
    def manifestOf(df: DataFrame): DataFrame = df
      .withColumn("shard", expr(s"cast(seq % $nShards as int)"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(expr("cast(size(ids) as long)")).as("n_ids"),
        expr(s"cast(sum(cast($h as decimal(38,0))) % 1000000007 as bigint)")
          .as("content_hash"))
    contexts.withColumn("shard", expr(s"cast(seq % $nShards as int)"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("seq"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    val expect = manifestOf(contexts)
    val back = manifestOf(contexts.sparkSession.read.parquet(path))
      .withColumnRenamed("n_rows", "rb_rows")
      .withColumnRenamed("n_ids", "rb_ids")
      .withColumnRenamed("content_hash", "rb_hash")
    val manifest = expect.join(back, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_rows"), col("n_ids"), col("content_hash"),
        // coalesce: missing-shard NULL must read as failed (see
        // writePackedManifest)
        coalesce(
          col("n_rows") === col("rb_rows") &&
            col("n_ids") === col("rb_ids") &&
            col("content_hash") === col("rb_hash"),
          lit(false)).as("readback_ok"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/_manifest")
    manifest
  }

  /**
   * FULL TENSOR-TRIPLET DELIVERY: [[writeTokenContexts]] generalized to
   * everything a trainer step consumes — input `ids`
   * ([[graft.operators.Packer.packTokenIds]]), the block-diagonal
   * attention `spans` ([[graft.operators.Packer.packTokenIdsWithSpans]]),
   * and the causal-LM `labels` — with a per-shard content hash PER COLUMN
   * FAMILY, so the manifest localizes corruption to the family that
   * actually broke (a flipped label fails `labels_hash` alone; an id flip
   * fails `ids_hash` alone). Hash discipline is the library convention
   * throughout: each row's family serializes canonically
   * (`seq:v1,v2,...` for int arrays, `seq:doc:a:b;doc:a:b` for spans —
   * the q289 `spans_str` spelling), 48-bit md5, summed in DECIMAL(38)
   * (exact, order-free, collect-free) mod 1e9+7. Shard = `seq % nShards`;
   * hive-partitioned, seq-sorted, read back and re-manifested;
   * `readback_ok` is the per-shard equality of rows, id count, and ALL
   * THREE family hashes (coalesced — a missing shard reads as failed).
   * Returns the verified manifest, also written as JSON at
   * `<path>/_manifest`.
   */
  def writeTokenTensors(
      tensors: DataFrame,
      path: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards ($nShards) must be positive")
    Seq("seq", "ids", "spans", "labels").foreach(c =>
      require(tensors.columns.contains(c),
        s"tensors must carry $c — compose Packer.packTokenIdsWithSpans " +
          "with a label builder first"))
    def intCsvHash(c: String) = graft.functions.HashConventions.md5long48(
      s"concat(cast(seq as string), ':', " +
        s"array_join(transform($c, i -> cast(i as string)), ','))")
    val spansHash = graft.functions.HashConventions.md5long48(
      "concat(cast(seq as string), ':', " +
        "array_join(transform(spans, x -> concat(cast(x.doc as string), ':', " +
        "cast(x.a as string), ':', cast(x.b as string))), ';'))")
    def familySum(h: String, as: String) =
      expr(s"cast(sum(cast($h as decimal(38,0))) % 1000000007 as bigint)").as(as)
    def manifestOf(df: DataFrame): DataFrame = df
      .withColumn("shard", expr(s"cast(seq % $nShards as int)"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(expr("cast(size(ids) as long)")).as("n_ids"),
        familySum(intCsvHash("ids"), "ids_hash"),
        familySum(spansHash, "spans_hash"),
        familySum(intCsvHash("labels"), "labels_hash"))
    tensors.withColumn("shard", expr(s"cast(seq % $nShards as int)"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("seq"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    val expect = manifestOf(tensors)
    val back = manifestOf(tensors.sparkSession.read.parquet(path))
      .withColumnRenamed("n_rows", "rb_rows")
      .withColumnRenamed("n_ids", "rb_ids")
      .withColumnRenamed("ids_hash", "rb_ids_hash")
      .withColumnRenamed("spans_hash", "rb_spans_hash")
      .withColumnRenamed("labels_hash", "rb_labels_hash")
    val manifest = expect.join(back, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_rows"), col("n_ids"),
        col("ids_hash"), col("spans_hash"), col("labels_hash"),
        // coalesce: missing-shard NULL must read as failed (see
        // writePackedManifest)
        coalesce(
          col("n_rows") === col("rb_rows") &&
            col("n_ids") === col("rb_ids") &&
            col("ids_hash") === col("rb_ids_hash") &&
            col("spans_hash") === col("rb_spans_hash") &&
            col("labels_hash") === col("rb_labels_hash"),
          lit(false)).as("readback_ok"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/_manifest")
    manifest
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

  /**
   * SQL fragment: the Z-value (Morton code) of `dimCols`, each rank-scaled
   * into `bits` bits against `[lo_i, hi_i]` bound columns, bit-interleaved
   * so nearby points in EVERY dimension get nearby codes. Shared by
   * [[writeZOrdered]] and its DuckDB oracle twin (identical arithmetic:
   * exact double scaling, floor, then integer bit ops — deterministic
   * cross-engine).
   *
   * `dims` is (valueExpr, loExpr, hiExpr) per dimension. `dialect` picks
   * the bit-shift spelling: "spark" (shiftleft/shiftright functions) or
   * "duck" (infix << / >>) — everything else is shared verbatim.
   */
  def zValueSql(
      dims: Seq[(String, String, String)],
      bits: Int,
      dialect: String = "spark"): String = {
    require(dims.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits ($bits) x dims (${dims.size}) must fit a signed long")
    val (shl, shr): ((String, Int) => String, (String, Int) => String) = dialect match {
      case "spark" => ((a, n) => s"shiftleft($a, $n)", (a, n) => s"shiftright($a, $n)")
      case "duck" => ((a, n) => s"(($a) << $n)", (a, n) => s"(($a) >> $n)")
      case other => throw new IllegalArgumentException(s"unknown dialect: $other")
    }
    val n = dims.size
    val top = (1L << bits) - 1
    val scaled = dims.map { case (x, lo, hi) =>
      s"""(CASE WHEN ($hi) = ($lo) THEN CAST(0 AS BIGINT)
          ELSE least(CAST($top AS BIGINT),
                     CAST(floor((CAST($x AS DOUBLE) - CAST($lo AS DOUBLE))
                                / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE) + 1.0)
                                * ${1L << bits}.0) AS BIGINT)) END)"""
    }
    (for {
      j <- 0 until bits
      (s, i) <- scaled.zipWithIndex
    } yield s"(${shl(s"${shr(s, j)} & 1", j * n + i)})")
      .mkString(" | ")
  }

  /**
   * Z-order (Morton-curve) clustered layout: rows sort by the interleaved
   * bit code of `dimCols`, so every output file covers a small RECTANGLE
   * of the dim space instead of a thin slice of one column. Parquet
   * min/max footer stats on ALL dims then prune files for multi-dim box
   * predicates — the layout trick single-column sorting cannot give
   * (sorting by ts makes user_id ranges per file full-width, and vice
   * versa). The lakehouse standard for "filter by user AND time" tables.
   *
   * Bounds are computed in-plan (tiny aggregate, broadcast back): no
   * driver-side collect, and the write stays one range shuffle (the
   * repartitionByRange on the code) + local sort.
   */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimCols: Seq[String],
      nFiles: Int,
      bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles ($nFiles) must be positive")
    val reserved = ("__z" +: dimCols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c"))).toSet
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val boundAggs = dimCols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    val dims = dimCols.map(c => (c, s"__lo_$c", s"__hi_$c"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", expr(zValueSql(dims, bits)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
