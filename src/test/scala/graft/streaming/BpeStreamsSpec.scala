package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming tokenization under a trained model: Bpe.fit runs on the BATCH
 * corpus (training is inherently a multi-pass batch job), and the trained
 * merge table then prices documents arriving on a STREAM — the production
 * split (train once offline, tokenize the live ingest tail with the frozen
 * model). Bpe.tokenCounts is a map-only stream-static broadcast, so it
 * applies to a streaming frame unchanged; per-document counts must equal
 * the batch counts exactly.
 */
class BpeStreamsSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("BpeStreamsSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def docs: DataFrame = spark.read
    .parquet(s"$Sf/documents.parquet").select("doc_id", "text")

  test("streaming trained-model token counts equal batch exactly (two micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train once, batch-side, and PIN the model (the frozen artifact a
    // production job ships; localCheckpoint so each micro-batch reuses it
    // instead of re-deriving the plan against live state)
    val merges = graft.operators.Bpe.fitOnText(spark, docs, "text", nMerges = 8)
      .localCheckpoint(true)
    val batch = graft.operators.Bpe.tokenCounts(docs, "text", merges, "n_bpe")
      .select("doc_id", "n_bpe")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = docs.as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val name = s"bpe_stream_${System.nanoTime()}"
    val q = graft.operators.Bpe
      .tokenCounts(mem.toDF().toDF("doc_id", "text"), "text", merges, "n_bpe")
      .select("doc_id", "n_bpe")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(rows.filter(_._1 < 250).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 >= 250).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(streamed.size === batch.size, "every streamed doc must be priced once")
    assert(streamed === batch, "streaming token counts must equal batch exactly")
    assert(batch.values.sum > 0, "fixture must produce non-zero symbol counts")
  }
}
