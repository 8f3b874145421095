package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live OHLC bars from the bi5 streaming source must equal the batch bars
  * over the same files — exactly, thanks to deterministic min_by/max_by
  * tie-breaking. */
class TickStreamsSpec extends AnyFunSuite {

  private val Fixtures = "/root/reference/spark-2.4/src/test/resources"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("TickStreamsSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("streaming OHLC bars equal batch OHLC bars over the same tick tree") {
    val stream = spark.readStream.format("bi5").option("digits", 5)
      .load(s"$Fixtures/EURUSD")
    val q = TickStreams.ohlcBars(stream, "1 minute")
      .writeStream.format("memory").queryName("bars").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("select * from bars")

    val batch = TickStreams.ohlcBars(
      spark.read.format("bi5").option("digits", 5).load(s"$Fixtures/EURUSD"), "1 minute")

    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0 && batch.exceptAll(streamed).count() === 0,
      "streaming bars must equal batch bars exactly")
    // sanity on the bars themselves
    val bad = batch.filter(
      col("high") < col("low") || col("open") > col("high") || col("open") < col("low") ||
        col("close") > col("high") || col("close") < col("low") || col("n_ticks") <= 0)
    assert(bad.count() === 0)
    assert(batch.agg(sum("n_ticks")).head.getLong(0) === 27521) // every tick in a bar
  }

  test("open/close are event-time ordered, not arrival-ordered") {
    import spark.implicits._
    // two ticks out of arrival order within one bar: open must be the
    // EARLIER ts, close the LATER, regardless of row order
    val ticks = Seq(
      ("X", java.sql.Timestamp.valueOf("2020-01-01 00:00:30"), 2.0, 1.9, 1.0, 1.0),
      ("X", java.sql.Timestamp.valueOf("2020-01-01 00:00:10"), 5.0, 4.9, 1.0, 1.0))
      .toDF("ticker", "ts", "ask", "bid", "ask_volume", "bid_volume")
    val bars = TickStreams.ohlcBars(ticks, "1 minute").collect()
    assert(bars.length === 1)
    assert(bars.head.getAs[Double]("open") === 5.0)  // ts 00:00:10
    assert(bars.head.getAs[Double]("close") === 2.0) // ts 00:00:30
    assert(bars.head.getAs[Double]("high") === 5.0 && bars.head.getAs[Double]("low") === 2.0)
  }
}
