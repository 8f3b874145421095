package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming pipelines synchronously over the sf0.001 events
  * parquet via memory sinks (processAllAvailable). */
class EventStreamsSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("EventStreamsSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("watermarked windowed counts aggregate the whole batch") {
    runToMemory(EventStreams.windowedCounts(EventStreams.readEvents(spark, Sf)), "win_counts", "append")
    val out = spark.sql("select * from win_counts")
    // append mode emits only windows sealed by the watermark; the final
    // window(s) stay open, so totals are <= 1000 but close to it.
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total > 900 && total <= 1000, s"total=$total")
    assert(out.select("event_type").distinct().count() === 5)
  }

  test("streaming dedup keeps at most one event per user/type pair") {
    runToMemory(EventStreams.dedupedEvents(EventStreams.readEvents(spark, Sf)), "dedup_ev", "append")
    val out = spark.sql("select * from dedup_ev")
    val pairs = out.select("user_id", "event_type").distinct().count()
    assert(out.count() === pairs)
    assert(pairs <= 15L * 5)
  }

  test("stateful running totals accumulate per user") {
    val running = EventStreams.runningUserTotals(spark, EventStreams.readEvents(spark, Sf))
    runToMemory(running.toDF(), "run_tot", "update")
    // update mode emits one row per user per micro-batch; the LAST row per
    // user carries the final running state.
    val last = spark.sql(
      """select user_id, n, total from (
           select *, row_number() over (partition by user_id order by n desc) rn
           from run_tot) where rn = 1""")
    assert(last.count() === 15)
    assert(last.agg(sum("n")).head.getLong(0) === 1000)
  }
}
