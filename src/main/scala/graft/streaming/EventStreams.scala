package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `events` table shape.
 *
 * The reference is batch-only (no MicroBatchReadSupport anywhere — SURVEY.md
 * §2.3), so this module is a capability extension: the same event schema
 * processed as an unbounded stream with event-time semantics. Patterns
 * covered: file-source micro-batching, watermarked tumbling-window
 * aggregation (late data dropped deterministically), streaming
 * deduplication, and arbitrary stateful processing with
 * flatMapGroupsWithState.
 *
 * At scale these run identically on a real cluster: the file source lists
 * new files per micro-batch, state lives in the state store keyed by the
 * shuffle partitioning, and watermarks bound state size.
 */
object EventStreams {

  /** events.parquet file schema with the timestamp read raw; `tsType` is
    * whatever the file actually encodes (nanos-as-long or micros NTZ —
    * driver generators vary round to round). */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events directory as a micro-batched stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // streams need an up-front schema: sniff the file's ts encoding with a
    // one-footer batch read (driver-side metadata only, no data scan)
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(tsType))
      // the test tables are single parquet FILES; a file stream wants a
      // directory, so stream the sf dir filtered to the events file
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      // TIMESTAMP(NANOS) read as raw nanos long -> truncate to micros
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // micros NTZ -> TimestampType is exact under the pinned-UTC session
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Watermarked 5-minute tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Streaming dedup: first event per (user_id, event_type) within the
    * watermark horizon survives; replays/duplicates are dropped. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join: each purchase joined to the SAME user's
    * follow-up events within 30 minutes after it. Both sides carry
    * watermarks and the join condition bounds event time in both directions,
    * so Spark can expire buffered rows — state stays proportional to the
    * 30-minute window, never to the stream's history. This is the streaming
    * twin of the batch equi+range join (q45). */
  def purchaseFollowups(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("p_event_id"),
        col("user_id").as("p_user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val follows = events
      .select(
        col("event_id").as("f_event_id"),
        col("user_id").as("f_user_id"),
        col("ts").as("f_ts"),
        col("event_type").as("f_type"))
      .withWatermark("f_ts", "10 minutes")
    purchases.join(
      follows,
      col("p_user_id") === col("f_user_id") &&
        col("f_ts") > col("p_ts") &&
        col("f_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
  }

  /**
   * Streaming gap-based sessionization — the live twin of
   * [[graft.operators.Sessionize.byGap]] (and batch q40): per-user sessions
   * close when the user is idle longer than `gap`, emitted once the
   * watermark passes the session's end. Spark-first: the native
   * `session_window` grouping (merging session state in the state store)
   * rather than hand-rolled flatMapGroupsWithState — watermarks bound state,
   * and the aggregation is the stock streaming hash aggregate.
   *
   * Output: one row per CLOSED session with `start_ms` = first event,
   * `last_ms` = last event (window end minus the gap), `n_events`, and the
   * exact decimal-summed `session_value` (matching q40's numeric
   * convention).
   */
  def gapSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("last_ms"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
      .select("user_id", "start_ms", "last_ms", "n_events", "session_value")

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Arbitrary stateful aggregation: per-user running count + value total,
    * maintained in the state store across micro-batches. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserRunning(user, n, total)
          state.update(next)
          Iterator(next)
      }
  }
}
