package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** EwmaStreams: the streamed recurrence equals the batch Ewma.perKey fold
  * bit-for-bit on closed batches, state carries across micro-batches, and
  * the monotone-ingest contract fails loudly. */
class EwmaStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("EwmaStreamsSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // deterministic fixture: 3 keys x 40 observations with irregular values
  private def points: Seq[EwmaPoint] =
    for {
      k <- Seq("a", "b", "c")
      i <- 0 until 40
    } yield EwmaPoint(k, i.toLong, math.sin(i * 0.7 + k.hashCode % 7) * 10 + i)

  test("streamed ewma equals the batch fold bit-for-bit across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EwmaPoint]
    val name = s"ewma_stream_${System.nanoTime()}"
    val q = EwmaStreams.runningEwma(spark, mem.toDF(), alpha = 0.3)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // three micro-batches split mid-key-history: state must carry
      val (b1, rest) = points.partition(_.ord < 15)
      val (b2, b3) = rest.partition(_.ord < 30)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // final emit per key = the one with the highest n_events
    val streamed = spark.table(name)
      .withColumn("rn", expr("row_number() over (partition by key order by n_events desc)"))
      .filter(col("rn") === 1)
      .select("key", "n_events", "ewma")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = graft.operators.Ewma
      .perKey(points.toDF(), "key", Seq("ord"), "v", alpha = 0.3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (k, (n, e)) =>
      assert(n === batch(k)._1, s"key $k count")
      assert(java.lang.Double.doubleToLongBits(e) ===
        java.lang.Double.doubleToLongBits(batch(k)._2),
        s"key $k: streamed $e != batch ${batch(k)._2} (must be bit-identical)")
    }
  }

  test("out-of-order arrival across batches fails the query loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EwmaPoint]
    val name = s"ewma_ooo_${System.nanoTime()}"
    val q = EwmaStreams.runningEwma(spark, mem.toDF(), alpha = 0.5)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(Seq(EwmaPoint("k", 10L, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(EwmaPoint("k", 5L, 2.0))) // regression: ord 5 after 10
      val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("out-of-order")),
        s"expected the monotone-ingest error, got: $ex")
    } finally q.stop()
  }

  test("alpha contract is loud") {
    intercept[IllegalArgumentException] {
      import spark.implicits._
      EwmaStreams.runningEwma(spark, Seq.empty[EwmaPoint].toDF(), alpha = 1.5)
    }
  }
}
