package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mixture (deterministic hash-threshold mixture sampling): rate fidelity,
  * partitioning/growth stability, and the broadcast map-only plan shape. */
class MixtureSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("MixtureSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("rate-0 sources vanish, rate-1 sources survive whole, rates track targets") {
    import spark.implicits._
    val ids = spark.range(0, 20000).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 4).cast("string")))
    val out = Mixture.sampleByRates(ids, "src", "id",
      rates = Map("s0" -> 0.0, "s1" -> 1.0, "s2" -> 0.5), defaultRate = 0.25,
      salt = "t")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("s0"), "rate 0 must drop the source entirely")
    assert(counts("s1") === 5000L, "rate 1 must keep every row")
    assert(math.abs(counts("s2") - 2500L) < 200, s"rate 0.5 off target: ${counts("s2")}")
    assert(math.abs(counts("s3") - 1250L) < 150, s"default 0.25 off target: ${counts("s3")}")
  }

  test("decisions are stable under repartitioning and corpus growth") {
    import spark.implicits._
    val rates = Map("src1" -> 0.8, "src2" -> 0.5)
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Mixture.sampleByRates(df, "source", "doc_id", rates, 0.6, "mix1")
        .select("doc_id").as[Long].collect().toSet
    val base = kept(docs)
    assert(kept(docs.repartition(17, col("lang"))) === base,
      "keep set must not depend on partitioning")
    // growth: sampling half the corpus keeps exactly the intersection —
    // no doc's decision depends on any other doc's presence
    val half = docs.filter(col("doc_id") % 2 === 0)
    assert(kept(half) === base.filter(_ % 2 == 0),
      "keep decisions must be per-row, independent of the rest of the corpus")
  }

  test("plan is broadcast + map-only: no shuffle of the corpus") {
    val out = Mixture.sampleByRates(docs, "source", "doc_id",
      Map("src1" -> 0.8), 0.6, "mix1")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the corpus must not shuffle:\n$plan")
  }

  test("oversampling rates replicate: full copies always, fractional by hash") {
    import spark.implicits._
    val ids = spark.range(0, 10000).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 2).cast("string")))
    val out = Mixture.sampleByRatesWithRepeats(ids, "src", "id",
      rates = Map("s0" -> 2.5, "s1" -> 0.0), defaultRate = 1.0, salt = "t")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("s1"), "rate 0 drops the source even with repeats")
    assert(math.abs(bySrc("s0") - 12500L) < 300, s"rate 2.5 off target: ${bySrc("s0")}")
    // copies 0 and 1 are unconditional; only copy 2 is hash-gated
    val copies = out.filter(col("src") === "s0").groupBy("mix_copy").count()
      .as[(Int, Long)].collect().toMap
    assert(copies(0) === 5000L && copies(1) === 5000L)
    assert(math.abs(copies(2) - 2500L) < 200, s"fractional copy off: ${copies(2)}")
  }

  test("oversampled output is deterministic and replica-addressable") {
    val rates = Map("src1" -> 2.5, "src3" -> 0.4)
    def run() = Mixture.sampleByRatesWithRepeats(docs, "source", "doc_id",
      rates, 1.5, "mixup").select("doc_id", "mix_copy")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val a = run()
    assert(a === run(), "same inputs must give the identical replica set")
    assert(a.exists(_._2 == 1), "rates above 1 must actually replicate")
  }

  test("a null row key fails loudly instead of silently dropping the row") {
    import spark.implicits._
    val df = Seq(("s1", Some(1L)), ("s1", None), ("s2", Some(3L)))
      .toDF("src", "id")
    val ex = intercept[Exception] {
      Mixture.sampleByRates(df, "src", "id", Map("s1" -> 1.0), 1.0, "t").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("Mixture.sampleByRates: id is null")),
      s"expected the loud null-contract error, got: $ex")
  }

  test("invalid rates and reserved column names fail loudly") {
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs, "source", "doc_id", Map("a" -> 1.5), 0.5, "t")
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs.withColumn("mix_thresh", lit(1)),
        "source", "doc_id", Map("a" -> 0.5), 0.5, "t")
    }
  }
}
