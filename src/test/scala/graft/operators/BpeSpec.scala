package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bpe trainer/applier: known-corpus merge sequence, train/apply
  * agreement, early stop, and the loud preconditions. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("BpeSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  import scala.jdk.CollectionConverters._
  private def wordsDf(rows: (String, Long)*) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("wcnt", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      rows.map { case (w, c) => org.apache.spark.sql.Row(w, c) }.asJava, schema)
  }

  test("hand-checkable corpus trains the classic BPE merge sequence") {
    // Sennrich's toy example shape: low/lower/newest/widest with counts.
    // Pair frequencies (weighted): "es" = 6+3 = 9 (newest 6, widest 3),
    // "st" = 9, "ne" = 6 ... tie between "es" and "st" at 9 breaks to
    // "es" (pair-asc). After merge 1 (es -> <1>), "<1>t" has 9 — wins
    // round 2. Round 3: "lo" = 5+2 = 7.
    val words = wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 3)
      .orderBy("round").collect()
    assert(m.map(_.getAs[String]("pair")).toSeq ===
      Seq("es", "t", "lo"))
    assert(m.map(_.getAs[Long]("n")).toSeq === Seq(9L, 9L, 7L))
    assert(m.map(_.getAs[String]("sym")).toSeq ===
      Seq("", "", ""))
  }

  test("applyMerges reproduces the trainer's own final spellings") {
    val words = wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 3)
    val applied = Bpe.applyMerges(words, "w", m, "mw")
      .orderBy("w").collect().map(r => r.getAs[String]("w") -> r.getAs[String]("mw")).toMap
    // newest -> new<1>t -> new<2> ; widest -> wid<2> ; low -> <3>w
    assert(applied("newest") === "new")
    assert(applied("widest") === "wid")
    assert(applied("low") === "w")
    assert(applied("lower") === "wer")
  }

  test("tokenCounts equals summed merged-word lengths (and 0 for empty text)") {
    val docs = spark.createDataFrame(Seq(
      (1L, "newest widest low"),
      (2L, ""),
      (3L, "lower lower")))
      .toDF("doc_id", "text")
    val words = wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 3)
    val got = Bpe.tokenCounts(docs, "text", m, "n_bpe")
      .orderBy("doc_id").collect().map(_.getAs[Long]("n_bpe")).toSeq
    // new<2>(4) + wid<2>(4) + <3>w(2) = 10 ; "" = 0 ; <3>wer(4) x2 = 8
    assert(got === Seq(10L, 0L, 8L))
  }

  test("greedy left-to-right merge matches replace() semantics on overlaps") {
    // "aaa" with pair "aa": replace merges left-to-right non-overlapping,
    // so round 1 yields <1>a (not a<1>) — the BPE apply convention.
    val words = wordsDf("aaa" -> 1L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 1)
    val applied = Bpe.applyMerges(words, "w", m, "mw").collect().head.getAs[String]("mw")
    assert(applied === "a")
  }

  test("training stops early when the vocabulary runs out of pairs") {
    // "ab" admits exactly 2 merges: ab -> <1>, then no length-2 words left
    val words = wordsDf("ab" -> 3L, "c" -> 9L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 10)
    assert(m.count() === 1L)
  }

  test("placeholder collision and null inputs fail loudly") {
    val dirty = wordsDf("ok" -> 1L, "badword" -> 1L)
    val e = intercept[Exception] {
      Bpe.fit(spark, dirty, "w", "wcnt", nMerges = 2).collect()
    }
    assert(e.getMessage.contains("placeholder") ||
      Option(e.getCause).exists(_.getMessage.contains("placeholder")))
    assertThrows[IllegalArgumentException] {
      Bpe.fit(spark, wordsDf("ab" -> 1L), "w", "wcnt", nMerges = 0)
    }
    assertThrows[IllegalArgumentException] {
      // placeholder range must stay below 256 (Spark chr is mod-256)
      Bpe.fit(spark, wordsDf("ab" -> 1L), "w", "wcnt", nMerges = 10, baseCp = 250)
    }
  }

  test("decodeSpellings inverts applyMerges exactly (surface round trip)") {
    val words = wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.fit(spark, words, "w", "wcnt", nMerges = 3)
    val applied = Bpe.applyMerges(words, "w", m, "mw")
    val back = Bpe.decodeSpellings(applied, "mw", m, "decoded")
      .collect().map(r => r.getAs[String]("w") -> r.getAs[String]("decoded")).toMap
    assert(back === Map("low" -> "low", "lower" -> "lower",
      "newest" -> "newest", "widest" -> "widest"),
      "reverse-order expansion must ground every placeholder")
    // the vocab view decodes each merged symbol to a real subword
    val vocab = Bpe.decodeSpellings(m, "pair", m, "token")
      .orderBy("round").collect().map(_.getAs[String]("token")).toSeq
    assert(vocab === Seq("es", "est", "lo"))
  }

  test("16-merge fit on real documents: applying merges back is lossless in weight") {
    // invariant: merging never changes the wcnt-weighted WORD count, and
    // symbol counts decrease monotonically round over round
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    val wc = Bpe.wordCounts(docs, "text")
    val m = Bpe.fit(spark, wc, "w", "wcnt", nMerges = 16)
    val rounds = m.orderBy("round").collect()
    assert(rounds.length === 16)
    // each elected pair count is positive and the sequence of counts is
    // non-increasing is NOT guaranteed (merges can create new frequent
    // pairs) — but every count must be >= 1
    assert(rounds.forall(_.getAs[Long]("n") >= 1L))
    // applying all merges, total symbols = sum(wcnt * len(merged)) must be
    // strictly below the unmerged character count (16 real merges)
    val applied = Bpe.applyMerges(wc, "w", m, "mw")
    val Array(before, after) = applied
      .agg(sum(expr("wcnt * length(w)")), sum(expr("wcnt * length(mw)")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(after < before, s"16 merges must compress: $after !< $before")
  }
}
