package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Locks the r11 size-adaptive trainer dispatch: the driver-local
 * incremental election ([[BpeInt.fitLocal]]) must produce EXACTLY the
 * merge table of the distributed per-round loop — same pairs, same ids,
 * same rounds, same elected counts — on real corpus-shaped unit tables
 * for both the int-symbol (code-point) and byte-level (GPT-2 pre-token)
 * trainers. The dispatch is forced through
 * `spark.graft.bpe.localFitMaxChars` (0 = always distributed, huge =
 * always local).
 */
class BpeLocalFitSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("BpeLocalFitSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def docs = graft.queries.Tables.table(spark, Sf, "documents")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Int, Int, Int, Long)] =
    df.orderBy("midx").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))

  test("int-symbol trainer: local election == distributed election (4-gram units)") {
    val units = BpeInt.fourgramCounts(docs, "text").localCheckpoint(true)
    spark.conf.set("spark.graft.bpe.localFitMaxChars", "0")
    val dist = rowsOf(BpeInt.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 512, maxRounds = 16, candCap = 2048, acceptCap = 128))
    spark.conf.set("spark.graft.bpe.localFitMaxChars", Long.MaxValue.toString)
    val local = rowsOf(BpeInt.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 512, maxRounds = 16, candCap = 2048, acceptCap = 128))
    spark.conf.unset("spark.graft.bpe.localFitMaxChars")
    assert(local.size == dist.size)
    assert(local == dist)
  }

  test("byte-level trainer: local election == distributed election (GPT-2 pre-token units)") {
    val units = BpeByte.pretokenCounts(docs, "text").localCheckpoint(true)
    spark.conf.set("spark.graft.bpe.localFitMaxChars", "0")
    val dist = rowsOf(BpeByte.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 256, maxRounds = 16, candCap = 512, acceptCap = 64))
    spark.conf.set("spark.graft.bpe.localFitMaxChars", Long.MaxValue.toString)
    val local = rowsOf(BpeByte.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 256, maxRounds = 16, candCap = 512, acceptCap = 64))
    spark.conf.unset("spark.graft.bpe.localFitMaxChars")
    assert(local.size == dist.size)
    assert(local == dist)
  }

  private def strRowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.orderBy("round").collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("string trainer fit: local election == distributed election (word units)") {
    val units = Bpe.wordCounts(docs, "text").localCheckpoint(true)
    spark.conf.set("spark.graft.bpe.localFitMaxChars", "0")
    val dist = strRowsOf(Bpe.fit(spark, units, "w", "wcnt", nMerges = 24))
    spark.conf.set("spark.graft.bpe.localFitMaxChars", Long.MaxValue.toString)
    val local = strRowsOf(Bpe.fit(spark, units, "w", "wcnt", nMerges = 24))
    spark.conf.unset("spark.graft.bpe.localFitMaxChars")
    assert(local == dist)
  }

  test("string trainer fitBlocked: local election == distributed election (bigram units)") {
    val units = Bpe.bigramCounts(docs, "text").localCheckpoint(true)
    spark.conf.set("spark.graft.bpe.localFitMaxChars", "0")
    val dist = strRowsOf(Bpe.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 96, maxRounds = 12, candCap = 256, acceptCap = 24))
    spark.conf.set("spark.graft.bpe.localFitMaxChars", Long.MaxValue.toString)
    val local = strRowsOf(Bpe.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 96, maxRounds = 12, candCap = 256, acceptCap = 24))
    spark.conf.unset("spark.graft.bpe.localFitMaxChars")
    assert(local == dist)
  }

  test("multi-codepoint and self-pair units elect identically on both paths") {
    import spark.implicits._
    // surrogate pairs (emoji), CJK, an (a,a) run corpus, and skewed counts
    val units = Seq(
      ("aaaa", 7L), ("aaa", 5L), ("abab", 11L), ("😀😀x", 3L),
      ("漢字漢字", 9L), ("banana", 13L), ("bandana", 2L))
      .toDF("w", "wcnt")
    spark.conf.set("spark.graft.bpe.localFitMaxChars", "0")
    val dist = rowsOf(BpeInt.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 32, maxRounds = 16, candCap = 64, acceptCap = 8))
    spark.conf.set("spark.graft.bpe.localFitMaxChars", Long.MaxValue.toString)
    val local = rowsOf(BpeInt.fitBlocked(spark, units, "w", "wcnt",
      nMerges = 32, maxRounds = 16, candCap = 64, acceptCap = 8))
    spark.conf.unset("spark.graft.bpe.localFitMaxChars")
    assert(local == dist)
  }
}
