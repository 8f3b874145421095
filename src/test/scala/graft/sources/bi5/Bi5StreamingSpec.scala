package graft.sources.bi5

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming tail of a growing bi5 tree: files copied in between triggers
  * must appear incrementally, exactly once. */
class Bi5StreamingSpec extends AnyFunSuite {

  private val Fixtures = "/root/reference/spark-2.4/src/test/resources"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("Bi5StreamingSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batch stream picks up arriving hour files incrementally") {
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("bi5stream")
    def installFile(rel: String): Unit = {
      val src = Paths.get(s"$Fixtures/$rel")
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }

    installFile("EURUSD/2019/11/31/15h_ticks.bi5") // 8816 rows

    val stream = spark.readStream.format("bi5")
      .option("digits", 5)
      .load(root.toString)
    val q = stream.writeStream
      .format("memory").queryName("bi5_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_tail").head.getLong(0) === 8816)

      // a new hour file "arrives"
      installFile("EURUSD/2020/03/02/12h_ticks.bi5") // 13809 rows
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_tail").head.getLong(0) === 8816 + 13809)

      // no duplicates: re-trigger without new files
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_tail").head.getLong(0) === 8816 + 13809)
      // per-ticker integrity
      assert(spark.sql("select count(distinct ticker) from bi5_tail").head.getLong(0) === 1)
    } finally q.stop()
  }

  test("unpadded hour components stream in event-time order, not path order") {
    // layout regex admits '9h_ticks.bi5'; '10h...' sorts BEFORE '9h...'
    // lexicographically, so a raw-path offset would drop hour 10 forever
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("bi5unpadded")
    def copyAs(src: String, rel: String): Unit = {
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(Paths.get(s"$Fixtures/$src"), dst, StandardCopyOption.REPLACE_EXISTING)
    }
    copyAs("EURUSD/2019/11/31/15h_ticks.bi5", "EURUSD/2020/03/02/9h_ticks.bi5") // 8816 rows
    val q = spark.readStream.format("bi5")
      .option("digits", 5)
      .load(root.toString)
      .writeStream.format("memory").queryName("bi5_unpadded").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_unpadded").head.getLong(0) === 8816)
      // hour 10 arrives AFTER hour 9 was committed; must not be skipped
      copyAs("EURUSD/2020/03/02/12h_ticks.bi5", "EURUSD/2020/03/02/10h_ticks.bi5") // 13809 rows
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_unpadded").head.getLong(0) === 8816 + 13809)
    } finally q.stop()
  }

  test("offset deserialization is strict: legacy/foreign checkpoints fail loudly") {
    assert(Bi5StreamOffset.fromJson("") === Bi5StreamOffset.Initial)
    val rt = Bi5StreamOffset(1583143200000000L, "/data/EURUSD/2020/03/02/10h_ticks.bi5")
    assert(Bi5StreamOffset.fromJson(rt.json()) === rt)
    intercept[IllegalStateException] { Bi5StreamOffset.fromJson("5") } // old count format
    intercept[IllegalStateException] { Bi5StreamOffset.fromJson("/just/a/path") }
  }

  test("pruned relist never re-enumerates committed day directories") {
    val root = Files.createTempDirectory("bi5prune")
    def install(rel: String): Unit = {
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(
        Paths.get(s"$Fixtures/EURUSD/2019/11/31/15h_ticks.bi5"), dst,
        StandardCopyOption.REPLACE_EXISTING)
    }
    // an "archive" of old day dirs plus one frontier day
    for (d <- 1 to 5) install(s"EURUSD/2020/01/0$d/3h_ticks.bi5")
    install("EURUSD/2020/03/02/9h_ticks.bi5")

    // committed offset = the frontier day's 9h file
    val committed = Bi5PathMeta
      .parse(root.resolve("EURUSD/2020/03/02/9h_ticks.bi5").toString, 0).get.baseEpochMicros

    val enumerated = scala.collection.mutable.ArrayBuffer.empty[String]
    val listed = Bi5FileLister.listBi5FilesSince(NioBi5Store, root.toString, committed, 0, enumerated += _)

    // every archive DAY dir was skipped, never enumerated (the month dir
    // itself is visited — its bound carries the lenient 99-day slack)
    assert(!enumerated.exists(_.contains("2020/01/")), s"re-enumerated archive: $enumerated")
    // … the frontier day was still listed, including the AT-offset file
    // (the exact (base, path) key filter owns that tiebreak downstream)
    assert(listed.map(_._1).exists(_.endsWith("2020/03/02/9h_ticks.bi5")))
    // and a file arriving in a NEW hour dir is picked up by the same walk
    install("EURUSD/2020/03/02/10h_ticks.bi5")
    val listed2 = Bi5FileLister.listBi5FilesSince(NioBi5Store, root.toString, committed, 0)
    assert(listed2.map(_._1).exists(_.endsWith("10h_ticks.bi5")))
  }

  test("pruned relist respects lenient calendar roll-over bounds") {
    val root = Files.createTempDirectory("bi5prunelenient")
    // dir 2019/11/31 with january=0 is REALLY 2019-12-31 (month 11 = December,
    // lenient): a naive strict-date bound would prune it against a
    // committed offset of 2019-12-15, losing the file
    val dst = root.resolve("EURUSD/2019/11/31/15h_ticks.bi5")
    Files.createDirectories(dst.getParent)
    Files.copy(Paths.get(s"$Fixtures/EURUSD/2019/11/31/15h_ticks.bi5"), dst,
      StandardCopyOption.REPLACE_EXISTING)
    val committed = Bi5PathMeta.lenientBaseMicros(2019, 11, 15, 0) // 2019-12-15
    val listed = Bi5FileLister.listBi5FilesSince(NioBi5Store, root.toString, committed, 0)
    assert(listed.map(_._1).exists(_.endsWith("15h_ticks.bi5")),
      "lenient roll-over file must survive the pruned walk")
    // while a genuinely old month dir IS pruned
    val old = root.resolve("EURUSD/2019/05/01/3h_ticks.bi5")
    Files.createDirectories(old.getParent)
    Files.copy(Paths.get(s"$Fixtures/EURUSD/2019/11/31/15h_ticks.bi5"), old,
      StandardCopyOption.REPLACE_EXISTING)
    val enumerated = scala.collection.mutable.ArrayBuffer.empty[String]
    Bi5FileLister.listBi5FilesSince(NioBi5Store, root.toString, committed, 0, enumerated += _)
    assert(!enumerated.exists(_.contains("2019/05")), "old month dir must not be enumerated")
  }

  test("maxFilesPerTrigger paces the backlog without losing data") {
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("bi5paced")
    for (rel <- Seq("EURUSD/2019/11/31/15h_ticks.bi5", "EURUSD/2020/03/02/12h_ticks.bi5")) {
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(Paths.get(s"$Fixtures/$rel"), dst, StandardCopyOption.REPLACE_EXISTING)
    }
    val q = spark.readStream.format("bi5")
      .option("digits", 5)
      .option("maxFilesPerTrigger", 1) // backlog of 2 files -> 2 micro-batches
      .load(root.toString)
      .writeStream.format("memory").queryName("bi5_paced").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_paced").head.getLong(0) === 8816 + 13809)
      // admission control actually split the backlog into multiple batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }
}
