package graft.sources.bi5

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The whole source through the Hadoop FileSystem store: `file://` URIs route
 * every listing/open through [[HadoopBi5Store]] (the same code path an
 * `s3a://`/`hdfs://` root takes), and must reproduce the reference goldens
 * bit-for-bit — batch counts, partition rule, option validation, pushed
 * count, streaming tail.
 */
class Bi5HadoopStoreSpec extends AnyFunSuite {

  private val Fixtures = "/root/reference/spark-2.4/src/test/resources"
  private val FixturesUri = s"file://$Fixtures"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("Bi5HadoopStoreSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("file:// directory read reproduces the EURUSD goldens and partition rule") {
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.format("bi5").option("digits", 5).load(s"$FixturesUri/EURUSD")
    assert(df.count() === 27521)
    assert(df.rdd.getNumPartitions === 2) // one per immediate child, as local
    val maxTs = df.agg(org.apache.spark.sql.functions.max("ts")).head.getTimestamp(0)
    assert(maxTs.toString === "2020-04-03 00:59:59.036") // lenient roll-over golden
  }

  test("file:// single-file read decodes the golden rows") {
    val df = spark.read.format("bi5").option("digits", 5)
      .load(s"$FixturesUri/EURUSD/2019/11/31/15h_ticks.bi5")
    assert(df.count() === 8816)
    assert(df.rdd.getNumPartitions === 1)
    val first = df.orderBy("ts").first()
    assert(first.getAs[Double]("ask") === 1.12207)
    assert(first.getAs[Double]("bid") === 1.12198)
  }

  test("file:// honors january option and digits like the local path") {
    val df = spark.read.format("bi5")
      .option("digits", 3).option("january", 1)
      .load(s"$FixturesUri/USDJPY")
    assert(df.count() === 1454)
  }

  test("file:// invalid path fails at load() with the verbatim message") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("bi5").option("digits", 5).load("file:///definitely/not/here")
    }
    assert(e.getMessage === "Invalid path")
  }

  test("file:// split=files planning and trustHeaders count pushdown") {
    val split = spark.read.format("bi5").option("digits", 5)
      .option("split", "files").load(s"$FixturesUri/EURUSD")
    assert(split.count() === 27521)
    val counted = spark.read.format("bi5").option("digits", 5)
      .option("trustHeaders", true).load(s"$FixturesUri/EURUSD")
    assert(counted.count() === 27521)
  }

  test("file:// ticker filter prunes files through the Hadoop lister") {
    // root holds EURUSD + USDJPY; the EURUSD-digit read filtered to EURUSD
    // must see only EURUSD rows (file pruning on the path-derived ticker)
    val df = spark.read.format("bi5").option("digits", 5).load(FixturesUri)
      .filter(org.apache.spark.sql.functions.col("ticker") === "EURUSD")
    assert(df.count() === 27521)
  }

  test("file:// streaming tail picks up arriving files through the Hadoop store") {
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("bi5hadoopstream")
    def install(rel: String): Unit = {
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(Paths.get(s"$Fixtures/$rel"), dst, StandardCopyOption.REPLACE_EXISTING)
    }
    install("EURUSD/2019/11/31/15h_ticks.bi5")
    val q = spark.readStream.format("bi5").option("digits", 5)
      .load(s"file://$root")
      .writeStream.format("memory").queryName("bi5_hadoop_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_hadoop_tail").head.getLong(0) === 8816)
      install("EURUSD/2020/03/02/12h_ticks.bi5")
      q.processAllAvailable()
      assert(spark.sql("select count(*) from bi5_hadoop_tail").head.getLong(0) === 8816 + 13809)
    } finally q.stop()
  }

  test("HadoopBi5Store survives java serialization with its configuration") {
    val store = Bi5Store.forPath(s"$FixturesUri/EURUSD")
    assert(store.isInstanceOf[HadoopBi5Store])
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(store); oos.close()
      bos.toByteArray
    }
    val back = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[Bi5Store]
    val files = back.listBi5Files(s"$FixturesUri/EURUSD")
    assert(files.size === 4) // all EURUSD fixture files, recursive
    assert(files.forall(_._2 > 0))
  }

  test("bare local paths still use the nio store") {
    assert(Bi5Store.forPath("/some/local/dir") === NioBi5Store)
    assert(Bi5Store.forPath(s"$FixturesUri/EURUSD").isInstanceOf[HadoopBi5Store])
  }
}
