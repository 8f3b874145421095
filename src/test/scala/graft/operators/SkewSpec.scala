package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew.saltedJoin must equal the plain inner join and actually spread a
  * hot key across salt partitions. */
class SkewSpec extends AnyFunSuite {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("SkewSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("equals the plain inner join on real lineitem/orders data") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val got = Skew.saltedJoin(li, o, Seq("l_orderkey"),
      nSalts = 8, saltBy = Some(col("l_linenumber")))
    val want = li.join(o, Seq("l_orderkey"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0,
      "salted join must equal the plain join")
  }

  test("default salt also reproduces the plain join (id-based, key-independent)") {
    import spark.implicits._
    // one pathologically hot key: 1000 fact rows, 1 dim row
    val fact = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val dim = Seq((42L, "hot"), (7L, "cold")).toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, Seq("k"), nSalts = 8)
    assert(got.count() === 1000)
    assert(got.select("name").distinct().as[String].collect().toSeq === Seq("hot"))
    // the hot key really spreads: with 1000 rows over 8 salts, every salt
    // value must be hit (probability of a miss is ~0 for a hashed id mod)
    val salts = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()).cast("long"), lit(8L)))
      .select(countDistinct("__salt")).head.getLong(0)
    assert(salts === 8L, "the default salt must spread a hot key across all salt values")
  }

  test("NULL and string saltBy values never drop rows") {
    import spark.implicits._
    val fact = Seq(
      (1L, Some("ev-a")), (1L, Some("ev-b")), (1L, None), (2L, None)
    ).toDF("k", "ev")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    // string salt column WITH nulls: a cast-based salt would null out and
    // silently drop the null-salted rows from the inner join
    val got = Skew.saltedJoin(fact, dim, Seq("k"), nSalts = 4, saltBy = Some(col("ev")))
    assert(got.count() === 4, "every fact row must survive regardless of its salt value")
    assert(got.exceptAll(fact.join(dim, Seq("k"))).count() === 0)
  }

  test("invalid arguments are rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] { Skew.saltedJoin(df, df, Nil) }
    intercept[IllegalArgumentException] { Skew.saltedJoin(df, df, Seq("k"), nSalts = 1) }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df.withColumnRenamed("v", "__salt"), df, Seq("k"))
    }
  }
}
