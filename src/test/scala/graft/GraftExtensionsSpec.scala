package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must expose the native functions to a session
  * configured only with `spark.sql.extensions` — the zero-code-integration
  * path for SQL-only users. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate() silently IGNORES spark.sql.extensions when a default
    // session already exists (any earlier suite in this JVM) — and the query
    // library registers the functions imperatively, which would make this
    // test pass without the extension ever running. Stop any pre-existing
    // session so the config path is genuinely exercised; suites run
    // sequentially, and later ones getOrCreate a fresh session.
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("vec_dot and word_ngrams are usable from pure SQL") {
    val r = spark.sql(
      """select
           vec_dot(array(cast(1.5 as float), cast(2.0 as float)),
                   array(cast(2.0 as float), cast(0.5 as float))) as dot,
           word_ngrams(array('a', 'b', 'c', 'd'), 2) as bigrams
      """).head()
    assert(r.getDouble(0) === 4.0)
    assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
  }
}
