package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** canonical_url: rule-by-rule edge cases, interpreted == codegen, and the
  * UTF-8-byte-order param sort that makes DuckDB replays exact. */
class UrlExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("UrlExpressionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    UrlExpressions.register(s)
    s
  }

  private def canon(u: String): String =
    spark.sql(s"select canonical_url('${u.replace("'", "''")}')").head().getString(0)

  test("rule-by-rule: fragment, case, www, ports, trailing slash, tracking, sort") {
    assert(canon("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&b=2&a=1#frag")
      === "http://ex.com/A/b?a=1&b=2")
    assert(canon("https://ex.com:443/") === "https://ex.com")
    assert(canon("https://ex.com:8443/x") === "https://ex.com:8443/x",
      "non-default ports survive")
    assert(canon("http://ex.com:443/x") === "http://ex.com:443/x",
      "443 is only default for https")
    assert(canon("http://ex.com/p?fbclid=abc&gclid=d&ref=t&msclkid=e")
      === "http://ex.com/p", "tracking-only query drops the '?' entirely")
    assert(canon("http://ex.com/p?UTM_CAMPAIGN=x&z=1") === "http://ex.com/p?z=1",
      "utm_ prefix is case-insensitive")
    assert(canon("http://ex.com/p?z=UPPER") === "http://ex.com/p?z=UPPER",
      "values keep their case")
    assert(canon("http://ex.com/a//") === "http://ex.com/a",
      "all trailing slashes strip")
    assert(canon("http://ex.com") === "http://ex.com", "empty path stays empty")
    assert(canon("http://ex.com/p?a=1&&a=1") === "http://ex.com/p?a=1&a=1",
      "empties drop, duplicates keep")
  }

  test("no scheme -> opaque passthrough after fragment strip; null -> null") {
    assert(canon("mailto:x@y.z#frag") === "mailto:x@y.z")
    assert(canon("just a string") === "just a string")
    val r = spark.sql("select canonical_url(cast(null as string))").head()
    assert(r.isNullAt(0))
  }

  test("param sort is UTF-8 byte order (DuckDB list_sort parity)") {
    // 'é' (C3 A9 in UTF-8) must sort after any ASCII key; UTF-16 code-unit
    // order agrees here, but byte-order is the documented contract — pin a
    // case where naive uppercase-vs-lowercase ordering would differ too
    assert(canon("http://ex.com/p?é=2&Z=1&a=3") === "http://ex.com/p?Z=1&a=3&é=2")
  }

  test("interpreted eval equals codegen on generated urls") {
    val df = spark.range(0, 300).toDF("id").selectExpr(
      """concat('HTTP://WWW.h', cast(id % 7 as string), '.COM:80/P',
                cast(id % 3 as string), '/?utm_x=1&b=', cast(id % 5 as string),
                '&a=1#f') as url""")
    val gen = df.selectExpr("canonical_url(url) as c").collect().map(_.getString(0))
    val interp = df.collect().map(r => UrlKit.canonicalJava(r.getString(0)))
    assert(gen.toSeq === interp.toSeq)
  }
}
