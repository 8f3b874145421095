package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** strip_html: grammar rule-by-rule, hostile fragments, interpreted ==
  * codegen. */
class HtmlExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("HtmlExpressionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    HtmlExpressions.register(s)
    s
  }

  private def strip(h: String): String =
    spark.sql(s"select strip_html('${h.replace("'", "''")}')").head().getString(0)

  test("tags become block boundaries; script/style/head drop with contents") {
    assert(strip("<h1>A</h1><p>B</p>") === "A B", "adjacent blocks never concatenate")
    assert(strip("<p>x<b>y</b>z</p>") === "x y z", "inline tags also separate")
    assert(strip("<head><title>t</title><style>p{c}</style></head><body>B</body>") === "B")
    assert(strip("<SCRIPT>var x = '<p>sneaky</p>';</SCRIPT>ok") === "ok",
      "script contents drop case-insensitively")
    assert(strip("<style media=\"x\">q{}</style>R") === "R",
      "attributes on dropped elements are fine")
    assert(strip("<scripty>keep</scripty>") === "keep",
      "tag-name prefix match requires a word boundary")
  }

  test("comments, entities, whitespace collapse, hostile fragments") {
    assert(strip("a<!-- <p>gone</p> -->b") === "a b")
    assert(strip("x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b")
      === "x & y <tag> \"q\" 's' a b")
    assert(strip("a  \n\t  b") === "a b")
    assert(strip("  <p> padded </p>  ") === "padded", "trimmed ends")
    assert(strip("a &unknown; b") === "a &unknown; b", "unknown entities pass through")
    assert(strip("a<script>never closed") === "a", "unterminated dropped element")
    assert(strip("a<!-- never closed") === "a", "unterminated comment")
    assert(strip("a<b unclosed") === "a", "unterminated tag eats the tail")
    assert(strip("") === "")
    val r = spark.sql("select strip_html(cast(null as string))").head()
    assert(r.isNullAt(0))
  }

  test("interpreted eval equals codegen on generated fragments") {
    val df = spark.range(0, 200).toDF("id").selectExpr(
      """concat('<html><head><title>t', cast(id as string),
               '</title></head><body><h1>H', cast(id % 7 as string),
               '</h1><p>word', cast(id as string), '&nbsp;tail</p></body></html>') as h""")
    val gen = df.selectExpr("strip_html(h) as c").collect().map(_.getString(0))
    val interp = df.collect().map(r => HtmlKit.stripJava(r.getString(0)))
    assert(gen.toSeq === interp.toSeq)
    assert(gen(13) === "H6 word13 tail")
  }
}
