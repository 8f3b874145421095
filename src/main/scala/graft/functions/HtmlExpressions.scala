package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `strip_html(s)` — the text-extraction stage between crawl payloads and
 * text curation (the lightweight tag-stripper every web-corpus pipeline
 * runs before dedup/quality; trafilatura-class boilerplate REMOVAL is a
 * separate concern — q132 covers boilerplate fractions). One compiled
 * single pass, fully codegen'd.
 *
 * Deterministic grammar (documented, replayable):
 *  1. `<!-- ... -->` comments are removed (unterminated: to end of input);
 *  2. `<script>`, `<style>` and `<head>` elements are removed WITH their
 *     contents (case-insensitive, attributes allowed on the open tag;
 *     unterminated: to end of input);
 *  3. every remaining tag `<...>` becomes ONE space (the block-boundary
 *     rule: `<h1>A</h1><p>B</p>` reads "A B", never "AB"; a '>' inside a
 *     quoted attribute is treated as the tag end — the standard
 *     lightweight-stripper simplification);
 *  4. the six ubiquitous entities decode: &amp; &lt; &gt; &quot; &#39;
 *     &nbsp; (the last to a plain space);
 *  5. whitespace runs collapse to one space; leading/trailing trimmed.
 *
 * Null in → null out.
 */
case class StripHtml(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_html expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    HtmlKit.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKit.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripHtml =
    copy(child = newChild)
}

object HtmlKit {

  def strip(u: UTF8String): UTF8String = {
    if (u == null) return null
    UTF8String.fromString(stripJava(u.toString))
  }

  private val Dropped = Array("script", "style", "head")

  def stripJava(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingSpace = true
        } else {
          val dropped = Dropped.find(t =>
            html.regionMatches(true, i + 1, t, 0, t.length) && {
              val after = i + 1 + t.length
              after >= n || !Character.isLetterOrDigit(html.charAt(after))
            })
          dropped match {
            case Some(t) =>
              // skip the whole element, contents included
              val close = indexOfIgnoreCase(html, s"</$t", i)
              if (close < 0) i = n
              else {
                val gt = html.indexOf('>', close)
                i = if (gt < 0) n else gt + 1
              }
              pendingSpace = true
            case None =>
              val gt = html.indexOf('>', i)
              i = if (gt < 0) n else gt + 1
              pendingSpace = true
          }
        }
      } else if (c == '&') {
        val (rep, len) =
          if (html.regionMatches(i, "&amp;", 0, 5)) ("&", 5)
          else if (html.regionMatches(i, "&lt;", 0, 4)) ("<", 4)
          else if (html.regionMatches(i, "&gt;", 0, 4)) (">", 4)
          else if (html.regionMatches(i, "&quot;", 0, 6)) ("\"", 6)
          else if (html.regionMatches(i, "&#39;", 0, 5)) ("'", 5)
          else if (html.regionMatches(i, "&nbsp;", 0, 6)) (" ", 6)
          else ("&", 1)
        rep.foreach(emit)
        i += len
      } else {
        emit(c)
        i += 1
      }
    }
    sb.toString
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}

object HtmlExpressions {
  private val stripHtmlBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"strip_html takes 1 argument, got ${exprs.length}")
    StripHtml(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("strip_html")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("strip_html", stripHtmlBuilder, "built-in")
    }
  }
}
