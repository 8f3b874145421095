package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `scrub_pii(s)` — PII redaction for pretraining corpora: the scrub pass
 * every published web-corpus pipeline runs before tokenization (emails,
 * phone numbers, IPs and card numbers must not reach the training set).
 * Deterministic, documented rule set; precompiled patterns called from a
 * static kit (the [[StripHtml]] discipline — stays inside whole-stage
 * codegen). Null in → null out.
 *
 * Rules, applied in THIS order (order is part of the contract — an IPv4
 * must be claimed before the phone rule could mistake its digit runs):
 *
 *  1. EMAIL → `<EMAIL>`: localpart `[A-Za-z0-9._%+-]+` at `@`, dotted
 *     domain labels, 2+ alpha TLD.
 *  2. IPV4 → `<IP>`: four 0-255 octets, not embedded in a longer
 *     digits-and-dots run (no match inside `1.2.3.4.5` or `256.1.1.1`).
 *  3. CARD → `<CARD>`: 13-19 digits optionally grouped by single spaces
 *     or dashes, PASSING the Luhn checksum — a 16-digit random number
 *     that fails Luhn is NOT a card and stays untouched.
 *  4. PHONE → `<PHONE>`: optional `+`country, optional `(area)`,
 *     separator-grouped digit runs whose TOTAL digit count is 10-15
 *     (the E.164 envelope) — dates (8 digits) and short ids never match.
 *
 * Scrubbing is idempotent: placeholders contain no digits or `@`.
 */
case class ScrubPii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"scrub_pii expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PiiKit.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiKit.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): ScrubPii =
    copy(child = newChild)
}

object PiiKit {

  private val Email = Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*\\.[A-Za-z]{2,}")

  private val Octet = "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
  // lookahead rejects ".<digit>"/"<digit>" continuations (no match inside
  // 1.2.3.4.5) but allows a sentence-ending period after the last octet
  private val Ipv4 = Pattern.compile(
    s"(?<![\\d.])($Octet\\.){3}$Octet(?!\\.?\\d)")

  // candidate only — Luhn decides (single space/dash group separators)
  private val CardCand = Pattern.compile(
    "(?<![\\d-])\\d(?:[ -]?\\d){12,18}(?![\\d-])")

  private val Phone = Pattern.compile(
    "(?<![\\dA-Za-z.(])(?:\\+?\\d{1,3}[- .]?)?(?:\\(\\d{1,4}\\)[- .]?)?" +
      "\\d{2,4}(?:[- .]\\d{2,4}){1,3}(?![\\dA-Za-z.])")

  def scrub(u: UTF8String): UTF8String = {
    if (u == null) return null
    UTF8String.fromString(scrubJava(u.toString))
  }

  def scrubJava(s: String): String = {
    var out = Email.matcher(s).replaceAll("<EMAIL>")
    out = Ipv4.matcher(out).replaceAll("<IP>")
    out = replaceCards(out)
    out = replacePhones(out)
    out
  }

  /** Card candidates survive only with 13-19 digits AND a valid Luhn sum. */
  private def replaceCards(s: String): String = {
    val m = CardCand.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      val run = m.group()
      if (luhnValid(run)) {
        sb.append(s, last, m.start()).append("<CARD>")
        last = m.end()
      }
    }
    if (last == 0) s else { sb.append(s, last, s.length); sb.toString }
  }

  private def replacePhones(s: String): String = {
    val m = Phone.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      var digits = 0
      val run = m.group()
      var i = 0
      while (i < run.length) {
        if (run.charAt(i) >= '0' && run.charAt(i) <= '9') digits += 1
        i += 1
      }
      if (digits >= 10 && digits <= 15) {
        sb.append(s, last, m.start()).append("<PHONE>")
        last = m.end()
      }
    }
    if (last == 0) s else { sb.append(s, last, s.length); sb.toString }
  }

  def luhnValid(run: String): Boolean = {
    var sum = 0
    var alt = false
    var digits = 0
    var i = run.length - 1
    while (i >= 0) {
      val c = run.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
        digits += 1
      }
      i -= 1
    }
    digits >= 13 && digits <= 19 && sum % 10 == 0
  }
}

object PiiExpressions {
  private val scrubPiiBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"scrub_pii takes 1 argument, got ${exprs.length}")
    ScrubPii(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("scrub_pii")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("scrub_pii", scrubPiiBuilder, "built-in")
    }
  }
}
