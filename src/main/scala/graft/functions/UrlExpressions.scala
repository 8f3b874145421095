package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `canonical_url(s)` — the URL-normalization stage of web-corpus dedup
 * (the first dedup pass a crawl pipeline runs is BY URL, before any
 * content hash: re-crawls, tracking-tagged shares and http/https mirrors
 * of one page collapse to one canonical key). One compiled pass, fully
 * codegen'd (`defineCodeGen` → static call, stays inside WholeStageCodegen
 * like the shingle/CDC expressions in [[TextExpressions]]).
 *
 * Deterministic rule set (each independently replayable in oracle SQL):
 *  1. strip the fragment (first '#' onward);
 *  2. no "://" → return the fragment-stripped input verbatim (opaque);
 *  3. lowercase the scheme and the authority;
 *  4. strip one leading "www." from the host;
 *  5. drop the default port (:80 for http, :443 for https) and any empty
 *     ":" port;
 *  6. strip ALL trailing '/' from the path ("/a/" == "/a", "/" == "");
 *  7. drop tracking params (any "utm_" key prefix, and exact keys fbclid,
 *     gclid, msclkid, ref — all case-insensitive), drop empty params,
 *     sort survivors by UTF-8 BYTE order (ties keep duplicates), re-join
 *     with '&' — param VALUES keep their case;
 *  8. reassemble scheme://host[:port][path][?query].
 *
 * Null in → null out. The byte-order sort (not UTF-16 code-unit order)
 * is what makes a DuckDB `list_sort` replay bit-identical on non-ASCII
 * query strings.
 */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"canonical_url expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    UrlKit.canonical(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlKit.canonical($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object UrlKit {

  private val TrackingKeys = Set("fbclid", "gclid", "msclkid", "ref")

  /** Shared by interpreted eval and generated code. */
  def canonical(u: UTF8String): UTF8String = {
    if (u == null) return null
    UTF8String.fromString(canonicalJava(u.toString))
  }

  def canonicalJava(raw: String): String = {
    // 1. fragment
    val hash = raw.indexOf('#')
    val s = if (hash >= 0) raw.substring(0, hash) else raw
    // 2. scheme split
    val sep = s.indexOf("://")
    if (sep < 0) return s
    val scheme = s.substring(0, sep).toLowerCase
    val rest = s.substring(sep + 3)
    // authority = up to first '/' or '?'
    var aEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { aEnd = i; found = true }
      i += 1
    }
    var authority = rest.substring(0, aEnd).toLowerCase
    val pathAndQuery = rest.substring(aEnd)
    // 4. www.
    if (authority.startsWith("www.")) authority = authority.substring(4)
    // 5. ports
    val colon = authority.lastIndexOf(':')
    var host = authority
    var port = ""
    if (colon >= 0) {
      host = authority.substring(0, colon)
      port = authority.substring(colon + 1)
      if (port.isEmpty ||
        (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) port = ""
    }
    // 6./7. path + query
    val q = pathAndQuery.indexOf('?')
    var path = if (q >= 0) pathAndQuery.substring(0, q) else pathAndQuery
    val query = if (q >= 0) pathAndQuery.substring(q + 1) else ""
    while (path.nonEmpty && path.charAt(path.length - 1) == '/')
      path = path.substring(0, path.length - 1)
    val kept = query.split("&", -1).filter { p =>
      if (p.isEmpty) false
      else {
        val eq = p.indexOf('=')
        val key = (if (eq >= 0) p.substring(0, eq) else p).toLowerCase
        !key.startsWith("utm_") && !TrackingKeys.contains(key)
      }
    }
    // UTF-8 byte order (UTF8String.compareTo is byte-wise unsigned), so a
    // DuckDB list_sort replay is bit-identical on non-ASCII too
    java.util.Arrays.sort(kept, (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (port.nonEmpty) sb.append(':').append(port)
    sb.append(path)
    if (kept.nonEmpty) {
      sb.append('?')
      var j = 0
      while (j < kept.length) {
        if (j > 0) sb.append('&')
        sb.append(kept(j))
        j += 1
      }
    }
    sb.toString
  }
}

object UrlExpressions {
  private val canonicalUrlBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"canonical_url takes 1 argument, got ${exprs.length}")
    CanonicalUrl(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("canonical_url")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("canonical_url", canonicalUrlBuilder, "built-in")
    }
  }
}
