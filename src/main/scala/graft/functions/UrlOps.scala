package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * RFC 3986 URL canonicalization as one native expression — the dedup
 * key for web-scale corpora: a crawl sees the same page as
 * `HTTP://Ex.Org:80/a/../b`, `http://ex.org/b` and `http://ex.org/b#s`,
 * and URL-level dedup (the cheapest dedup tier, before any content
 * hash) needs them to collide. Normalizations applied (RFC 3986 §6.2,
 * the safe "semantics-preserving" set):
 *
 *  - scheme and host lowercased (§6.2.2.1);
 *  - percent-encodings of unreserved chars (ALPHA DIGIT `-._~`)
 *    decoded, all remaining escapes uppercased (§6.2.2.2) in path and
 *    query; malformed escapes pass through literally (total function);
 *  - dot-segments removed from the path (§6.2.2.3 / §5.2.4);
 *  - default ports dropped (http/ws 80, https/wss 443, ftp 21) and
 *    empty `:` ports stripped (§6.2.3);
 *  - empty path -> `/` (§6.2.3);
 *  - the fragment is REMOVED — not an RFC equivalence, but the
 *    convention of crawl dedup (fragments never reach the server);
 *    documented deviation.
 *
 * Non-hierarchical inputs (no `://`, bad scheme chars, empty or
 * non-numeric-port authority) return null — the caller's violation
 * path, mirroring pydantic's UrlSpec parse-or-error shape
 * (`networks.py` Url types; reference validates, this canonicalizes
 * the already-validated wire form).
 *
 * Scale: pure per-row scalar, fuses into whole-stage codegen beside
 * the dedup groupBy that consumes it; the canonical string is the
 * shuffle key, so canonicalization cost is one pass over the bytes.
 */
object UrlOps {

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** §6.2.2.2: decode unreserved escapes, uppercase the rest. */
  private def pctNorm(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 &&
        hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) out.append(v.toChar)
        else {
          out.append('%')
          out.append(Character.toUpperCase(s.charAt(i + 1)))
          out.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new java.util.ArrayDeque[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (!out.isEmpty) out.removeLast() }
      else if (in == "/..") { in = "/"; if (!out.isEmpty) out.removeLast() }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', from)
        val seg = if (slash < 0) in else in.substring(0, slash)
        out.addLast(seg)
        in = if (slash < 0) "" else in.substring(slash)
      }
    }
    val sb = new java.lang.StringBuilder(path.length)
    val it = out.iterator()
    while (it.hasNext) sb.append(it.next())
    sb.toString
  }

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" | "ws" => 80
    case "https" | "wss" => 443
    case "ftp" => 21
    case _ => -1
  }

  /** Canonical form, or null for non-hierarchical/invalid input. */
  def canon(url: String): String = {
    // fragment first: it never reaches the server
    val hash = url.indexOf('#')
    val u = if (hash < 0) url else url.substring(0, hash)
    val sep = u.indexOf("://")
    if (sep <= 0) return null
    var i = 0
    while (i < sep) {
      val c = u.charAt(i)
      val ok = Character.isLetter(c) ||
        (i > 0 && (Character.isDigit(c) || c == '+' || c == '-' || c == '.'))
      if (!ok) return null
      i += 1
    }
    val scheme = u.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    var p = sep + 3
    var end = p
    while (end < u.length && u.charAt(end) != '/' && u.charAt(end) != '?') end += 1
    val authority = u.substring(p, end)
    if (authority.isEmpty) return null
    val at = authority.lastIndexOf('@')
    val userinfo = if (at < 0) null else authority.substring(0, at)
    val hostPort = authority.substring(at + 1)
    var host: String = null
    var portStr: String = null
    if (hostPort.startsWith("[")) { // IPv6 literal
      val rb = hostPort.indexOf(']')
      if (rb < 0) return null
      host = hostPort.substring(0, rb + 1)
      val rest = hostPort.substring(rb + 1)
      if (rest.startsWith(":")) portStr = rest.substring(1)
      else if (rest.nonEmpty) return null
    } else {
      val colon = hostPort.lastIndexOf(':')
      if (colon < 0) host = hostPort
      else { host = hostPort.substring(0, colon); portStr = hostPort.substring(colon + 1) }
    }
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    var port = -1
    if (portStr != null && portStr.nonEmpty) {
      var k = 0
      var v = 0L
      while (k < portStr.length) {
        val c = portStr.charAt(k)
        if (c < '0' || c > '9') return null
        v = v * 10 + (c - '0')
        if (v > 65535) return null
        k += 1
      }
      port = v.toInt
    }
    if (port == defaultPort(scheme)) port = -1
    val rest = u.substring(end)
    val q = rest.indexOf('?')
    val rawPath = if (q < 0) rest else rest.substring(0, q)
    val rawQuery = if (q < 0) null else rest.substring(q + 1)
    var path = removeDotSegments(pctNorm(rawPath))
    if (path.isEmpty) path = "/"
    val sb = new java.lang.StringBuilder(u.length)
    sb.append(scheme).append("://")
    if (userinfo != null) sb.append(userinfo).append('@')
    sb.append(host)
    if (port >= 0) sb.append(':').append(port)
    sb.append(path)
    if (rawQuery != null) sb.append('?').append(pctNorm(rawQuery))
    sb.toString
  }

  /** eval/codegen funnel. */
  def canonUtf8(s: UTF8String): UTF8String = {
    val r = canon(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def urlCanonCol(c: Column): Column =
    ColumnShim.column(UrlCanon(ColumnShim.expression(c)))
}

/** `url_canon(str)` -> canonical URL string or null (see [[UrlOps]]). */
case class UrlCanon(child: Expression) extends UnaryExpression {
  override def prettyName: String = "url_canon"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UrlOps.canonUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      |${ev.value} = graft.functions.UrlOps.canonUtf8($s);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): UrlCanon =
    copy(child = c)
}
