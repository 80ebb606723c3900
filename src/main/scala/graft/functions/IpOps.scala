package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * pydantic's IP types — `IPvAnyAddress` / `IPvAnyInterface` /
 * `IPvAnyNetwork` (`pydantic/networks.py:1159-1302`): try IPv4, then
 * IPv6, and serialize with `to_string_ser_schema` (i.e. CPython
 * `ipaddress.__str__`). The parser transcribes CPython's `ipaddress`
 * module semantics exactly, because that is what pydantic delegates to:
 *
 *  - IPv4: 4 decimal octets, ASCII digits only, <= 3 chars, NO leading
 *    zeros, <= 255 (`_parse_octet`).
 *  - IPv6: `_ip_int_from_string` — min 3 / max 9 colon-parts, one `::`,
 *    1-4 hex digit hextets, embedded IPv4 in the last part, non-empty
 *    `%scope` without further `%`. Canonical form is RFC-5952 via
 *    `_compress_hextets`: lowercase, no leading zeros, the LEFTMOST
 *    LONGEST run of 2+ zero hextets compressed (a single zero hextet is
 *    never compressed: `1:2:3:4:5:6:7::` -> `1:2:3:4:5:6:7:0`).
 *  - Interface: one `/`; prefix = ASCII-digit string (leading zeros fine:
 *    `/024` == `/24`) bounded by 32/128, or — IPv4 ONLY — a dotted
 *    netmask (`255.255.255.0`) or hostmask (`0.0.0.255`)
 *    (`_make_netmask`; the IPv6 variant has no ip-string fallback).
 *    No `/` means the max prefix.
 *  - Network: interface rules + strict host-bits-zero check
 *    (`1.2.3.4/24` raises "has host bits set").
 *
 * Invalid input returns null (the engine maps it to the pydantic error
 * types `ip_any_address` / `ip_any_interface` / `ip_any_network`, which
 * carry no parameters). One static method serves both `eval` and the
 * generated code, so interpreter and codegen cannot diverge.
 */
case class IpCanon(child: Expression, mode: Int) extends UnaryExpression {

  override def prettyName: String = "ip_canon"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(in: Any): Any =
    IpCanon.canonUtf8(in.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val out = ctx.freshName("out")
      s"""
         |UTF8String $out = graft.functions.IpCanon.canonUtf8($s, $mode);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IpCanon =
    copy(child = newChild)
}

object IpCanon {
  final val ModeAddress = 0
  final val ModeInterface = 1
  final val ModeNetwork = 2

  /** Canonical IPv4-or-IPv6 address string, or null. */
  def ipAddress(c: Column): Column =
    ColumnShim.column(IpCanon(ColumnShim.expression(c), ModeAddress))

  /** Canonical interface (`addr/prefixlen`) string, or null. */
  def ipInterface(c: Column): Column =
    ColumnShim.column(IpCanon(ColumnShim.expression(c), ModeInterface))

  /** Canonical strict network (`net/prefixlen`) string, or null. */
  def ipNetwork(c: Column): Column =
    ColumnShim.column(IpCanon(ColumnShim.expression(c), ModeNetwork))

  def canonUtf8(s: UTF8String, mode: Int): UTF8String = {
    val r = canon(s.toString, mode)
    if (r == null) null else UTF8String.fromString(r)
  }

  def canon(s: String, mode: Int): String = mode match {
    case ModeAddress =>
      // both Address constructors raise "Unexpected '/'" before parsing
      if (s.indexOf('/') >= 0) return null
      val v4 = parseV4(s)
      if (v4 != null) renderV4(v4)
      else {
        val v6 = parseV6(s)
        if (v6 == null) null else renderV6(v6)
      }
    case ModeInterface => ifaceCanon(s, strict = false)
    case ModeNetwork => ifaceCanon(s, strict = true)
    case _ => null
  }

  // ------------------------------------------------------------- IPv4

  /** `_parse_octet`: ASCII digits, 1-3 chars, no leading zero, <= 255. */
  private def parseOctet(p: String): Int = {
    if (p.isEmpty || p.length > 3) return -1
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c < '0' || c > '9') return -1
      i += 1
    }
    if (p.length > 1 && p.charAt(0) == '0') return -1
    val v = p.toInt
    if (v > 255) -1 else v
  }

  /** 4 octets or null (`_ip_int_from_string` for v4). */
  def parseV4(s: String): Array[Int] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val v = parseOctet(parts(i))
      if (v < 0) return null
      out(i) = v
      i += 1
    }
    out
  }

  private def renderV4(o: Array[Int]): String =
    s"${o(0)}.${o(1)}.${o(2)}.${o(3)}"

  // ------------------------------------------------------------- IPv6

  /** Parsed v6: 8 hextets + optional scope. */
  final case class V6(hextets: Array[Int], scope: String)

  /** `_parse_hextet`: 1-4 ASCII hex digits. */
  private def parseHextet(p: String): Int = {
    if (p.isEmpty || p.length > 4) return -1
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      if (!hex) return -1
      i += 1
    }
    Integer.parseInt(p, 16)
  }

  /** CPython `IPv6Address.__init__` + `_ip_int_from_string`, hextet form. */
  def parseV6(s0: String): V6 = {
    // %scope: non-empty, no further '%'
    val pct = s0.indexOf('%')
    var scope: String = null
    val s = if (pct >= 0) {
      scope = s0.substring(pct + 1)
      if (scope.isEmpty || scope.indexOf('%') >= 0) return null
      s0.substring(0, pct)
    } else s0
    var parts = s.split(":", -1)
    if (parts.length < 3) return null
    // embedded IPv4 in the last part only
    if (parts.last.indexOf('.') >= 0) {
      val v4 = parseV4(parts.last)
      if (v4 == null) return null
      parts = parts.dropRight(1) ++ Array(
        Integer.toHexString((v4(0) << 8) | v4(1)),
        Integer.toHexString((v4(2) << 8) | v4(3)))
    }
    if (parts.length > 9) return null // _HEXTET_COUNT + 1
    // locate the one '::'
    var skip = -1
    var i = 1
    while (i < parts.length - 1) {
      if (parts(i).isEmpty) {
        if (skip >= 0) return null
        skip = i
      }
      i += 1
    }
    var partsHi = 0; var partsLo = 0; var skipped = 0
    if (skip >= 0) {
      partsHi = skip
      partsLo = parts.length - skip - 1
      if (parts.head.isEmpty) { partsHi -= 1; if (partsHi > 0) return null }
      if (parts.last.isEmpty) { partsLo -= 1; if (partsLo > 0) return null }
      skipped = 8 - (partsHi + partsLo)
      if (skipped < 1) return null
    } else {
      if (parts.length != 8) return null
      partsHi = 8
    }
    val hx = new Array[Int](8)
    i = 0
    while (i < partsHi) {
      val v = parseHextet(parts(i))
      if (v < 0) return null
      hx(i) = v
      i += 1
    }
    i = 0
    while (i < partsLo) {
      val v = parseHextet(parts(parts.length - partsLo + i))
      if (v < 0) return null
      hx(8 - partsLo + i) = v
      i += 1
    }
    V6(hx, scope)
  }

  /** `_string_from_ip_int` + `_compress_hextets` (RFC 5952). */
  def renderV6(v: V6): String = {
    val hs = v.hextets.map(Integer.toHexString)
    // leftmost longest run of 2+ "0" hextets (strictly-greater keeps ties
    // on the left, exactly like CPython)
    var bestStart = -1; var bestLen = 0
    var runStart = -1; var runLen = 0
    var i = 0
    while (i < 8) {
      if (hs(i) == "0") {
        if (runStart < 0) runStart = i
        runLen += 1
        if (runLen > bestLen) { bestLen = runLen; bestStart = runStart }
      } else { runStart = -1; runLen = 0 }
      i += 1
    }
    val body =
      if (bestLen > 1) {
        val pre = hs.slice(0, bestStart)
        val post = hs.slice(bestStart + bestLen, 8)
        val mid = "::"
        (if (pre.isEmpty) "" else pre.mkString(":")) + mid +
          (if (post.isEmpty) "" else post.mkString(":"))
      } else hs.mkString(":")
    if (v.scope == null) body else body + "%" + v.scope
  }

  // ------------------------------------------------- interface / network

  /** Prefix from an ASCII-digit string (leading zeros permitted, like
   * CPython `int()`), bounded by `maxLen`; -1 when invalid. */
  private def parsePrefixDigits(p: String, maxLen: Int): Int = {
    if (p.isEmpty) return -1
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c < '0' || c > '9') return -1
      i += 1
    }
    val t = p.dropWhile(_ == '0')
    if (t.length > 3) return -1
    val v = if (t.isEmpty) 0 else t.toInt
    if (v > maxLen) -1 else v
  }

  /** v4 netmask/hostmask -> prefix (`_prefix_from_ip_int`, both tries). */
  private def prefixFromMask(m: Array[Int]): Int = {
    val x = ((m(0).toLong << 24) | (m(1).toLong << 16) |
      (m(2).toLong << 8) | m(3).toLong) & 0xFFFFFFFFL
    def asNetmask(v: Long): Int = {
      val p = java.lang.Long.bitCount(v)
      val expect = if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL
      if (v == expect) p else -1
    }
    val net = asNetmask(x)
    if (net >= 0) net else asNetmask(x ^ 0xFFFFFFFFL)
  }

  private def ifaceCanon(s: String, strict: Boolean): String = {
    val slash = s.split("/", -1)
    if (slash.length > 2) return null // "Only one '/' permitted"
    val addr = slash(0)
    val v4 = parseV4(addr)
    if (v4 != null) {
      val prefix =
        if (slash.length == 1) 32
        else {
          val p = parsePrefixDigits(slash(1), 32)
          if (p >= 0) p
          else {
            val m = parseV4(slash(1))
            if (m == null) -1 else prefixFromMask(m)
          }
        }
      if (prefix < 0) return null
      if (strict) {
        val ip = ((v4(0).toLong << 24) | (v4(1).toLong << 16) |
          (v4(2).toLong << 8) | v4(3).toLong) & 0xFFFFFFFFL
        val mask = if (prefix == 0) 0L
          else (0xFFFFFFFFL << (32 - prefix)) & 0xFFFFFFFFL
        if ((ip & ~mask & 0xFFFFFFFFL) != 0) return null // host bits set
      }
      return renderV4(v4) + "/" + prefix
    }
    val v6 = parseV6(addr)
    if (v6 == null) return null
    val prefix =
      if (slash.length == 1) 128
      else parsePrefixDigits(slash(1), 128) // v6: digit prefixes ONLY
    if (prefix < 0) return null
    if (strict) {
      var i = 0
      while (i < 8) {
        val keep = math.max(0, math.min(16, prefix - 16 * i))
        val mask = if (keep == 0) 0 else (0xFFFF << (16 - keep)) & 0xFFFF
        if ((v6.hextets(i) & ~mask & 0xFFFF) != 0) return null
        i += 1
      }
    }
    renderV6(v6) + "/" + prefix
  }
}
