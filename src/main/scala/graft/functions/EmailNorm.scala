package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Email-normalization native expressions — the reference normalizes
 * addresses through email-validator v2 (`pydantic/networks.py:1306-1372`):
 * the local part is NFC-normalized and the domain is IDNA-decoded to its
 * unicode form (`foobar@xn--80ak6aa92e.com` -> `foobar@аррӏе.com`) and
 * lowercased. Both are per-row JDK-only transforms (java.text.Normalizer,
 * java.net.IDN), expressed as codegen'd unary expressions funneling
 * through ONE static method each so interpreter and codegen cannot
 * diverge.
 *
 * UTS-46 semantics (round 5: `java.net.IDN`/IDNA2003 is gone): the
 * domain mapping is the UTS-46 NON-TRANSITIONAL form email-validator v2
 * uses — per-code-point context-free lowercase (final Σ maps to σ, not
 * the linguistic ς that java.lang.String's contextual rule picks), the
 * four UTS-46 deviation code points (ß U+00DF, ς U+03C2, ZWJ U+200D,
 * ZWNJ U+200C) pass through untouched (IDNA2003 mapped/deleted them),
 * `xn--` labels are punycode-decoded by a native RFC 3492 decoder (no
 * IDNA2003 round-trip verification, which rejected labels decoding to
 * deviation code points), then NFC. Goldens generated with the `idna`
 * python package (the exact UTS-46 implementation email-validator
 * wraps), non-transitional, std3_rules off.
 *
 * Residual nuance (documented): undecodable `xn--` labels keep their
 * ascii form here where email-validator raises, and UTS-46 compat
 * mappings of presentation-form code points (fullwidth letters,
 * ligature code points — NFKC-style expansions beyond lowercase) are
 * not applied.
 */
private[graft] trait EmailNormExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.EmailNorm.$staticCall($s)")
}

/** NFC normalization (email-validator's local-part normalization). */
case class EmailNfc(child: Expression) extends EmailNormExpr {
  override def prettyName: String = "email_nfc"
  override protected def staticCall: String = "nfc"
  override def nullSafeEval(input: Any): Any =
    EmailNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): EmailNfc =
    copy(child = newChild)
}

/** Lowercase + IDNA punycode->unicode + NFC (email-validator's domain
 * normalization). */
case class EmailDomainUnicode(child: Expression) extends EmailNormExpr {
  override def prettyName: String = "email_domain_unicode"
  override protected def staticCall: String = "domain"
  override def nullSafeEval(input: Any): Any =
    EmailNorm.domain(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(
      newChild: Expression): EmailDomainUnicode = copy(child = newChild)
}

object EmailNorm {
  /** NFC-normalize (RFC 6532 / email-validator local part). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  /** UTS-46 per-code-point mapped lowercase (context-free): Σ at label
   * end maps to σ where java.lang.String's contextual rule would pick ς;
   * already-lowercase deviation code points (ß, ς) stay untouched
   * (`Character.toLowerCase` is identity on them). U+0130 expands to
   * "i"+U+0307 per the UTS-46 table (the per-char API cannot 1:N). */
  private def uts46Lower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == 0x0130) sb.append("i̇")
      else sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** RFC 3492 punycode decode of one label (WITHOUT the `xn--` prefix);
   * null on any malformed input (bad digit, overflow, non-ascii basic
   * part) — the caller keeps the ascii label in that case. */
  private def punyDecode(label: String): String = {
    val delim = label.lastIndexOf('-')
    val basic = if (delim >= 0) label.substring(0, delim) else ""
    val enc = if (delim >= 0) label.substring(delim + 1) else label
    val out = new java.util.ArrayList[Integer](label.length)
    var j = 0
    while (j < basic.length) {
      val c = basic.charAt(j)
      if (c >= 0x80) return null
      out.add(c.toInt); j += 1
    }
    var n = 128; var i = 0; var bias = 72; var pos = 0
    while (pos < enc.length) {
      val oldi = i; var w = 1; var k = 36
      var done = false
      while (!done) {
        if (pos >= enc.length) return null
        val c = enc.charAt(pos); pos += 1
        val digit =
          if (c >= 'a' && c <= 'z') c - 'a'
          else if (c >= 'A' && c <= 'Z') c - 'A'
          else if (c >= '0' && c <= '9') c - '0' + 26
          else return null
        if (digit > (Int.MaxValue - i) / w) return null // overflow
        i += digit * w
        val t = if (k <= bias) 1 else if (k >= bias + 26) 26 else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (36 - t)) return null // overflow
          w *= 36 - t; k += 36
        }
      }
      // bias adaptation (RFC 3492 §6.1)
      var delta = if (oldi == 0) i / 700 else (i - oldi) / 2
      val numPoints = out.size + 1
      delta += delta / numPoints
      var kk = 0
      while (delta > 455) { delta /= 35; kk += 36 }
      bias = kk + 36 * delta / (delta + 38)
      n += i / numPoints
      i %= numPoints
      if (n > 0x10FFFF || Character.isSurrogate(n.toChar) && n < 0x10000)
        return null
      out.add(i, Int.box(n))
      i += 1
    }
    val sb = new java.lang.StringBuilder(out.size + 8)
    out.forEach(cp => sb.appendCodePoint(cp))
    sb.toString
  }

  /** Domain to normalized unicode form (UTS-46 non-transitional ToUnicode
   * shape): per-label mapped lowercase, native punycode decode of `xn--`
   * labels (undecodable labels keep their ascii form), then NFC. */
  def domain(s: UTF8String): UTF8String = {
    val labels = s.toString.split("\\.", -1)
    val sb = new java.lang.StringBuilder(s.numChars() + 8)
    var i = 0
    while (i < labels.length) {
      if (i > 0) sb.append('.')
      val l = uts46Lower(labels(i))
      if (l.startsWith("xn--")) {
        val dec = punyDecode(l.substring(4))
        sb.append(if (dec != null) dec else l)
      } else sb.append(l)
      i += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column =
    ColumnShim.column(EmailNfc(ColumnShim.expression(c)))
  def domainCol(c: Column): Column =
    ColumnShim.column(EmailDomainUnicode(ColumnShim.expression(c)))
}
