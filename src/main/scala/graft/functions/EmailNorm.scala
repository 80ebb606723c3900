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
 * Residual nuance (documented): java.net.IDN implements IDNA2003 while
 * email-validator uses UTS-46 — the two differ on rare mapped code
 * points (ß, ZWJ); invalid `xn--` labels keep their ascii form here
 * where email-validator raises.
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

  /** Domain to normalized unicode form: lowercase (root locale), decode
   * punycode labels (IDN.toUnicode leaves undecodable labels as-is
   * rather than throwing), then NFC. ALLOW_UNASSIGNED because IDNA2003's
   * nameprep tables stop at Unicode 3.2 — without it the round-trip
   * verification rejects labels decoding to newer code points (the
   * reference's own `xn--80ak6aa92e` fixture decodes to U+04CF, added
   * in Unicode 5.0). */
  def domain(s: UTF8String): UTF8String = {
    val lower = s.toString.toLowerCase(java.util.Locale.ROOT)
    val uni =
      try java.net.IDN.toUnicode(lower, java.net.IDN.ALLOW_UNASSIGNED)
      catch { case _: IllegalArgumentException => lower }
    UTF8String.fromString(java.text.Normalizer.normalize(uni,
      java.text.Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column =
    ColumnShim.column(EmailNfc(ColumnShim.expression(c)))
  def domainCol(c: Column): Column =
    ColumnShim.column(EmailDomainUnicode(ColumnShim.expression(c)))
}
