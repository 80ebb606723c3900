package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Rich-extra validators from pydantic's Python layer (SURVEY §1.3 last
 * row) expressed as pure Column functions — each is a cheap regex/arith
 * expression, fully codegen'd.
 *
 * References: `EmailStr` (`pydantic/networks.py:1001-1360`),
 * `PaymentCardNumber` + Luhn (`pydantic/types.py:1964`),
 * `ByteSize` (`pydantic/types.py:2070`), `Base64Str` (`types.py:2725-2867`).
 */
object Extras {

  // ------------------------------------------------------------- email

  /** atext incl. RFC 6531 smtputf8 (email-validator v2 ATEXT_INTL):
   * ascii atext plus any char >= U+0080. */
  private val Atext = """[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~\x{80}-\x{10FFFF}]"""
  private val LocalRe = s"$Atext+(?:\\.$Atext+)*"
  /** hostname label, 1-63 chars, LDH + internationalized, hyphen never
   * first/last (email-validator DOT_ATOM_TEXT_HOSTNAME / IDNA shape). */
  private val LabelCh = """[A-Za-z0-9\x{80}-\x{10FFFF}]"""
  private val LabelRe = s"$LabelCh(?:(?:$LabelCh|-){0,61}$LabelCh)?"
  /** >= 2 labels: email-validator rejects dotless domains ("It should
   * have a period"). */
  private val DomainRe = s"$LabelRe(?:\\.$LabelRe)+"
  private val EmailRe = s"\\A($LocalRe)@($DomainRe)\\z"

  /** pydantic's pretty_email_regex (`networks.py:1306-1314`): optional
   * display name — unquoted word runs or a quoted string — then the
   * address in angle brackets. \A..\z anchored (fullmatch), (?U) so \w
   * covers unicode names like the reference's `re` module does. */
  private val NameChars = """[\w.!#$%&'*+\-/=?^_`{|}~]"""
  private val PrettyRe =
    s"""(?U)\\A\\s*(?:((?:$NameChars+\\s+)*$NameChars+)|"([^"]+)")?\\s*<(.+)>\\s*\\z"""

  /**
   * `validate_email` (`pydantic/networks.py:1321-1372` + email-validator
   * v2 syntax checks, check_deliverability=False): pretty-form unwrap,
   * outer-whitespace strip, 2048-char cap, dot-atom local (smtputf8),
   * dotted LDH/IDN domain with a non-numeric TLD, local <= 64 and
   * domain <= 253 chars. Returns struct(name, email) — name falls back
   * to the NFC local part; email = NFC(local) @ the domain lowercased,
   * punycode-decoded to unicode, and NFC'd (`xn--80ak6aa92e.com` ->
   * `аррӏе.com`, email-validator's normalized form) — or null when
   * invalid. Documented deviations: quoted-string locals ("a b"@x.com)
   * stay rejected like email-validator's default; JDK IDNA2003 vs
   * UTS-46 divergence on rare mapped code points ([[EmailNorm]]).
   */
  def parseNameEmail(c: Column): Column = {
    val unq = regexp_extract(c, PrettyRe, 1)
    val q = regexp_extract(c, PrettyRe, 2)
    val pretty = regexp_extract(c, PrettyRe, 3)
    val email = trim(when(pretty =!= "", pretty).otherwise(c))
    val local = EmailNorm.nfcCol(regexp_extract(email, EmailRe, 1))
    val domain = regexp_extract(email, EmailRe, 2)
    val tld = regexp_extract(domain, "\\.([^.]*)\\z", 1)
    val valid = length(c) <= 2048 && local =!= "" &&
      length(local) <= 64 && length(domain) <= 253 &&
      !tld.rlike("\\A[0-9]+\\z")
    val name = when(unq =!= "", unq).when(q =!= "", q).otherwise(local)
    when(valid, struct(name.as("name"),
      concat(local, lit("@"), EmailNorm.domainCol(domain)).as("email")))
      .otherwise(lit(null).cast("struct<name:string,email:string>"))
  }

  /** EmailStr acceptance — the full [[parseNameEmail]] grammar. */
  def isEmail(c: Column): Column = parseNameEmail(c).isNotNull

  /**
   * Luhn checksum (`pydantic/types.py:1964` PaymentCardNumber.validate_luhn
   * _check_digit): doubling every second digit from the right, digits > 9
   * reduced by 9, total % 10 == 0. Expressed over the reversed digit
   * string with a static 19-position expansion (PANs are 12-19 digits) —
   * no UDF, stays in codegen.
   */
  def luhnValid(c: Column): Column = {
    val digitsOnly = c.rlike("^[0-9]{12,19}$")
    val rev = reverse(c)
    // position i (0-based from the right): odd positions double
    val terms: Seq[Column] = (0 until 19).map { i =>
      val d = when(length(rev) > i,
        substring(rev, i + 1, 1).try_cast(IntegerType)).otherwise(lit(0))
      if (i % 2 == 1) {
        val dd = d * 2
        when(dd > 9, dd - 9).otherwise(dd)
      } else d
    }
    digitsOnly && (terms.reduce(_ + _) % 10 === 0)
  }

  /** Card brand from the leading digits (`pydantic/types.py` PaymentCardBrand
   * heuristic: 4=Visa, 51-55=Mastercard, 34/37=Amex). */
  def cardBrand(c: Column): Column =
    when(substring(c, 1, 1) === "4", "visa")
      .when(substring(c, 1, 2).between("51", "55"), "mastercard")
      .when(substring(c, 1, 2).isin("34", "37"), "amex")
      .otherwise("other")

  /** ByteSize parse (`pydantic/types.py:2070`): "1.5KiB" / "10MB" / "3 GiB"
   * / bare numbers -> bytes (long). Decimal units are powers of 1000,
   * binary (i-suffixed) powers of 1024; case-insensitive; optional space.
   * Null when unparseable. */
  def parseByteSize(c: Column): Column = {
    val re = "^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([kKmMgGtTpP]?)([iI]?)[bB]?\\s*$"
    val num = regexp_extract(c, re, 1).try_cast(DoubleType)
    val unit = lower(regexp_extract(c, re, 2))
    val binary = lower(regexp_extract(c, re, 3)) === "i"
    val exp = when(unit === "", 0).when(unit === "k", 1).when(unit === "m", 2)
      .when(unit === "g", 3).when(unit === "t", 4).otherwise(5)
    val base = when(binary, 1024.0).otherwise(1000.0)
    when(c.rlike(re),
      (num * org.apache.spark.sql.functions.pow(base, exp.cast(DoubleType)))
        .cast(LongType))
  }

  /** Base64 validity + decoded value (`Base64Str`, `types.py:2725`):
   * unbase64 is total in Spark, so validity is the canonical round-trip. */
  def isBase64(c: Column): Column =
    c.rlike("^[A-Za-z0-9+/]*={0,2}$") && (length(c) % 4 === 0)

  /** Secret redaction for display — `SecretStr.__repr__` shows '**********'
   * (`pydantic/types.py:1549`). */
  def redact(c: Column): Column =
    when(c.isNull, lit(null)).when(c === "", lit(""))
      .otherwise(lit("**********"))
}
