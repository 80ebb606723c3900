package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native expressions for exact rational arithmetic — the columnar core
 * of [[graft.spec.FractionSpec]] (reference `validators/fraction.rs`,
 * which delegates to Python's `fractions.Fraction`). Both expressions
 * funnel through ONE static scala-object method each, called identically
 * from `eval` and from the generated code, so interpreter and codegen
 * cannot diverge.
 */

/** `FractionReduce(num, den)` -> `array<long>[num, den]` in lowest terms
 * with the sign on the numerator and den > 0; null when den == 0 (the
 * ZeroDivisionError -> fraction_parsing path). */
case class FractionReduce(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "fraction_reduce"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(n: Any, d: Any): Any = {
    val out = FractionReduce.reduce(n.asInstanceOf[Long], d.asInstanceOf[Long])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d) => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.FractionReduce.reduce($n, $d);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FractionReduce =
    copy(left = newLeft, right = newRight)
}

object FractionReduce {
  /** Euclid-reduce; sign moves to the numerator. Long.MinValue operands
   * (whose negation overflows) and den == 0 return null. */
  def reduce(num: Long, den: Long): Array[Long] = {
    if (den == 0 || num == Long.MinValue || den == Long.MinValue) return null
    var a = math.abs(num); var b = math.abs(den)
    while (b != 0) { val t = a % b; a = b; b = t }
    val g = if (a == 0) 1L else a
    val sign = if ((num < 0) != (den < 0) && num != 0) -1L else 1L
    Array(sign * math.abs(num) / g, math.abs(den) / g)
  }
}

/** `DoubleToFraction(x)` -> the EXACT binary ratio of the double, in
 * lowest terms (Python `float.as_integer_ratio` / `Fraction(float)`
 * semantics: `Fraction(0.1)` = 3602879701896397/36028797018963968).
 * Null for NaN/±Inf (Fraction raises there -> fraction_parsing) and for
 * ratios whose reduced terms exceed Long (documented engine bound:
 * |exponent| beyond ~2^62 denominators needs big integers). */
case class DoubleToFraction(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "double_to_fraction"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = DoubleToFraction.ratio(input.asInstanceOf[Double])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.DoubleToFraction.ratio($x);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleToFraction =
    copy(child = newChild)
}

object DoubleToFraction {
  def ratio(x: Double): Array[Long] = {
    if (x.isNaN || x.isInfinite) return null
    // new BigDecimal(double) is the EXACT binary value; its reduced
    // unscaled/10^scale ratio equals as_integer_ratio's reduced form
    // (the minimal ratio of a rational is unique)
    val bd = new java.math.BigDecimal(x)
    val num0 = bd.unscaledValue()
    val den0 = java.math.BigInteger.TEN.pow(math.max(bd.scale(), 0))
    val num1 = if (bd.scale() < 0)
      num0.multiply(java.math.BigInteger.TEN.pow(-bd.scale())) else num0
    val g = num1.gcd(den0)
    val (n, d) =
      if (g.signum() == 0) (num1, java.math.BigInteger.ONE)
      else (num1.divide(g), den0.divide(g))
    if (n.bitLength() > 62 || d.bitLength() > 62) return null
    Array(n.longValueExact(), d.longValueExact())
  }
}

/** `FractionParse(s)` -> reduced `array<long>[num, den]`, or null on any
 * parse/bounds failure — the WHOLE string grammar of
 * `Compiler.compileFraction` (Python `fractions.Fraction._RATIONAL_FORMAT`:
 * sign, `_`-separated digits, `/den` OR `.decimals` + exponent; 18-digit
 * significand/denominator bound; pow10 scaling; Euclid reduce) in ONE
 * compact native expression.
 *
 * Exists for PLAN SIZE, not speed-of-row: the expression pipeline it
 * replaces (rlike + 5 regexp_extract of the same pattern + the scaling
 * arithmetic, each subtree duplicated per downstream reference) weighed
 * thousands of Catalyst nodes, and q_fraction's measured cost was ~100%
 * OPTIMIZER time (planOnly 1.61s of a 1.56-1.69s run at sf0.1). Same
 * java.util.regex dialect, same groups, same bounds — the accept set and
 * values are bit-identical; ComplexFractionSpec's goldens and the
 * three-scale oracle pin it. */
case class FractionParse(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "fraction_parse"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = FractionParse.parse(input.toString)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.functions.FractionParse.parse($x.toString());
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FractionParse =
    copy(child = newChild)
}

object FractionParse {
  /** Python `fractions.Fraction` string grammar — IDENTICAL pattern string
   * to `Compiler.FrRe` (groups: 1 sign, 2 int digits, 3 denominator,
   * 4 decimals, 5 exponent), same java.util.regex dialect that
   * rlike/regexp_extract use. */
  private val FrD = "[0-9](?:_?[0-9])*"
  val FrRe: String = s"\\A([+-]?)(?=[0-9]|\\.[0-9])($FrD)?" +
    s"(?:/($FrD)|(?:\\.($FrD)?)?(?:[eE]([+-]?$FrD))?)\\z"
  private val P = java.util.regex.Pattern.compile(FrRe)
  private val ExpOk = java.util.regex.Pattern.compile(
    "\\A(?:[+-]?[0-9]{1,9})?\\z")

  private def pow10(n: Int): Long = {
    var r = 1L; var i = 0
    while (i < n) { r *= 10L; i += 1 }
    r
  }

  /** Replicates the expression pipeline exactly, including Spark `trim`
   * semantics (space characters U+0020 only — NOT Java String.trim, which
   * also strips control chars and would change the accept set). */
  def parse(raw: String): Array[Long] = {
    var lo = 0; var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val s = raw.substring(lo, hi)
    val m = P.matcher(s)
    if (!m.matches()) return null
    def grp(i: Int): String = { val g = m.group(i); if (g == null) "" else g }
    val sign = if (grp(1) == "-") -1L else 1L
    val intD = grp(2).replace("_", "")
    val denD = grp(3).replace("_", "")
    val decD = grp(4).replace("_", "")
    val expD = grp(5).replace("_", "")
    // exponent bounded to 9 digits BEFORE the int parse (same guard order)
    if (!ExpOk.matcher(expD).matches()) return null
    val e = if (expD.isEmpty) 0 else expD.toInt
    val digits = intD + decD
    val combined = e - decD.length
    val scaleUp = math.max(combined, 0)
    val scaleDn = math.max(-combined, 0)
    val denOk = (if (denD.isEmpty) "1" else denD).length <= 18
    if (!(digits.length + scaleUp <= 18 && scaleDn <= 18 && denOk)) return null
    if (digits.isEmpty) return null // unreachable under the lookahead; kept
    val num = sign * digits.toLong * pow10(scaleUp)
    val den = if (grp(3).nonEmpty) denD.toLong else pow10(scaleDn)
    FractionReduce.reduce(num, den)
  }
}

/** Column-API surface. */
object FractionOps {
  def reduce(num: Column, den: Column): Column =
    ColumnShim.column(FractionReduce(
      ColumnShim.expression(num.cast("long")),
      ColumnShim.expression(den.cast("long"))))

  def fromDouble(x: Column): Column =
    ColumnShim.column(DoubleToFraction(ColumnShim.expression(x.cast("double"))))

  def parseString(s: Column): Column =
    ColumnShim.column(FractionParse(ColumnShim.expression(s.cast("string"))))
}
