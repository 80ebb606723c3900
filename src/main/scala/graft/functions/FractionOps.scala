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

/** Column-API surface. */
object FractionOps {
  def reduce(num: Column, den: Column): Column =
    ColumnShim.column(FractionReduce(
      ColumnShim.expression(num.cast("long")),
      ColumnShim.expression(den.cast("long"))))

  def fromDouble(x: Column): Column =
    ColumnShim.column(DoubleToFraction(ColumnShim.expression(x.cast("double"))))
}
