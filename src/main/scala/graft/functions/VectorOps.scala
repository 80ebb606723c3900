package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for the embedding dot product — the hot
 * kernel of `graft.similarity` (every candidate pair in ANN / near-dup
 * costs exactly one of these).
 *
 * Why a custom `Expression` (extension tier (b) of the build brief):
 *  - `aggregate`/`zip_with` HOFs are CodegenFallback — interpreted per
 *    element AND they eject the enclosing projection from whole-stage
 *    codegen (measured 61%-per-core regressions elsewhere in this repo);
 *  - the round-1 workaround (a left-associated chain of `element_at`
 *    products) stays codegen'd but materializes `dim` expression nodes
 *    per dot — 64-wide plans per pair column, duplicated at every
 *    reference, pushing wide plans toward the 64KB codegen cliff.
 * This expression is ONE node; its `doGenCode` emits a tight primitive
 * loop (`s += a[i]*b[i]`) inside whole-stage codegen.
 *
 * Semantics match the chain exactly: left-to-right in-order double
 * accumulation (bit-identical to DuckDB's `list_reduce` replay in the
 * oracle), null array -> null, null ELEMENT -> null (as a chain of
 * `element_at` sums would yield), length mismatch -> min length (arrays
 * are fixed-dim in practice).
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vector_dot"
  override def dataType: DataType = DoubleType

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // null element => null result, mirroring the element_at-chain semantics
  override def nullable: Boolean = super.nullable ||
    left.dataType.asInstanceOf[ArrayType].containsNull ||
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemOf(left) == FloatType
    val rf = elemOf(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val lGet = if (elemOf(left) == FloatType) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val rGet = if (elemOf(right) == FloatType) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      val nullChecks =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullChecks
         |  $s += $lGet * $rGet;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorOps {

  /** In-order dot product of two float/double array columns as a single
   * codegen'd Catalyst expression node (see [[VectorDot]]). */
  def vectorDot(a: Column, b: Column): Column =
    ColumnShim.column(VectorDot(ColumnShim.expression(a),
      ColumnShim.expression(b)))
}
