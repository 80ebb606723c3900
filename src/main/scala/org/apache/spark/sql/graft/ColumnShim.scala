package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 split `Column` from Catalyst (`Column` now wraps a plan-agnostic
 * `ColumnNode`); the supported conversion hooks (`ExpressionUtils.column` /
 * `.expression`, backed by `ExpressionColumnNode` and the session's
 * `ColumnNodeToExpressionConverter`) are `private[sql]`. This shim lives in
 * a subpackage of `org.apache.spark.sql` purely to re-export them to
 * `graft.*` — the standard pattern for libraries shipping native Catalyst
 * expressions (custom `Expression`s with `doGenCode` are the documented
 * extension tier below full `SparkSessionExtensions` function injection,
 * which is unavailable here because the driver owns session construction).
 */
object ColumnShim {
  /** Wrap a concrete Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression tree behind a Column (requires an
   * active session for node conversion). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager conversion to a plain Catalyst tree (no lazy
   * `ColumnNodeExpression` wrapper). Required when the expression is
   * returned from a `FunctionRegistry` builder: the wrapper is
   * `Unevaluable`, and a builder result produced mid-analysis is never
   * re-converted — whereas a plain tree (possibly holding nested
   * `UnresolvedFunction`s) resolves in the analyzer's next fixpoint pass. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
