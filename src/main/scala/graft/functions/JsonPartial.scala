package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Partial-JSON recovery — the columnar port of pydantic-core's
 * `allow_partial` (jiter partial modes; `validators/mod.rs:183-304`,
 * exposed as `from_json(..., allow_partial=...)`): given a PREFIX of a
 * valid JSON document (e.g. a truncated LLM stream or a chopped log
 * line), produce the completed text of the longest valid document the
 * prefix determines, or null when nothing is salvageable.
 *
 * Semantics verified against `pydantic_core.from_json` golden runs:
 *  - a trailing number/literal token is KEPT iff it is valid as written
 *    (`25` kept, `2.`/`tr`/`12.5e` dropped);
 *  - a truncated string VALUE is dropped in mode `on`, kept (closed at
 *    the last complete escape boundary) in mode `trailing-strings`;
 *    a truncated/value-less KEY is always dropped with its pair;
 *  - open containers are closed innermost-first;
 *  - empty / whitespace-only / nothing-salvageable input -> null.
 *
 * Recovery only: the input is ASSUMED to be a prefix of valid JSON
 * (like jiter, which stops at the first syntax error anyway); malformed
 * non-prefix input flows through to the downstream JSON parse, which
 * reports `json_invalid` exactly as without partial mode.
 */
object JsonPartial {

  private def isValidNumber(s: String): Boolean =
    s.matches("-?(?:0|[1-9][0-9]*)(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?")

  /** Static entry point (called from generated code — keep signature
   * Java-friendly). */
  def complete(input: UTF8String, trailingStrings: Boolean): UTF8String = {
    if (input == null) return null
    val s = input.toString
    val n = s.length
    // per-depth state; depth 0 is the virtual top level
    val types = new Array[Char](n + 2) // '{' | '['
    val lastGood = new Array[Int](n + 2)
    val phases = new Array[Int](n + 2) // 0 expect key/value, 1 after key,
                                       // 2 expect value, 3 after value
    var depth = 0
    types(0) = ' '; lastGood(0) = 0; phases(0) = 0

    var i = 0
    var inString = false
    var stringIsKey = false
    var escSafe = 0 // end offset of last cleanly-terminated string char
    var inToken = false
    var tokenStart = 0

    def completeValue(endPos: Int): Unit = {
      lastGood(depth) = endPos; phases(depth) = 3
    }

    while (i < n) {
      val c = s.charAt(i)
      if (inString) {
        if (c == '\\') {
          // escape: 1 escaped char, or 'u' + 4 hex
          val escLen = if (i + 1 < n && s.charAt(i + 1) == 'u') 6 else 2
          if (i + escLen <= n) { i += escLen; escSafe = i }
          else { i = n } // truncated escape: escSafe stays before the '\'
        } else if (c == '"') {
          inString = false
          if (stringIsKey) phases(depth) = 1 else completeValue(i + 1)
          i += 1
        } else { i += 1; escSafe = i }
      } else if (inToken) {
        if (c == ',' || c == ']' || c == '}' || c == ' ' || c == '\t' ||
            c == '\n' || c == '\r') {
          inToken = false
          // jiter partial mode only recovers at EOF TRUNCATION; a syntax
          // error inside the stream ('{"a": oops}', '[1, nul]') aborts
          val tok = s.substring(tokenStart, i)
          if (isValidNumber(tok) || tok == "true" || tok == "false" ||
              tok == "null") completeValue(i)
          else return null
        } else i += 1
      } else c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '"' =>
          inString = true
          stringIsKey = types(depth) == '{' && phases(depth) == 0
          i += 1; escSafe = i
        case '{' | '[' =>
          depth += 1; types(depth) = c; lastGood(depth) = i + 1
          phases(depth) = 0
          i += 1
        case '}' | ']' =>
          // top-level closer = trailing garbage AFTER a complete value:
          // jiter returns the already-parsed prefix ('1]' -> 1,
          // '{"a": 1}}' -> {"a": 1}, bare '}' -> error). A MISMATCHED
          // closer inside a container is a syntax error -> abort.
          if (depth == 0) { i = n } // stop; EOF resolution keeps lastGood
          else if (types(depth) != (if (c == '}') '{' else '[')) return null
          else {
            depth -= 1; completeValue(i + 1)
            i += 1
          }
        case ':' => phases(depth) = 2; i += 1
        case ',' => phases(depth) = 0; i += 1
        case _ => inToken = true; tokenStart = i; i += 1
      }
    }

    // EOF resolution
    var keptOpenString = false
    var cut = -1
    if (inToken) {
      val tok = s.substring(tokenStart)
      if (isValidNumber(tok) || tok == "true" || tok == "false" ||
          tok == "null") completeValue(n)
    } else if (inString) {
      if (trailingStrings && !stringIsKey) { keptOpenString = true; cut = escSafe }
    }
    if (cut < 0) cut = lastGood(depth)

    if (cut == 0 && !keptOpenString) return null // nothing salvageable
    val out = new java.lang.StringBuilder(cut + depth + 1)
    out.append(s, 0, cut)
    if (keptOpenString) out.append('"')
    var d = depth
    while (d >= 1) {
      out.append(if (types(d) == '{') '}' else ']')
      d -= 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** Catalyst expression wrapping [[JsonPartial.complete]]: the generated
 * code is a single static call, so the enclosing projection stays in
 * whole-stage codegen. Null in, or unsalvageable prefix -> null out. */
case class JsonPartialComplete(child: Expression, trailingStrings: Boolean)
    extends UnaryExpression {

  override def prettyName: String = "json_partial_complete"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got " +
          child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any =
    JsonPartial.complete(v.asInstanceOf[UTF8String], trailingStrings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.JsonPartial.complete($c, $trailingStrings);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : JsonPartialComplete = copy(child = newChild)
}

/** Column-API surface. */
object JsonPartialOps {

  /** Complete a truncated JSON prefix (mode `on` semantics), or with
   * `trailingStrings = true` the `trailing-strings` mode. */
  def completeJson(c: Column, trailingStrings: Boolean = false): Column =
    ColumnShim.column(
      JsonPartialComplete(ColumnShim.expression(c), trailingStrings))
}
