package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import Violations.{T, oneS, one, collect, merge, empty}

/**
 * Spec -> Catalyst compiler.
 *
 * The reference interprets a validator tree depth-first per row
 * (`pydantic-core/src/validators/mod.rs`); we compile the same tree ONCE into
 * a pair of Columns — the coerced value and the violation bundle — and let
 * whole-stage codegen fuse everything into a single pass over the data. This
 * mirrors the reference's own design choices:
 *  - unconstrained specs emit no checks at all (validator specialization,
 *    `string.rs:50-66`, `int.rs:53-65`);
 *  - error construction sits behind `when(...)` so the happy path computes
 *    only cheap booleans (`#[cold]` error fns, `mod.rs:670-683`);
 *  - violations accumulate across all fields, never fail-fast per row
 *    (`model_fields.rs:313`).
 */
object Compiler {

  /** Compiled form of a spec applied to one input column.
   * `value` = coerced output (null when invalid/missing);
   * `violations` = array<struct<loc,type,msg,input,ctx>> (empty = valid);
   * `dataType` = static output type of `value`. */
  final case class Compiled(value: Column, violations: Column, dataType: DataType)

  private def ok(value: Column, dt: DataType): Compiled =
    Compiled(value, empty, dt)

  private def typeViolation(loc: Column, errType: String, msg: String,
                            input: Column, dt: DataType): Compiled =
    Compiled(lit(null).cast(dt),
      collect(Seq(oneS(loc, errType, msg, input))), dt)

  private def isIntegral(t: DataType): Boolean = t match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def isFloating(t: DataType): Boolean = t match {
    case _: FloatType | _: DoubleType => true
    case _ => false
  }
  private def isNumeric(t: DataType): Boolean =
    isIntegral(t) || isFloating(t) || t.isInstanceOf[DecimalType]

  /** Canonical numeric width — what the compiled branches emit
   * (compileInt -> LongType, compileFloat -> DoubleType) — so smart-union
   * exactness can compare a branch's type against ANY physical input
   * width. */
  private def canonNumeric(t: DataType): DataType =
    if (isIntegral(t)) LongType
    else if (isFloating(t)) DoubleType
    else t

  /** gt/ge/lt/le/multiple_of checks shared by every ordered type —
   * reference `int.rs:125-181`, `float.rs`, `datetime.rs:124-127`.
   * Error types/messages verbatim from `errors/types.rs:213-227`. */
  private def orderedChecks[A](v: Column, loc: Column, raw: Column,
      gt: Option[A], ge: Option[A], lt: Option[A], le: Option[A],
      multipleOf: Option[A], toCol: A => Column): Seq[Column] = {
    def chk(bOpt: Option[A], cond: Column => Column, typ: String,
            word: String, key: String): Option[Column] =
      bOpt.map { b =>
        when(v.isNotNull && !cond(toCol(b)),
          oneS(loc, typ, s"Input should be $word $b", raw, Map(key -> b.toString)))
      }
    val mult = multipleOf.map { m =>
      when(v.isNotNull && (v % toCol(m)) =!= lit(0),
        oneS(loc, T.multipleOf, s"Input should be a multiple of $m", raw,
          Map("multiple_of" -> m.toString)))
    }
    Seq(
      chk(gt, v > _, T.greaterThan, "greater than", "gt"),
      chk(ge, v >= _, T.greaterThanEqual, "greater than or equal to", "ge"),
      chk(lt, v < _, T.lessThan, "less than", "lt"),
      chk(le, v <= _, T.lessThanEqual, "less than or equal to", "le"),
      mult
    ).flatten
  }

  private def strictOf(specStrict: Option[Boolean], mode: Mode): Boolean =
    specStrict.getOrElse(mode == Mode.Strict)

  /** Reference list formatting for literal/enum expected values:
   * "'a', 'b' or 'c'" (`pydantic-core/src/validators/literal.rs:337-360`). */
  private def expectedRepr(vs: Seq[String]): String = {
    val q = vs.map("'" + _ + "'")
    if (q.size <= 1) q.mkString
    else q.init.mkString(", ") + " or " + q.last
  }

  /**
   * Compile `spec` against `input` (whose static Spark type is `inputType`)
   * at location `loc` (array<string> column).
   */
  def compile(input: Column, inputType: DataType, loc: Column, spec: Spec,
              mode: Mode): Compiled = spec match {

    case AnySpec => ok(input, inputType)

    case NoneSpec =>
      Compiled(lit(null).cast(inputType),
        collect(Seq(when(input.isNotNull,
          oneS(loc, T.noneRequired, "Input should be None", input)))),
        inputType)

    case NullableSpec(inner) =>
      val c = compile(input, inputType, loc, inner, mode)
      Compiled(
        when(input.isNotNull, c.value),
        when(input.isNull, empty).otherwise(c.violations),
        c.dataType)

    case WithDefaultSpec(inner, default, onError, validateDefault) =>
      val c = compile(input, inputType, loc, inner, mode)
      // validate_default (with_default.rs:143,204): the default itself is
      // compiled through the inner spec — a constant-folded expression, so
      // a wrong-typed default yields its violation on every defaulted row
      // (pydantic raises at first use) instead of silently passing. The
      // default is the engine's string literal -> lax coercion.
      val (defaultCol, defaultViols) =
        if (validateDefault) {
          val dc = compile(lit(default), StringType, loc, inner, Mode.Lax)
          (dc.value.cast(c.dataType), dc.violations)
        } else (lit(default).cast(c.dataType), empty)
      val value0 = when(input.isNull, defaultCol).otherwise(c.value)
      val viols0 = when(input.isNull, defaultViols).otherwise(c.violations)
      onError match {
        case OnError.Raise => Compiled(value0, viols0, c.dataType)
        case OnError.UseDefault =>
          // reference `with_default.rs:110-122`: on_error=default swallows
          // the inner error and substitutes the default value.
          Compiled(when(size(viols0) > 0, defaultCol).otherwise(value0),
            empty, c.dataType)
        case OnError.Omit =>
          // on_error=omit: error swallowed, value omitted (null here; a
          // containing list filters the nulls out — compileList)
          Compiled(when(size(viols0) > 0, lit(null).cast(c.dataType))
            .otherwise(value0), empty, c.dataType)
      }

    case ChainSpec(steps) =>
      // reference validators/chain.rs: sequential pipeline, value threads.
      steps.foldLeft(ok(input, inputType)) { (acc, s) =>
        val c = compile(acc.value, acc.dataType, loc, s, mode)
        Compiled(c.value, merge(Seq(acc.violations, c.violations)), c.dataType)
      }

    case CustomErrorSpec(inner, errType, message) =>
      val c = compile(input, inputType, loc, inner, mode)
      Compiled(c.value,
        when(size(c.violations) > 0,
          collect(Seq(oneS(loc, errType, message, input)))).otherwise(empty),
        c.dataType)

    case s: StrSpec => compileStr(input, inputType, loc, s, mode)
    case s: IntSpec => compileInt(input, inputType, loc, s, mode)
    case s: FloatSpec => compileFloat(input, inputType, loc, s, mode)
    case s: BoolSpec => compileBool(input, inputType, loc, s, mode)
    case s: DecimalSpec => compileDecimal(input, inputType, loc, s, mode)
    case ComplexSpec => compileComplex(input, inputType, loc)
    case s: FractionSpec => compileFraction(input, inputType, loc, s, mode)
    case s: DateSpec => compileDate(input, inputType, loc, s, mode)
    case s: DatetimeSpec => compileDatetime(input, inputType, loc, s, mode)
    case s: TimeSpec => compileTime(input, inputType, loc, s, mode)
    case s: TimedeltaSpec => compileTimedelta(input, inputType, loc, s, mode)
    case s: BytesSpec => compileBytes(input, inputType, loc, s, mode)
    case s: UuidSpec => compileUuid(input, inputType, loc, s, mode)
    case s: UrlSpec => compileUrl(input, inputType, loc, s, mode)
    case s: IpSpec => compileIp(input, inputType, loc, s)

    case LiteralSpec(values) =>
      val bad = when(input.isNotNull && !input.isin(values: _*),
        oneS(loc, T.literalError,
          s"Input should be ${expectedRepr(values)}",
          input, Map("expected" -> values.mkString(","))))
      Compiled(when(input.isin(values: _*), input), collect(Seq(bad)), inputType)

    case EnumSpec(values) =>
      val bad = when(input.isNotNull && !input.isin(values: _*),
        oneS(loc, T.enumError,
          s"Input should be ${expectedRepr(values)}",
          input, Map("expected" -> values.mkString(","))))
      Compiled(when(input.isin(values: _*), input), collect(Seq(bad)), inputType)

    case s: ListSpec => compileList(input, inputType, loc, s, mode)
    case s: TupleSpec => compileTuple(input, inputType, loc, s, mode)
    case s: NamedTupleSpec => compileNamedTuple(input, inputType, loc, s, mode)
    case s: DataclassSpec => compileDataclass(input, inputType, loc, s, mode)
    // recursive schemas: compile-time bounded unroll (definitions.rs analog
    // — see DefinitionsSpec scaladoc for the deviation statement)
    case s: DefinitionsSpec =>
      compile(input, inputType, loc,
        Definitions.unroll(s.root, s.defs, s.maxUnroll), mode)
    case RefSpec(name) => throw new IllegalArgumentException(
      s"definition ref '$name' outside a DefinitionsSpec container")
    case s: SetSpec => compileSet(input, inputType, loc, s, mode)
    case s: DictSpec => compileDict(input, inputType, loc, s, mode)
    case s: JsonSpec => compileJson(input, inputType, loc, s, mode)
    case s: UnionSpec => compileUnion(input, inputType, loc, s, mode)

    case s: TaggedUnionSpec => compileTaggedUnion(input, inputType, loc, s, mode)

    case m: ModelSpec => compileModel(input, inputType, loc, m, mode)

    // ---- function (custom) validators — reference function.rs; columnar
    // mapping documented in spec/FunctionSpecs.scala

    case FunctionBeforeSpec(fn, inner, outDdl) =>
      // transform the raw input, then validate the result (`function.rs`
      // FunctionBeforeValidator: call the function, feed its output to the
      // wrapped validator)
      val out = fn(input)
      compile(out, outDdl.map(DataType.fromDDL).getOrElse(inputType), loc,
        inner, mode)

    case FunctionAfterSpec(inner, fn) =>
      // validate, then transform the validated value; violations unchanged
      val c = compile(input, inputType, loc, inner, mode)
      Compiled(fn(c.value), c.violations, c.dataType)

    case FunctionPlainSpec(fn, outDdl) =>
      ok(fn(input), DataType.fromDDL(outDdl))

    case FunctionWrapSpec(inner, fn) =>
      val c = compile(input, inputType, loc, inner, mode)
      val (v, viols) = fn(WrapCtx(input, c.value, c.violations, loc))
      Compiled(v, viols, c.dataType)

    case PredicateSpec(pred, name) =>
      // pipeline.py:605-621: PydanticCustomError('predicate_failed',
      // f"Predicate {name!r} failed"). Null input passes; null predicate
      // result counts as failed (three-valued logic would silently pass).
      val failed = input.isNotNull && !coalesce(pred(input), lit(false))
      Compiled(when(!failed, input),
        collect(Seq(when(failed,
          oneS(loc, "predicate_failed", s"Predicate '$name' failed", input)))),
        inputType)

    case CheckSpec(pred, desc) =>
      // pipeline.py:405-415 _check_func: ValueError(f'Expected {desc}') ->
      // value_error, rendered "Value error, {error}" (errors/types.rs:559)
      val failed = input.isNotNull && !coalesce(pred(input), lit(false))
      Compiled(when(!failed, input),
        collect(Seq(when(failed,
          oneS(loc, T.valueError, s"Value error, Expected $desc", input,
            Map("error" -> s"Expected $desc"))))),
        inputType)
  }

  // -------------------------------------------------------------------- str

  private def compileStr(input: Column, t: DataType, loc: Column, s: StrSpec,
                         mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val base: Either[String, Column] = t match {
      case _: StringType => Right(input)
      case _ if isNumeric(t) && !strict && s.coerceNumbersToStr =>
        Right(input.cast(StringType))
      case _: BinaryType if !strict => Right(input.cast(StringType))
      case _ => Left("not a string")
    }
    base match {
      case Left(_) =>
        typeViolation(loc, T.stringType, "Input should be a valid string",
          input, StringType)
      case Right(raw0) =>
        // reference order (`string.rs:122-178`):
        // strip -> ascii_only -> char length -> pattern(search) -> lower/upper
        val v1 = if (s.stripWhitespace) trim(raw0) else raw0
        val checks = Seq(
          if (s.asciiOnly)
            Some(when(v1.isNotNull && !v1.rlike("^[\\x00-\\x7F]*$"),
              oneS(loc, T.stringNotAscii,
                "String should contain only ASCII characters", input)))
          else None,
          s.minLength.map(n => when(v1.isNotNull && length(v1) < n,
            oneS(loc, T.stringTooShort,
              s"String should have at least $n character${if (n == 1) "" else "s"}",
              input, Map("min_length" -> n.toString)))),
          s.maxLength.map(n => when(v1.isNotNull && length(v1) > n,
            oneS(loc, T.stringTooLong,
              s"String should have at most $n character${if (n == 1) "" else "s"}",
              input, Map("max_length" -> n.toString)))),
          // unanchored search like the reference (`string.rs:332-339`);
          // Java rlike is also an unanchored find.
          s.pattern.map(p => when(v1.isNotNull && !v1.rlike(p),
            oneS(loc, T.stringPatternMismatch,
              s"String should match pattern '$p'", input,
              Map("pattern" -> p))))
        ).flatten
        val v2 =
          if (s.toLower) lower(v1)
          else if (s.toUpper) upper(v1)
          else v1
        Compiled(v2, collect(checks), StringType)
    }
  }

  // -------------------------------------------------------------------- int

  private def compileInt(input: Column, t: DataType, loc: Column, s: IntSpec,
                         mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _ if isIntegral(t) => (input.cast(LongType), Nil)
      case _: BooleanType if !strict => (input.cast(LongType), Nil)
      case _: StringType if !strict =>
        val v = Coercions.strToLong(input)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.intParsing,
            "Input should be a valid integer, unable to parse string as an integer",
            input))))
      case _ if isFloating(t) && !strict =>
        val v = Coercions.doubleToLongExact(input)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.intFromFloat,
            "Input should be a valid integer, got a number with a fractional part",
            input))))
      case dt: DecimalType if !strict =>
        val v = when(input === input.cast(LongType).cast(dt), input.cast(LongType))
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.intFromFloat,
            "Input should be a valid integer, got a number with a fractional part",
            input))))
      case _ =>
        return typeViolation(loc, T.intType, "Input should be a valid integer",
          input, LongType)
    }
    val cs = orderedChecks[Long](value, loc, input, s.gt, s.ge, s.lt, s.le,
      s.multipleOf, lit(_))
    Compiled(value, collect(parseChecks ++ cs), LongType)
  }

  // ------------------------------------------------------------------ float

  private def compileFloat(input: Column, t: DataType, loc: Column,
                           s: FloatSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _ if isNumeric(t) => (input.cast(DoubleType), Nil)
      case _: BooleanType if !strict => (input.cast(DoubleType), Nil)
      case _: StringType if !strict =>
        val v = Coercions.strToDouble(input)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.floatParsing,
            "Input should be a valid number, unable to parse string as a number",
            input))))
      case _ =>
        return typeViolation(loc, T.floatType, "Input should be a valid number",
          input, DoubleType)
    }
    val finite =
      if (s.allowInfNan) Nil
      else Seq(when(value.isNotNull &&
          (isnan(value) || value === Double.PositiveInfinity ||
           value === Double.NegativeInfinity),
        oneS(loc, T.finiteNumber, "Input should be a finite number", input)))
    val cs = orderedChecks[Double](value, loc, input, s.gt, s.ge, s.lt, s.le,
      s.multipleOf, lit(_))
    Compiled(value, collect(parseChecks ++ finite ++ cs), DoubleType)
  }

  // ------------------------------------------------------------------- bool

  private def compileBool(input: Column, t: DataType, loc: Column,
                          s: BoolSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    t match {
      case _: BooleanType => ok(input, BooleanType)
      case _: StringType if !strict =>
        val v = Coercions.strToBool(input)
        Compiled(v, collect(Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.boolParsing,
            "Input should be a valid boolean, unable to interpret input",
            input)))), BooleanType)
      case _ if isNumeric(t) && !strict =>
        val v = Coercions.longToBool(input)
        Compiled(v, collect(Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.boolParsing,
            "Input should be a valid boolean, unable to interpret input",
            input)))), BooleanType)
      case _ =>
        typeViolation(loc, T.boolType, "Input should be a valid boolean",
          input, BooleanType)
    }
  }

  // ---------------------------------------------------------------- decimal

  // --------------------------------------------------------------- fraction

  private val FractionOut: DataType =
    StructType(Seq(StructField("num", LongType), StructField("den", LongType)))

  /** Python `fractions.Fraction` string grammar (`_RATIONAL_FORMAT`):
   * sign, integer digits, then EITHER `/denominator` OR optional
   * `.decimals` and optional exponent; underscores between digits;
   * at least one digit overall. Groups: 1 sign, 2 int digits,
   * 3 denominator, 4 decimals, 5 exponent. */
  private val FrD = "[0-9](?:_?[0-9])*"
  private val FrRe = s"\\A([+-]?)(?=[0-9]|\\.[0-9])($FrD)?" +
    s"(?:/($FrD)|(?:\\.($FrD)?)?(?:[eE]([+-]?$FrD))?)\\z"

  /** Compile-time parse of a rational bound string, reduced. */
  private def parseRat(s: String): (Long, Long) = {
    val (n, d) = s.split("/") match {
      case Array(a) => (a.trim.toLong, 1L)
      case Array(a, b) => (a.trim.toLong, b.trim.toLong)
      case _ => throw new IllegalArgumentException(s"bad rational bound: $s")
    }
    val r = graft.functions.FractionReduce.reduce(n, d)
    require(r != null, s"bad rational bound: $s")
    (r(0), r(1))
  }

  private def ratStr(nd: (Long, Long)): String =
    if (nd._2 == 1) nd._1.toString else s"${nd._1}/${nd._2}"

  private def compileFraction(input: Column, t: DataType, loc: Column,
                              s: FractionSpec, mode: Mode): Compiled = {
    import graft.functions.FractionOps
    val parseMsg = "Input is not a valid fraction"
    val typeMsg =
      "Fraction input should be an integer, float, string or Fraction object"

    def fromArr(arr: Column): Column =
      when(arr.isNotNull, struct(
        element_at(arr, 1).as("num"), element_at(arr, 2).as("den")))

    // value + parse-failure flag per input type
    val (value0, parseFail): (Column, Column) = t match {
      case tt if isIntegral(tt) =>
        (when(input.isNotNull,
          struct(input.cast(LongType).as("num"), lit(1L).as("den"))),
          lit(false))
      case tt if isFloating(tt) =>
        val arr = FractionOps.fromDouble(input.cast(DoubleType))
        (fromArr(arr), input.isNotNull && arr.isNull)
      case _: DecimalType =>
        // exact via the string grammar (decimal renders canonically)
        return compileFraction(input.cast(StringType), StringType, loc, s, mode)
      case StringType =>
        // ONE native expression for the whole string grammar + 18-digit
        // bounds + reduce ([[graft.functions.FractionParse]] — identical
        // regex, guard order, and Spark-trim semantics). The expression
        // pipeline it replaces (rlike + 5 same-pattern regexp_extract +
        // scaling arithmetic, re-copied per downstream reference) weighed
        // thousands of Catalyst nodes; q_fraction's cost was measured to
        // be ~100% optimizer time on that tree. Oversized input
        // ('1e99999999999', 19-digit significand/denominator) still lands
        // in fraction_parsing — null result, never a NumberFormatException.
        val arr = FractionOps.parseString(input)
        (fromArr(arr), input.isNotNull && arr.isNull)
      case st: StructType if st.fieldNames.sorted.toSeq == Seq("den", "num") =>
        val arr = FractionOps.reduce(input.getField("num").cast(LongType),
          input.getField("den").cast(LongType))
        (fromArr(arr), input.isNotNull && arr.isNull)
      case _ =>
        return typeViolation(loc, "fraction_type", typeMsg, input, FractionOut)
    }

    // strict: only a Fraction object (struct input) passes —
    // `fraction.rs:331-358` raises is_instance_of otherwise
    val isStruct = t.isInstanceOf[StructType]
    if (strictOf(s.strict, mode) && !isStruct)
      return typeViolation(loc, "is_instance_of",
        "Input should be an instance of Fraction", input, FractionOut)

    // ordered checks by cross-multiplication in decimal(38,0) — exact,
    // no overflow for long terms; bounds render like str(Fraction)
    val n = value0.getField("num").cast(DecimalType(38, 0))
    val d = value0.getField("den").cast(DecimalType(38, 0))
    def cmp(bOpt: Option[String], cond: (Column, Column) => Column,
            typ: String, word: String, key: String): Option[Column] =
      bOpt.map { b =>
        val (p, q) = parseRat(b)
        when(value0.isNotNull && !cond(n * q, d * p),
          oneS(loc, typ, s"Input should be $word ${ratStr((p, q))}", input,
            Map(key -> ratStr((p, q)))))
      }
    val checks = Seq(
      cmp(s.gt, _ > _, T.greaterThan, "greater than", "gt"),
      cmp(s.ge, _ >= _, T.greaterThanEqual, "greater than or equal to", "ge"),
      cmp(s.lt, _ < _, T.lessThan, "less than", "lt"),
      cmp(s.le, _ <= _, T.lessThanEqual, "less than or equal to", "le")
    ).flatten
    Compiled(value0,
      merge(Seq(
        collect(Seq(when(parseFail, oneS(loc, "fraction_parsing", parseMsg,
          input)))),
        collect(checks))),
      FractionOut)
  }

  // ---------------------------------------------------------------- complex

  private val ComplexOut: DataType =
    StructType(Seq(StructField("re", DoubleType), StructField("im", DoubleType)))

  /** Python `complex()` literal grammar (the reference delegates string
   * parsing to it — `complex.rs:66-93` string_to_complex): floats with
   * single underscores between digits, optional fraction/exponent,
   * inf/infinity/nan, in the shapes `float`, `float±[float]J`,
   * `[±][float]J`. Exactly three capturing groups (real; signed
   * imaginary of the two-part form; signed imaginary of the pure-J
   * form) — everything else non-capturing so regexp_extract indices
   * hold. */
  private val CxD = "[0-9](?:_?[0-9])*"
  private val CxF = s"(?:(?:$CxD(?:\\.(?:$CxD)?)?|\\.$CxD)(?:[eE][+-]?$CxD)?" +
    "|[iI][nN][fF](?:[iI][nN][iI][tT][yY])?|[nN][aA][nN])"
  private val CxCore =
    s"\\A(?:([+-]?$CxF)(?:([+-](?:$CxF)?)[jJ])?|([+-]?(?:$CxF)?)[jJ])\\z"

  private def compileComplex(input: Column, t: DataType,
                             loc: Column): Compiled = {
    val strParseMsg = "Input should be a valid complex string following " +
      "the rules at https://docs.python.org/3/library/functions.html#complex"
    val typeMsg = "Input should be a valid python complex object, a number, " +
      "or a valid complex string following the rules at " +
      "https://docs.python.org/3/library/functions.html#complex"
    t match {
      case tt if isNumeric(tt) =>
        ok(when(input.isNotNull,
          struct(input.cast(DoubleType).as("re"), lit(0.0).as("im"))),
          ComplexOut)
      case st: StructType if st.fieldNames.sorted.toSeq == Seq("im", "re") =>
        ok(when(input.isNotNull,
          struct(input.getField("re").cast(DoubleType).as("re"),
            input.getField("im").cast(DoubleType).as("im"))), ComplexOut)
      case StringType =>
        // complex() strips outer whitespace, then at most ONE paren pair
        // (whitespace allowed again inside): '( 1+2j )' ok, '((1+2j))' not
        val s1 = trim(input)
        val core = when(s1.rlike("\\A\\(.*\\)\\z"),
          trim(regexp_extract(s1, "\\A\\((.*)\\)\\z", 1))).otherwise(s1)
        val matched = core.rlike(CxCore)
        val g1 = regexp_extract(core, CxCore, 1)
        val g2 = regexp_extract(core, CxCore, 2)
        val g3 = regexp_extract(core, CxCore, 3)
        // total (hoisting-safe) string->double: underscores out, inf/nan
        // rewritten to the spellings Spark's ANSI cast accepts, ''->null
        def toD(sc: Column): Column = {
          val noUs = regexp_replace(sc, "_", "")
          val norm = regexp_replace(
            regexp_replace(noUs, "(?i)inf(inity)?", "Infinity"),
            "(?i)nan", "NaN")
          nullif(norm, lit("")).cast(DoubleType)
        }
        // a bare sign (or nothing) before J means magnitude 1: 'j' = 1j
        def imOf(sc: Column): Column =
          when(sc === "" || sc === "+", lit(1.0))
            .when(sc === "-", lit(-1.0))
            .otherwise(toD(sc))
        val re = when(g1 === "", lit(0.0)).otherwise(toD(g1))
        val im = when(g1 =!= "",
            when(g2 === "", lit(0.0)).otherwise(imOf(g2)))
          .otherwise(imOf(g3))
        Compiled(
          when(input.isNotNull && matched, struct(re.as("re"), im.as("im"))),
          collect(Seq(when(input.isNotNull && !matched,
            oneS(loc, "complex_str_parsing", strParseMsg, input)))),
          ComplexOut)
      case _ =>
        typeViolation(loc, "complex_type", typeMsg, input, ComplexOut)
    }
  }

  private def compileDecimal(input: Column, t: DataType, loc: Column,
                             s: DecimalSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val dt = DecimalType(s.precision, s.scale)
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _: DecimalType => (input.cast(dt), Nil)
      case _ if isNumeric(t) => (input.cast(dt), Nil)
      case _: StringType if !strict =>
        val v = regexp_replace(trim(input), "_", "").try_cast(dt)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.decimalParsing, "Input should be a valid decimal", input))))
      case _ =>
        return typeViolation(loc, T.decimalType,
          "Input should be a valid decimal", input, dt)
    }
    // digit counting on the normalized string form — reference
    // decimal.rs:105-136 counts significant digits of the normalized value.
    lazy val normStr = regexp_replace(regexp_replace(
      value.cast(StringType), "^-", ""), "\\.?0+$", "")
    lazy val digits = length(regexp_replace(
      regexp_replace(normStr, "\\.", ""), "^0+", ""))
    lazy val places = when(normStr.contains("."),
      length(element_at(split(normStr, "\\."), 2))).otherwise(lit(0))
    val digitChecks = Seq(
      s.maxDigits.map(n => when(value.isNotNull && digits > n,
        oneS(loc, T.decimalMaxDigits,
          s"Decimal input should have no more than $n digit${if (n == 1) "" else "s"} in total",
          input, Map("max_digits" -> n.toString)))),
      s.decimalPlaces.map(n => when(value.isNotNull && places > n,
        oneS(loc, T.decimalMaxPlaces,
          s"Decimal input should have no more than $n decimal place${if (n == 1) "" else "s"}",
          input, Map("decimal_places" -> n.toString))))
    ).flatten
    val cs = orderedChecks[BigDecimal](value, loc, input, s.gt, s.ge, s.lt,
      s.le, s.multipleOf, (b: BigDecimal) => lit(b.bigDecimal))
    Compiled(value, collect(parseChecks ++ digitChecks ++ cs), dt)
  }

  // ------------------------------------------------------------------- date

  private def compileDate(input: Column, t: DataType, loc: Column,
                          s: DateSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _: DateType => (input, Nil)
      case _: TimestampType if !strict =>
        // lax datetime->date only at exact midnight (`date.rs`,
        // errors/types.rs:343 DateFromDatetimeInexact)
        val v = Coercions.timestampToDateExact(input)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.dateFromDatetimeInexact,
            "Datetimes provided to dates should have zero time - e.g. be exact dates",
            input))))
      case _: StringType if !strict =>
        val v = Coercions.strToDate(input)
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.dateParsing,
            "Input should be a valid date or datetime, input is too short",
            input))))
      case _ =>
        return typeViolation(loc, T.dateType, "Input should be a valid date",
          input, DateType)
    }
    val nowChecks = s.nowOp.toSeq.map {
      case NowOp.Past => when(value.isNotNull && !(value < current_date()),
        oneS(loc, T.datePast, "Date should be in the past", input))
      case NowOp.Future => when(value.isNotNull && !(value > current_date()),
        oneS(loc, T.dateFuture, "Date should be in the future", input))
    }
    val cs = orderedChecks[String](value, loc, input, s.gt, s.ge, s.lt, s.le,
      None, (b: String) => lit(b).cast(DateType))
    Compiled(value, collect(parseChecks ++ nowChecks ++ cs), DateType)
  }

  // --------------------------------------------------------------- datetime

  /** Trailing UTC-offset suffix of an ISO datetime string (Z / ±HH[:]MM). */
  private val tzSuffixRe = "(?:[Zz]|[+-]\\d{2}:?\\d{2})$"

  private def compileDatetime(input: Column, t: DataType, loc: Column,
                              s: DatetimeSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    // string-input fraction handling — speedate MicrosecondsPrecision
    // (datetime.rs:26): Truncate keeps 6 digits, Error rejects
    val fracTooLong = trim(input).rlike("\\.\\d{7}")
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _: TimestampType => (input, Nil)
      case _: DateType if !strict =>
        // lax date->datetime at midnight (`datetime.rs:74-77`)
        (input.cast(TimestampType), Nil)
      case _: StringType if !strict =>
        val normalized = s.microsecondsPrecision match {
          case MicrosecondsPrecision.Truncate =>
            regexp_replace(input, "(\\.\\d{6})\\d+", "$1")
          case MicrosecondsPrecision.Error => input
        }
        val v0 = Coercions.strToTimestamp(normalized)
        val v = s.microsecondsPrecision match {
          case MicrosecondsPrecision.Error => when(!fracTooLong, v0)
          case _ => v0
        }
        val precisionCheck = s.microsecondsPrecision match {
          case MicrosecondsPrecision.Error =>
            // v2 string path tries date-then-datetime, so an over-long
            // fraction surfaces as datetime_from_date_parsing (observed
            // against pydantic-core 2.41/2.48)
            Seq(when(input.isNotNull && fracTooLong,
              oneS(loc, "datetime_from_date_parsing",
                "Input should be a valid datetime or date, unexpected extra characters at the end of the input",
                input,
                Map("error" -> "unexpected extra characters at the end of the input"))))
          case _ => Nil
        }
        (v, precisionCheck ++ Seq(when(
          input.isNotNull && v.isNull && !(fracTooLong &&
            (s.microsecondsPrecision == MicrosecondsPrecision.Error)),
          oneS(loc, T.datetimeParsing,
            "Input should be a valid datetime, invalid datetime separator",
            input))))
      case _ if isNumeric(t) && !strict =>
        (Coercions.epochToTimestamp(input), Nil)
      case _ =>
        return typeViolation(loc, T.datetimeType,
          "Input should be a valid datetime", input, TimestampType)
    }
    // tz_constraint (datetime.rs:30-42; errors types.rs:368-374,583)
    val tzChecks: Seq[Column] = s.tz match {
      case None => Nil
      case Some(cons) =>
        // aware <=> the raw string carries an offset suffix; TimestampType
        // inputs are aware UTC instants, TimestampNTZ/date are naive
        val (isAware, actualOffset): (Column, Column) = t match {
          case _: StringType =>
            val raw = trim(input)
            val hasTz = raw.rlike(tzSuffixRe)
            val z = raw.rlike("[Zz]$")
            val sign = when(raw.rlike("\\+\\d{2}:?\\d{2}$"), 1)
              .when(raw.rlike("-\\d{2}:?\\d{2}$"), -1).otherwise(0)
            val hh = regexp_extract(raw, "([+-])(\\d{2}):?(\\d{2})$", 2)
            val mm = regexp_extract(raw, "([+-])(\\d{2}):?(\\d{2})$", 3)
            val off = when(z, lit(0)).otherwise(
              sign * (coalesce(hh.try_cast(IntegerType), lit(0)) * 3600 +
                coalesce(mm.try_cast(IntegerType), lit(0)) * 60))
            (hasTz, off)
          case _: TimestampType => (lit(true), lit(0))
          case _ => (lit(false), lit(null).cast(IntegerType))
        }
        cons match {
          case TzConstraint.Aware => Seq(
            when(value.isNotNull && !isAware,
              oneS(loc, "timezone_aware", "Input should have timezone info",
                input)))
          case TzConstraint.Naive => Seq(
            when(value.isNotNull && isAware,
              oneS(loc, "timezone_naive",
                "Input should not have timezone info", input)))
          case TzConstraint.Offset(exp) => Seq(
            // naive input under an offset constraint -> timezone_aware
            when(value.isNotNull && !isAware,
              oneS(loc, "timezone_aware", "Input should have timezone info",
                input)),
            when(value.isNotNull && isAware && actualOffset =!= exp,
              one(loc, "timezone_offset",
                concat(lit(s"Timezone offset of $exp required, got "),
                  actualOffset.cast(StringType)),
                input,
                map(lit("tz_expected"), lit(exp.toString),
                  lit("tz_actual"), actualOffset.cast(StringType)))))
        }
    }
    val nowChecks = s.nowOp.toSeq.map {
      case NowOp.Past => when(value.isNotNull && !(value < current_timestamp()),
        oneS(loc, T.datetimePast, "Input should be in the past", input))
      case NowOp.Future => when(value.isNotNull && !(value > current_timestamp()),
        oneS(loc, T.datetimeFuture, "Input should be in the future", input))
    }
    val cs = orderedChecks[String](value, loc, input, s.gt, s.ge, s.lt, s.le,
      None, (b: String) => lit(b).cast(TimestampType))
    Compiled(value, collect(parseChecks ++ tzChecks ++ nowChecks ++ cs),
      TimestampType)
  }

  // ------------------------------------------------------------------- time

  private def compileTime(input: Column, t: DataType, loc: Column,
                          s: TimeSpec, mode: Mode): Compiled = {
    if (!t.isInstanceOf[StringType])
      return typeViolation(loc, T.timeType, "Input should be a valid time",
        input, DoubleType)
    val v = Coercions.timeStrToSeconds(trim(input))
    val parseCheck = when(input.isNotNull && v.isNull,
      oneS(loc, T.timeParsing,
        "Input should be in a valid time format, invalid character in hour",
        input))
    def bound(b: String): Column = Coercions.timeStrToSeconds(lit(b))
    val cs = Seq(
      s.gt.map(b => when(v.isNotNull && !(v > bound(b)),
        oneS(loc, T.greaterThan, s"Input should be greater than $b", input,
          Map("gt" -> b)))),
      s.ge.map(b => when(v.isNotNull && !(v >= bound(b)),
        oneS(loc, T.greaterThanEqual,
          s"Input should be greater than or equal to $b", input, Map("ge" -> b)))),
      s.lt.map(b => when(v.isNotNull && !(v < bound(b)),
        oneS(loc, T.lessThan, s"Input should be less than $b", input,
          Map("lt" -> b)))),
      s.le.map(b => when(v.isNotNull && !(v <= bound(b)),
        oneS(loc, T.lessThanEqual,
          s"Input should be less than or equal to $b", input, Map("le" -> b))))
    ).flatten
    Compiled(v, collect(parseCheck +: cs), DoubleType)
  }

  // -------------------------------------------------------------- timedelta

  private def compileTimedelta(input: Column, t: DataType, loc: Column,
                               s: TimedeltaSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val (value, parseChecks): (Column, Seq[Column]) = t match {
      case _: StringType =>
        val v = Coercions.timedeltaStrToSeconds(trim(input))
        (v, Seq(when(input.isNotNull && v.isNull,
          oneS(loc, T.timeDeltaParsing,
            "Input should be a valid timedelta, invalid digit in duration",
            input))))
      case _ if isNumeric(t) && !strict =>
        // lax numeric = total seconds (speedate accepts int/float seconds)
        (input.cast(DoubleType), Nil)
      case _ =>
        return typeViolation(loc, T.timeDeltaType,
          "Input should be a valid timedelta", input, DoubleType)
    }
    val cs = orderedChecks[Double](value, loc, input, s.gt, s.ge, s.lt, s.le,
      None, lit(_))
    Compiled(value, collect(parseChecks ++ cs), DoubleType)
  }

  // ------------------------------------------------------------------ bytes

  private def compileBytes(input: Column, t: DataType, loc: Column,
                           s: BytesSpec, mode: Mode): Compiled = {
    val strict = strictOf(s.strict, mode)
    val (value, encChecks): (Column, Seq[Column]) = t match {
      case _: BinaryType => (input, Nil)
      case _: StringType if !strict => s.mode match {
        case BytesEncoding.Utf8 => (input.cast(BinaryType), Nil)
        case BytesEncoding.Base64 =>
          // native decode with the reference's exact two-alphabet fallback
          // and crate error strings (config.rs:88-102, base64 0.22.1;
          // golden strings test_json.py:229) — one evaluation per row,
          // URL_SAFE and STANDARD alphabets both accepted like pydantic
          val dec = graft.functions.BytesDecode.base64Col(input)
          val err = dec.getField("err")
          (dec.getField("bytes"),
            Seq(when(input.isNotNull && err.isNotNull,
              one(loc, "bytes_invalid_encoding",
                concat(lit("Data should be valid base64: "), err), input,
                map(lit("encoding"), lit("base64"),
                  lit("encoding_error"), err)))))
        case BytesEncoding.Hex =>
          // hex crate 0.4.3 semantics: odd length first, then first bad
          // char with Rust char-debug rendering (test_json.py:261,273)
          val dec = graft.functions.BytesDecode.hexCol(input)
          val err = dec.getField("err")
          (dec.getField("bytes"),
            Seq(when(input.isNotNull && err.isNotNull,
              one(loc, "bytes_invalid_encoding",
                concat(lit("Data should be valid hex: "), err), input,
                map(lit("encoding"), lit("hex"),
                  lit("encoding_error"), err)))))
      }
      case _ =>
        return typeViolation(loc, T.bytesType, "Input should be a valid bytes",
          input, BinaryType)
    }
    // byte counts, not chars — reference bytes.rs; Spark octet_length
    val checks = Seq(
      s.minLength.map(n => when(value.isNotNull && octet_length(value) < n,
        oneS(loc, T.bytesTooShort,
          s"Data should have at least $n bytes", input,
          Map("min_length" -> n.toString)))),
      s.maxLength.map(n => when(value.isNotNull && octet_length(value) > n,
        oneS(loc, T.bytesTooLong,
          s"Data should have at most $n bytes", input,
          Map("max_length" -> n.toString))))
    ).flatten
    Compiled(value, collect(encChecks ++ checks), BinaryType)
  }

  // ------------------------------------------------------------------- uuid

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  private def compileUuid(input: Column, t: DataType, loc: Column,
                          s: UuidSpec, mode: Mode): Compiled = {
    if (!t.isInstanceOf[StringType])
      return typeViolation(loc, T.uuidParsing, "Input should be a valid UUID",
        input, StringType)
    val v0 = trim(input)
    val valid = v0.rlike(uuidRe)
    val checks = Seq(
      Some(when(input.isNotNull && !valid,
        oneS(loc, T.uuidParsing,
          "Input should be a valid UUID, invalid character", input))),
      // version nibble is char 15 of the canonical form (`uuid.rs:69,103`)
      s.version.map(ver => when(input.isNotNull && valid &&
          substring(lower(v0), 15, 1) =!= ver.toString,
        oneS(loc, T.uuidVersion,
          s"UUID version $ver expected", input,
          Map("expected_version" -> ver.toString))))
    ).flatten
    Compiled(when(valid, lower(v0)), collect(checks), StringType)
  }

  // --------------------------------------------------------------------- ip

  /** `IPvAnyAddress`/`Interface`/`Network` (`networks.py:1159-1302`): the
   * native [[graft.functions.IpCanon]] expression yields the CPython
   * canonical string or null; null on non-null input raises the
   * corresponding PydanticCustomError type with pydantic's exact message.
   * The canon expression appears in both the value and the violation guard
   * — codegen CSE dedupes the parse (the compileUuid pattern). */
  private def compileIp(input: Column, t: DataType, loc: Column,
                        s: IpSpec): Compiled = {
    import graft.functions.IpCanon
    val (canonOf, errT, what) = s.kind match {
      case "interface" =>
        ((c: Column) => IpCanon.ipInterface(c), T.ipAnyInterface,
          "IPv4 or IPv6 interface")
      case "network" =>
        ((c: Column) => IpCanon.ipNetwork(c), T.ipAnyNetwork,
          "IPv4 or IPv6 network")
      case _ =>
        ((c: Column) => IpCanon.ipAddress(c), T.ipAnyAddress,
          "IPv4 or IPv6 address")
    }
    if (!t.isInstanceOf[StringType])
      return typeViolation(loc, errT, s"value is not a valid $what",
        input, StringType)
    val canon = canonOf(input)
    Compiled(canon,
      collect(Seq(when(input.isNotNull && canon.isNull,
        oneS(loc, errT, s"value is not a valid $what", input)))),
      StringType)
  }

  // -------------------------------------------------------------------- url

  private def compileUrl(input: Column, t: DataType, loc: Column,
                         s: UrlSpec, mode: Mode): Compiled = {
    if (!t.isInstanceOf[StringType])
      return typeViolation(loc, T.urlParsing, "Input should be a valid URL",
        input, StringType)
    val v = trim(input)
    val schemeChecks = (scheme: Column) => Seq(
      Some(when(input.isNotNull && (scheme.isNull || scheme === ""),
        oneS(loc, T.urlParsing,
          "Input should be a valid URL, relative URL without a base", input))),
      s.maxLength.map(n => when(input.isNotNull && length(v) > n,
        oneS(loc, T.urlTooLong,
          s"URL should have at most $n characters", input,
          Map("max_length" -> n.toString)))),
      (if (s.allowedSchemes.nonEmpty)
        Some(when(input.isNotNull && scheme.isNotNull && scheme =!= "" &&
            !scheme.isin(s.allowedSchemes.map(_.toLowerCase): _*),
          oneS(loc, T.urlScheme,
            s"URL scheme should be ${s.allowedSchemes.map("'" + _ + "'").mkString(" or ")}",
            input, Map("expected_schemes" -> s.allowedSchemes.mkString(",")))))
      else None)
    ).flatten

    if (s.multiHost) {
      // MultiHostUrl (`url.rs` multi-host half; `networks.py:731-999`):
      // the authority is a comma-separated host list. java.net/Hive
      // parse_url rejects such URLs, so parts come from anchored regexes
      // (codegen'd).
      val scheme = lower(regexp_extract(v, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
      val authority = regexp_extract(v,
        "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
      val hosts = split(authority, ",")
      // host of one entry = part after userinfo, before port
      val anyEmptyHost = exists(hosts, h =>
        length(regexp_extract(element_at(split(h, "@"), -1),
          "^([^:]*)", 1)) === 0)
      val checks = schemeChecks(scheme) ++ Seq(
        when(input.isNotNull && scheme =!= "" && anyEmptyHost,
          oneS(loc, T.urlParsing, "Input should be a valid URL, empty host",
            input)))
      return Compiled(when(scheme =!= "" && !anyEmptyHost, v),
        collect(checks), StringType)
    }

    val scheme = lower(try_parse_url(v, lit("PROTOCOL")))
    val host = try_parse_url(v, lit("HOST"))
    val checks = schemeChecks(scheme) ++ Seq(
      (if (s.hostRequired && s.defaultHost.isEmpty)
        Some(when(input.isNotNull && scheme.isNotNull &&
            (host.isNull || host === ""),
          oneS(loc, T.urlParsing, "Input should be a valid URL, empty host",
            input)))
      else None)
    ).flatten
    // DSN default filling (UrlConstraints default_host/port/path): rebuild
    // the coerced value with absent parts substituted — string surgery on
    // the original, so present parts stay byte-identical.
    val withHost = s.defaultHost match {
      case Some(dh) => when(host.isNull || host === "",
        regexp_replace(v, "^([a-zA-Z][a-zA-Z0-9+.-]*://)", s"$$1$dh"))
        .otherwise(v)
      case None => v
    }
    val port = regexp_extract(withHost,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]*:(\\d+)", 1)
    val withPort = s.defaultPort match {
      case Some(dp) => when(port === "",
        regexp_replace(withHost,
          "^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+)", s"$$1:$dp"))
        .otherwise(withHost)
      case None => withHost
    }
    val path = try_parse_url(withPort, lit("PATH"))
    val withPath = s.defaultPath match {
      case Some(dp) => when(path.isNull || path === "",
        concat(withPort, lit(dp))).otherwise(withPort)
      case None => withPort
    }
    Compiled(when(scheme.isNotNull, withPath), collect(checks), StringType)
  }

  // ------------------------------------------------------------ collections

  private def compileList(input: Column, t: DataType, loc: Column,
                          s: ListSpec, mode: Mode): Compiled = t match {
    case ArrayType(elemType, _) =>
      val sizeChecks = Seq(
        s.minLength.map(n => when(input.isNotNull && size(input) < n,
          oneS(loc, T.tooShort,
            s"List should have at least $n item${if (n == 1) "" else "s"} after validation, not fewer",
            input, Map("min_length" -> n.toString)))),
        s.maxLength.map(n => when(input.isNotNull && size(input) > n,
          oneS(loc, T.tooLong,
            s"List should have at most $n item${if (n == 1) "" else "s"} after validation, not more",
            input, Map("max_length" -> n.toString))))
      ).flatten
      s.item match {
        case AnySpec =>
          Compiled(input, collect(sizeChecks), t)
        case itemSpec =>
          // element loc = loc ++ [index] — reference loc paths carry list
          // indices (`errors/location.rs:15-23`).
          val allElemViols = flatten(transform(input, (x, i) =>
            compile(x, elemType, concat(loc, array(i.cast(StringType))),
              itemSpec, mode).violations))
          // fail_fast: keep only the first violation (list.rs:21,113)
          val elemViols =
            if (s.failFast) slice(allElemViols, 1, 1) else allElemViols
          val firstCompiled = compile(lit(null).cast(elemType), elemType,
            loc, itemSpec, mode)
          val mapped0 = transform(input, x =>
            compile(x, elemType, loc, itemSpec, mode).value)
          // on_error=omit items (directly or nested under Nullable/Chain):
          // drop exactly the elements whose inner validation ERRORED — a
          // with_raise probe supplies the pre-swallow violation signal, so
          // a legitimately-valid null element survives (filtering on value
          // nullness dropped it; with_default.rs:110-122 drops errored
          // items only). HOF — acceptable, omit is opt-in.
          val mapped = if (omitsOnError(itemSpec)) {
            val probeSpec = withRaiseOnError(itemSpec)
            val paired = transform(input, x => struct(
              compile(x, elemType, loc, itemSpec, mode).value.as("v"),
              (size(compile(x, elemType, loc, probeSpec, mode).violations) > 0)
                .as("bad")))
            transform(filter(paired, p => !p.getField("bad")),
              p => p.getField("v"))
          } else mapped0
          Compiled(mapped,
            merge(Seq(collect(sizeChecks),
              when(input.isNull, empty).otherwise(elemViols))),
            ArrayType(firstCompiled.dataType))
      }
    case _ =>
      typeViolation(loc, "list_type", "Input should be a valid list", input,
        ArrayType(StringType))
  }

  // ------------------------------------------------------------------ tuple

  /** Positional tuple — reference `validators/tuple.rs`. Output is a
   * struct `_0.._{n-1}` of per-position coerced values (+ `rest`
   * array<variadic> when present, + `_{n+1}..` post-variadic suffix
   * positions named by their items_schema index). Head and suffix
   * positions are static expressions (fully codegen'd); only the variadic
   * tail uses array HOFs. Suffix binding and error locs follow the
   * reference's tail-buffer iterator exactly (`tuple.rs:122-210`, see
   * [[graft.spec.TupleSpec]]). */
  private def compileTuple(input: Column, t: DataType, loc: Column,
                           s: TupleSpec, mode: Mode): Compiled = {
    require(s.suffix.isEmpty || s.variadic.nonEmpty,
      "TupleSpec.suffix requires a variadic item (pydantic's " +
        "variadic_item_index always points inside items_schema)")
    val n = s.items.size
    def elemLoc(i: Column) = concat(loc, array(i.cast(StringType)))

    /** One post-variadic suffix position: element binding + the lagged
     * reference loc (`P + j` at zero variadic matches, `P + m - 1 + j`
     * otherwise — tuple.rs:170-206). */
    def suffixItem(item: Spec, elem: Column, elemType: DataType,
                   present: Column, locIdx: Column): (Column, Column, DataType) = {
      val c = compile(elem, elemType, elemLoc(locIdx), item, mode)
      val viols =
        if (hasDefault(item)) c.violations // absent -> default (tuple.rs:90)
        else when(present, c.violations).otherwise(collect(Seq(
          oneS(elemLoc(locIdx), T.missing, "Field required", lit(null)))))
      (c.value, viols, c.dataType)
    }

    /** Shared logic once positions are exposed as (present, elem, type). */
    def build(len: Column, headElem: Int => Column, elemType: Int => DataType,
              tailViols: Option[Spec] => Seq[Column],
              restValue: Option[(Column, DataType)],
              suffixParts: Seq[(Column, Column, DataType)]): Compiled = {
      val head = s.items.zipWithIndex.map { case (item, i) =>
        val present = len > i
        val c = compile(headElem(i), elemType(i), elemLoc(lit(i)), item, mode)
        val viols =
          if (hasDefault(item)) c.violations // absent -> default (tuple.rs:90)
          else when(present, c.violations).otherwise(collect(Seq(
            oneS(elemLoc(lit(i)), T.missing, "Field required", lit(null)))))
        (c.value, viols, c.dataType)
      }
      val sizeChecks = Seq(
        (if (s.variadic.isEmpty)
          Some(when(len > n, oneS(loc, T.tooLong,
            s"Tuple should have at most $n item${if (n == 1) "" else "s"} after validation, not more",
            input, Map("max_length" -> n.toString))))
        else None),
        s.minLength.map(m => when(len < m, oneS(loc, T.tooShort,
          s"Tuple should have at least $m item${if (m == 1) "" else "s"} after validation, not fewer",
          input, Map("min_length" -> m.toString)))),
        s.maxLength.map(m => when(len > m, oneS(loc, T.tooLong,
          s"Tuple should have at most $m item${if (m == 1) "" else "s"} after validation, not more",
          input, Map("max_length" -> m.toString))))
      ).flatten
      val all = merge(head.map(_._2) ++
        Seq(collect(sizeChecks)) ++ tailViols(s.variadic) ++
        suffixParts.map(_._2))
      val gated0 = when(input.isNull, empty).otherwise(all)
      val gated = if (s.failFast) slice(gated0, 1, 1) else gated0
      val fields = head.zipWithIndex.map { case ((v, _, _), i) => v.as(s"_$i") }
      // suffix fields keep their items_schema index: the variadic itself
      // occupies schema index n, so suffix j is `_{n+1+j}`
      val sufFields = suffixParts.zipWithIndex.map { case ((v, _, _), j) =>
        v.as(s"_${n + 1 + j}") }
      val value = struct(fields ++ restValue.map(_._1.as("rest")) ++
        sufFields: _*)
      val dt = StructType(
        head.zipWithIndex.map { case ((_, _, d), i) => StructField(s"_$i", d) } ++
          restValue.map { case (_, rdt) => StructField("rest", ArrayType(rdt)) } ++
          suffixParts.zipWithIndex.map { case ((_, _, d), j) =>
            StructField(s"_${n + 1 + j}", d) })
      Compiled(when(input.isNotNull, value), gated, dt)
    }

    t match {
      case ArrayType(elemType, _) =>
        val len = size(input)
        val len0 = coalesce(len, lit(0))
        // variadic match count: everything between the head and the
        // suffix-claimed last elements (tuple.rs:167 — the tail buffer
        // always holds the LAST suffix.size items)
        val mVar = greatest(len0 - lit(n + s.suffix.size), lit(0))
        val tailViols = (variadic: Option[Spec]) => variadic.toSeq.map { v =>
          // variadic tail via HOF (interpreted — acceptable: tuples are not
          // the hot path; heavy homogeneous tails belong in ListSpec +
          // planExplodedList)
          val tail = slice(input, lit(n + 1), mVar)
          when(input.isNull, empty).otherwise(
            flatten(transform(tail, (x, i) =>
              compile(x, elemType, elemLoc(i + n), v, mode).violations)))
        }
        val restValue = s.variadic.map { v =>
          val tail = slice(input, lit(n + 1), mVar)
          (transform(tail, x => compile(x, elemType, loc, v, mode).value),
            compile(lit(null).cast(elemType), elemType, loc, v, mode).dataType)
        }
        val suffixParts = s.suffix.zipWithIndex.map { case (item, j) =>
          val idx0 = lit(n + j) + mVar // 0-based input index of suffix j
          val present = len0 > idx0
          val locIdx = when(mVar === lit(0), lit(n + j))
            .otherwise(lit(n + j - 1) + mVar)
          suffixItem(item, try_element_at(input, idx0 + lit(1)), elemType,
            present, locIdx)
        }
        build(len0, i => try_element_at(input, lit(i + 1)),
          _ => elemType, tailViols, restValue, suffixParts)

      case st: StructType =>
        // struct input: fields in declaration order are the positions —
        // everything static, fully codegen'd
        val fieldsN = st.fields.length
        val len = when(input.isNotNull, lit(fieldsN)).otherwise(lit(0))
        // struct input has a static arity: the variadic match count and
        // every suffix binding resolve at compile time
        val mInt = math.max(fieldsN - n - s.suffix.size, 0)
        val tailViols = (variadic: Option[Spec]) => variadic.toSeq.flatMap { v =>
          (n until n + mInt).map { i =>
            when(input.isNull, empty).otherwise(
              compile(input.getField(st.fieldNames(i)), st.fields(i).dataType,
                elemLoc(lit(i)), v, mode).violations)
          }
        }
        val restValue = s.variadic.map { v =>
          // struct tails may mix Spark types per position — unify as string
          val restCols = (n until n + mInt).map { i =>
            compile(input.getField(st.fieldNames(i)), st.fields(i).dataType,
              loc, v, mode).value.cast(StringType)
          }
          (if (restCols.isEmpty) array().cast(ArrayType(StringType))
           else array(restCols: _*), StringType: DataType)
        }
        val suffixParts = s.suffix.zipWithIndex.map { case (item, j) =>
          val i = n + mInt + j
          val lag = if (mInt == 0) n + j else n + mInt - 1 + j
          if (i < fieldsN)
            suffixItem(item, input.getField(st.fieldNames(i)),
              st.fields(i).dataType, input.isNotNull, lit(lag))
          else
            suffixItem(item, lit(null).cast(StringType), StringType,
              lit(false), lit(lag))
        }
        build(len,
          i => if (i < fieldsN) input.getField(st.fieldNames(i))
               else lit(null).cast(StringType),
          i => if (i < fieldsN) st.fields(i).dataType else StringType,
          tailViols, restValue, suffixParts)

      case _ =>
        typeViolation(loc, "tuple_type", "Input should be a valid tuple",
          input, StructType(s.items.indices.map(i =>
            StructField(s"_$i", StringType))))
    }
  }

  /** NamedTuple — reference `validators/named_tuple.rs`. Positional over
   * array input (`:308-385`, index locs, extra items -> one `too_long`
   * carrying `actual_length` that REPLACES accumulated field errors, per
   * the early `return Err` at `:367-377`); keyword over struct input
   * (`:178-245`, name locs) = the model-fields engine with extra always
   * forbidden (`:296-305`). Output struct keeps the real field names. */
  private def compileNamedTuple(input: Column, t: DataType, loc: Column,
                                s: NamedTupleSpec, mode: Mode): Compiled = t match {
    case _: StructType =>
      compileModel(input, t, loc, ModelSpec(s.name, s.fields, Extra.Forbid, mode), mode)
    case ArrayType(elemType, _) =>
      val n = s.fields.size
      val len = coalesce(size(input), lit(0))
      val results = s.fields.zipWithIndex.map { case (f, i) =>
        val floc = concat(loc, array(lit(i.toString)))
        val c = compile(try_element_at(input, lit(i + 1)), elemType, floc,
          f.spec, mode)
        val viols =
          if (hasDefault(f.spec)) c.violations // absent -> default
          else when(len > i, c.violations).otherwise(
            if (f.required)
              collect(Seq(oneS(floc, T.missing, "Field required", lit(null))))
            else empty)
        (f.name, c.value, viols, c.dataType)
      }
      val plural = if (n == 1) "" else "s"
      val tooLong = collect(Seq(one(loc, T.tooLong,
        concat(
          lit(s"NamedTuple should have at most $n item$plural after validation, not "),
          size(input).cast(StringType)),
        input,
        map(lit("field_type"), lit("NamedTuple"),
          lit("max_length"), lit(n.toString),
          lit("actual_length"), size(input).cast(StringType)))))
      val viols = when(input.isNull, empty)
        .otherwise(when(size(input) > n, tooLong)
          .otherwise(merge(results.map(_._3))))
      val value = struct(results.map { case (fn, v, _, _) => v.as(fn) }: _*)
      Compiled(when(input.isNotNull, value), viols,
        StructType(results.map { case (fn, _, _, dt) => StructField(fn, dt) }))
    case _ =>
      typeViolation(loc, "named_tuple_type",
        s"Input should be a tuple, list, dictionary or an instance of ${s.name}",
        input, StructType(s.fields.map(f => StructField(f.name, StringType))))
  }

  /** Dataclass — reference `validators/dataclass.rs` (`dataclass-args`
   * keyword path): the model-fields engine verbatim; only the wrong-input
   * error differs (`dataclass_type`, `errors/types.rs:510`). */
  private def compileDataclass(input: Column, t: DataType, loc: Column,
                               s: DataclassSpec, mode: Mode): Compiled = t match {
    case _: StructType =>
      compileModel(input, t, loc, ModelSpec(s.name, s.fields, s.extra, mode), mode)
    case _ =>
      typeViolation(loc, "dataclass_type",
        s"Input should be a dictionary or an instance of ${s.name}",
        input, StructType(s.fields.map(f => StructField(f.name, StringType))))
  }

  private def compileSet(input: Column, t: DataType, loc: Column,
                         s: SetSpec, mode: Mode): Compiled = {
    // set = unique list: dedupe is a coercion, not an error
    // (reference `set.rs`; "sets - unique lists" `mod.rs:600-601`)
    val asList = compileList(input, t, loc,
      ListSpec(s.item, s.minLength, s.maxLength), mode)
    Compiled(array_distinct(asList.value), asList.violations, asList.dataType)
  }

  private def compileDict(input: Column, t: DataType, loc: Column,
                          s: DictSpec, mode: Mode): Compiled = t match {
    case MapType(kt, vt, _) =>
      val sizeChecks = Seq(
        s.minLength.map(n => when(input.isNotNull && size(input) < n,
          oneS(loc, T.tooShort,
            s"Dictionary should have at least $n item${if (n == 1) "" else "s"} after validation, not fewer",
            input, Map("min_length" -> n.toString)))),
        s.maxLength.map(n => when(input.isNotNull && size(input) > n,
          oneS(loc, T.tooLong,
            s"Dictionary should have at most $n item${if (n == 1) "" else "s"} after validation, not more",
            input, Map("max_length" -> n.toString))))
      ).flatten
      val keyViols = s.key match {
        case AnySpec => empty
        case ks => flatten(transform(map_keys(input), k =>
          compile(k, kt, concat(loc, array(k.cast(StringType))), ks, mode)
            .violations))
      }
      val valViols = s.value match {
        case AnySpec => empty
        case vs => flatten(transform(map_entries(input), e =>
          compile(e.getField("value"), vt,
            concat(loc, array(e.getField("key").cast(StringType))), vs, mode)
            .violations))
      }
      Compiled(input,
        merge(Seq(collect(sizeChecks),
          when(input.isNull, empty).otherwise(merge(Seq(keyViols, valViols))))),
        t)
    case _ =>
      typeViolation(loc, "dict_type", "Input should be a valid dictionary",
        input, MapType(StringType, StringType))
  }

  // ------------------------------------------------------------------- json

  private def compileJson(input: Column, t: DataType, loc: Column,
                          s: JsonSpec, mode: Mode): Compiled = {
    if (!t.isInstanceOf[StringType])
      return typeViolation(loc, T.jsonType, "JSON input should be string",
        input, StringType)
    // parse+validate fused like jiter (`validators/json.rs:24`,
    // docs/why.md:60-61) — from_json and the inner checks sit in one
    // projection, Catalyst fuses them.
    val parsedType = DataType.fromDDL(s.innerDdl)
    // allow_partial (`validators/mod.rs:183-304`): recover the truncated
    // prefix BEFORE parsing; a non-prefix malformed input passes through
    // unchanged and fails the parse exactly as without partial mode
    val effInput = s.allowPartial match {
      case Some(m) => coalesce(graft.functions.JsonPartialOps
        .completeJson(input, m == "trailing-strings"), input)
      case None => input
    }
    val parsed = from_json(effInput, parsedType, Map("mode" -> "PERMISSIVE"))
    // from_json PERMISSIVE never nulls the struct on malformed input, so
    // validity comes from try_parse_json (null <=> not JSON). The reported
    // `input` stays the ORIGINAL string (pydantic reports what the user
    // sent, not the recovered text).
    val parseCheck = when(input.isNotNull && try_parse_json(effInput).isNull,
      oneS(loc, T.jsonInvalid, "Invalid JSON", input))
    val innerCompiled = s.inner.map { m =>
      compileModel(parsed, parsedType, loc, m, mode)
    }
    Compiled(
      innerCompiled.map(_.value).getOrElse(parsed),
      merge(Seq(collect(Seq(parseCheck)),
        // invalid JSON reports ONLY json_invalid (json.rs bails before the
        // inner validator) — suppress inner violations on parse failure
        innerCompiled.map(c => when(
            parsed.isNull || try_parse_json(effInput).isNull, empty)
          .otherwise(c.violations))
          .getOrElse(empty))),
      innerCompiled.map(_.dataType).getOrElse(parsedType))
  }

  // ------------------------------------------------------------------ union

  private def compileUnion(input: Column, t: DataType, loc: Column,
                           s: UnionSpec, mode: Mode): Compiled = {
    // LeftToRight: first success wins == ordered coalesce of try-branches
    // (exact port of `union.rs:194-210`).
    // Smart: three preference tiers replaying the exactness scoring of
    // `union.rs:139-157` in columnar terms — EXACT (strict success AND the
    // branch's natural type equals the input column type; e.g. int input
    // to Union[float, int] picks int even though strict float accepts
    // ints), then STRICT (cross-type strict acceptances, i.e. int->float),
    // then LAX. Exact-tier entries REUSE the strict compilations (they are
    // the same Compiled objects reordered in the coalesce), so the plan
    // still carries exactly strict+lax per branch.
    lazy val strictCompiled = s.choices.map(compile(input, t, loc, _, Mode.Strict))
    lazy val laxCompiled = s.choices.map(compile(input, t, loc, _, Mode.Lax))
    val compiled: Seq[Compiled] = s.mode match {
      case UnionMode.LeftToRight =>
        s.choices.map(compile(input, t, loc, _, mode))
      case UnionMode.Smart =>
        // compare against the CANONICAL input type: compiled branches
        // always emit Long/Double, but the input column may be any
        // physical int/float width (parquet INT32 etc.) — an IntegerType
        // column is still "exactly an int" to the reference
        val ct = canonNumeric(t)
        strictCompiled.filter(_.dataType == ct) ++
          strictCompiled.filterNot(_.dataType == ct) ++ laxCompiled
    }
    val sameType = compiled.map(_.dataType).distinct.size == 1
    val outType: DataType = if (sameType) compiled.head.dataType else StringType
    val tryVals = compiled.map { c =>
      val v = if (sameType) c.value else c.value.cast(StringType)
      when(size(c.violations) === 0 && input.isNotNull, v)
    }
    val anyOk = compiled
      .map(c => size(c.violations) === 0)
      .reduce(_ || _)
    // On total failure emit every branch's violations (reference emits all
    // branch errors, `union.rs:190-191`). REUSE the already-compiled
    // branches (for Smart that is the lax tail — the error dialect the
    // reference reports) instead of compiling a third copy: a wide union
    // over a complex model would otherwise triple its expression-tree size
    // and push the projection toward the 64KB codegen cliff.
    val failBranches = s.mode match {
      case UnionMode.LeftToRight => compiled
      case UnionMode.Smart => compiled.drop(s.choices.size) // the lax pass
    }
    val failViols = merge(failBranches.map(_.violations))
    Compiled(
      when(input.isNotNull, coalesce(tryVals: _*)),
      when(input.isNull || anyOk, empty).otherwise(failViols),
      outType)
  }

  // ----------------------------------------------------------- tagged union

  private def compileTaggedUnion(input: Column, t: DataType, loc: Column,
                                 s: TaggedUnionSpec, mode: Mode): Compiled =
    t match {
      case st: StructType =>
        val disc = input.getField(s.discriminator)
        // O(1) dispatch == CASE WHEN on the tag (reference `union.rs:336`
        // LiteralLookup; Catalyst case-when short-circuits the same way)
        val branchViols = s.choices.map { case (tag, branchSpec) =>
          (disc === tag, compile(input, st, loc, branchSpec, mode).violations)
        }.toSeq
        // Render the actual tag into the message like the reference does
        // (`errors/types.rs` UnionTagInvalid: "Input tag '{tag}' found using
        // '{discriminator}' does not match any of the expected tags:
        // {expected_tags}") and carry tag/expected_tags in ctx. Tag order is
        // declaration order, matching the reference's tags_repr which walks
        // the choices dict in insertion order (`union.rs:316-331`).
        val expectedTags = s.choices.map(_._1)
          .map("'" + _ + "'").mkString(", ")
        val unknownMsg = concat(
          lit("Input tag '"), coalesce(disc.cast(StringType), lit("None")),
          lit(s"' found using '${s.discriminator}' does not match any of " +
            s"the expected tags: $expectedTags"))
        val unknownCtx = map(
          lit("discriminator"), lit(s.discriminator),
          lit("tag"), coalesce(disc.cast(StringType), lit("None")),
          lit("expected_tags"), lit(expectedTags))
        // null/absent tag -> union_tag_not_found (`union.rs:302-318`),
        // unknown non-null tag -> union_tag_invalid
        val notFound = oneS(loc, T.unionTagNotFound,
          s"Unable to extract tag using discriminator '${s.discriminator}'",
          input, Map("discriminator" -> s.discriminator))
        val unknown = when(disc.isNull, collect(Seq(notFound)))
          .otherwise(collect(Seq(
            one(loc, T.unionTagInvalid, unknownMsg, disc, unknownCtx))))
        val viols = branchViols.foldRight(unknown) { case ((cond, v), els) =>
          when(cond, v).otherwise(els)
        }
        Compiled(input, when(input.isNull, empty).otherwise(viols), t)
      case _ =>
        typeViolation(loc, "model_type", "Input should be an object", input, t)
    }

  // ------------------------------------------------------------------ model

  /** Compile a model against a struct-typed column (nested models). The
   * top-level DataFrame path lives in [[ModelValidator]] and shares this by
   * passing `struct(df.columns)`. */
  def compileModel(input: Column, t: DataType, loc: Column, m: ModelSpec,
                   mode: Mode): Compiled = t match {
    case st: StructType =>
      val present = st.fieldNames.toSet
      val fieldResults: Seq[(String, Column, Column, DataType)] =
        m.fields.map { f =>
          val hit: Option[(Column, DataType)] =
            (f.name +: f.aliases).find(present.contains)
              .map(src => (input.getField(src), st(src).dataType))
              .orElse(f.aliasPaths.iterator
                .flatMap(pth => AliasResolver.resolve(st, input.getField, pth))
                .nextOption())
          val floc = concat(loc, array(lit(f.name)))
          hit match {
            case None =>
              if (f.required && !hasDefault(f.spec))
                (f.name, lit(null).cast(StringType),
                  collect(Seq(oneS(floc, T.missing, "Field required",
                    lit(null)))), StringType: DataType)
              else {
                val c = compile(lit(null).cast(StringType), StringType, floc,
                  f.spec, m.mode)
                (f.name, c.value, c.violations, c.dataType)
              }
            case Some((col0, ft)) =>
              val c = compile(col0, ft, floc, f.spec, m.mode)
              val viols =
                if (f.required && !isNullTolerant(f.spec))
                  when(col0.isNull,
                    collect(Seq(oneS(floc, T.missing, "Field required",
                      lit(null))))).otherwise(c.violations)
                else c.violations
              val value =
                if (f.required && !isNullTolerant(f.spec))
                  when(col0.isNotNull, c.value)
                else c.value
              (f.name, value, viols, c.dataType)
          }
        }
      // extra=forbid: columns present in the input but not in the spec —
      // reference `model_fields.rs:67` extra behavior
      val extraChecks: Seq[Column] = m.extra match {
        case Extra.Forbid =>
          val known = m.fields.flatMap(f => f.name +: f.aliases).toSet
          st.fieldNames.filterNot(known.contains).toSeq.map { ex =>
            when(input.getField(ex).isNotNull,
              oneS(concat(loc, array(lit(ex))), T.extraForbidden,
                "Extra inputs are not permitted", input.getField(ex)))
          }
        case Extra.Ignore => Nil
      }
      val fieldViols = merge(fieldResults.map(_._3) :+ collect(extraChecks))
      val value = struct(fieldResults.map { case (n, v, _, _) => v.as(n) }: _*)
      // model-level (cross-field) checks — @model_validator(mode='after')
      // (functional_validators.py:651-679): the predicate sees the COERCED
      // struct; errors land at the MODEL loc (pydantic reports loc=() for
      // a root model) as value_error with the raw input as JSON. Gated on
      // clean field validation, like the reference: after-model validators
      // are not called when field errors exist.
      val modelViols =
        if (m.modelChecks.isEmpty) fieldViols
        else {
          val checks = m.modelChecks.map { ck =>
            when(size(fieldViols) === 0 &&
                !coalesce(ck.pred(value), lit(false)),
              oneS(loc, T.valueError, s"Value error, ${ck.msg}",
                to_json(input), Map("error" -> ck.msg)))
          }
          merge(Seq(fieldViols, collect(checks)))
        }
      Compiled(value, modelViols,
        StructType(fieldResults.map { case (n, _, _, dt) => StructField(n, dt) }))
    case _ =>
      typeViolation(loc, "model_type", s"Input should be a valid dictionary or instance of ${m.name}",
        input, t)
  }

  private def hasDefault(s: Spec): Boolean = s match {
    case _: WithDefaultSpec => true
    case NullableSpec(inner) => hasDefault(inner)
    case _ => false
  }

  /** Does this spec swallow errors with on_error=omit anywhere a list
   * element would hit it (directly, or nested under Nullable/Chain)? */
  private def omitsOnError(s: Spec): Boolean = s match {
    case WithDefaultSpec(_, _, OnError.Omit, _) => true
    case NullableSpec(inner) => omitsOnError(inner)
    case ChainSpec(steps) => steps.exists(omitsOnError)
    case _ => false
  }

  /** The same spec with every on_error=omit turned into raise — the
   * error-visibility probe compileList uses to decide WHICH elements the
   * omit actually swallowed (value nullness is not that signal: a
   * legitimately-valid null element must survive the omit filter). */
  private def withRaiseOnError(s: Spec): Spec = s match {
    case WithDefaultSpec(inner, d, OnError.Omit, vd) =>
      WithDefaultSpec(inner, d, OnError.Raise, vd)
    case NullableSpec(inner) => NullableSpec(withRaiseOnError(inner))
    case ChainSpec(steps) => ChainSpec(steps.map(withRaiseOnError))
    case other => other
  }

  private def isNullTolerant(s: Spec): Boolean = s match {
    case _: NullableSpec | _: WithDefaultSpec | NoneSpec | AnySpec => true
    case ChainSpec(steps) => steps.headOption.exists(isNullTolerant)
    case UnionSpec(cs, _) => cs.exists(isNullTolerant)
    case _ => false
  }
}
