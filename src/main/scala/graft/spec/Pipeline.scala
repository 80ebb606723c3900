package graft.spec

/**
 * Fluent constraint-pipeline DSL — the Scala mirror of pydantic's
 * experimental pipeline API (`pydantic/experimental/pipeline.py:129-375`:
 * `validate_as/constrain/gt/lt/ge/le/len/multiple_of/str_lower/str_upper/
 * str_strip/str_pattern/then(&)/otherwise(|)`), which is the reference's
 * closest analog to our declarative spec language.
 *
 * Builds [[Spec]] values; nothing here touches Spark — compilation stays in
 * graft.compile.Compiler.
 *
 * {{{
 * import graft.spec.Pipeline._
 * val spec = validateAsStr.strip.minLen(1).pattern("^[a-z]+$").toLowerCase
 * val num  = validateAsInt.gt(0).le(100).multipleOf(5)
 * val alt  = num | validateAsStr.pattern("^n/a$")        // otherwise
 * val chained = validateAsStr.strip & validateAsInt.ge(0) // then
 * }}}
 */
object Pipeline {

  sealed trait Pipe extends Serializable {
    def spec: Spec
    /** `then` — sequential composition (`pipeline.py` `__and__`). */
    def &(next: Pipe): Pipe = Raw(ChainSpec(Seq(spec, next.spec)))
    /** `otherwise` — fallback union (`pipeline.py` `__or__`). */
    def |(alt: Pipe): Pipe =
      Raw(UnionSpec(Seq(spec, alt.spec), UnionMode.LeftToRight))
    def nullable: Pipe = Raw(NullableSpec(spec))
    def default(d: String): Pipe = Raw(WithDefaultSpec(spec, d))
    def customError(errType: String, msg: String): Pipe =
      Raw(CustomErrorSpec(spec, errType, msg))

    // ---- function-validator surface (`pipeline.py:129,237,271-279`)

    /** Transform the validated value (`pipeline.py:129` / AfterValidator). */
    def transform(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Pipe =
      Raw(FunctionAfterSpec(spec, fn))
    /** Named predicate over the validated value (`pipeline.py:237`);
     * failure -> `predicate_failed` "Predicate '{name}' failed". */
    def predicate(name: String)(
        fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Pipe =
      Raw(ChainSpec(Seq(spec, PredicateSpec(fn, name))))
    /** Unnamed check (`pipeline.py:405` _check_func);
     * failure -> `value_error` "Value error, Expected {desc}". */
    def check(desc: String)(
        fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Pipe =
      Raw(ChainSpec(Seq(spec, CheckSpec(fn, desc))))
    /** `eq` (`pipeline.py:271`) — named eqTo: Scala reserves `eq`. */
    def eqTo(v: Any): Pipe =
      check(s"== $v")(c => c === org.apache.spark.sql.functions.lit(v))
    /** `not_eq` (`pipeline.py:274`). */
    def notEqTo(v: Any): Pipe =
      check(s"!= $v")(c => c =!= org.apache.spark.sql.functions.lit(v))
    /** `in_` (`pipeline.py:277`). */
    def in_(vs: Any*): Pipe =
      check(s"in ${vs.mkString("[", ", ", "]")}")(c => c.isin(vs: _*))
    /** `not_in` (`pipeline.py:279`). */
    def notIn(vs: Any*): Pipe =
      check(s"not in ${vs.mkString("[", ", ", "]")}")(c => !c.isin(vs: _*))
  }

  final case class Raw(spec: Spec) extends Pipe

  final case class StrPipe(s: StrSpec = StrSpec()) extends Pipe {
    def spec: Spec = s
    def minLen(n: Int): StrPipe = copy(s.copy(minLength = Some(n)))
    def maxLen(n: Int): StrPipe = copy(s.copy(maxLength = Some(n)))
    def len(lo: Int, hi: Int): StrPipe =
      copy(s.copy(minLength = Some(lo), maxLength = Some(hi)))
    def pattern(p: String): StrPipe = copy(s.copy(pattern = Some(p)))
    def strip: StrPipe = copy(s.copy(stripWhitespace = true))
    def toLowerCase: StrPipe = copy(s.copy(toLower = true))
    def toUpperCase: StrPipe = copy(s.copy(toUpper = true))
    def asciiOnly: StrPipe = copy(s.copy(asciiOnly = true))
    def strict: StrPipe = copy(s.copy(strict = Some(true)))
  }

  final case class IntPipe(s: IntSpec = IntSpec()) extends Pipe {
    def spec: Spec = s
    def gt(v: Long): IntPipe = copy(s.copy(gt = Some(v)))
    def ge(v: Long): IntPipe = copy(s.copy(ge = Some(v)))
    def lt(v: Long): IntPipe = copy(s.copy(lt = Some(v)))
    def le(v: Long): IntPipe = copy(s.copy(le = Some(v)))
    def multipleOf(v: Long): IntPipe = copy(s.copy(multipleOf = Some(v)))
    def positive: IntPipe = gt(0)
    def nonNegative: IntPipe = ge(0)
    def strict: IntPipe = copy(s.copy(strict = Some(true)))
  }

  final case class FloatPipe(s: FloatSpec = FloatSpec()) extends Pipe {
    def spec: Spec = s
    def gt(v: Double): FloatPipe = copy(s.copy(gt = Some(v)))
    def ge(v: Double): FloatPipe = copy(s.copy(ge = Some(v)))
    def lt(v: Double): FloatPipe = copy(s.copy(lt = Some(v)))
    def le(v: Double): FloatPipe = copy(s.copy(le = Some(v)))
    def multipleOf(v: Double): FloatPipe = copy(s.copy(multipleOf = Some(v)))
    def finite: FloatPipe = copy(s.copy(allowInfNan = false))
  }

  def validateAsStr: StrPipe = StrPipe()
  def validateAsInt: IntPipe = IntPipe()
  def validateAsFloat: FloatPipe = FloatPipe()
  def validateAsBool: Pipe = Raw(BoolSpec())
  def validateAsDate: Pipe = Raw(DateSpec())
  def validateAsDatetime: Pipe = Raw(DatetimeSpec())
  def validateAsUuid(version: Option[Int] = None): Pipe = Raw(UuidSpec(version))
  def in(values: String*): Pipe = Raw(EnumSpec(values))
  def literal(values: String*): Pipe = Raw(LiteralSpec(values))

  /** Field helper: `field("lang", in("en","de"))`. */
  def field(name: String, p: Pipe, required: Boolean = true,
            aliases: Seq[String] = Nil): FieldSpec =
    FieldSpec(name, p.spec, required, aliases)

  /** Model helper mirroring `BaseModel` class declaration. */
  def model(name: String, fields: FieldSpec*): ModelSpec =
    ModelSpec(name, fields)
}
