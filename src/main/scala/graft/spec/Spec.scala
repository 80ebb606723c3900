package graft.spec

/**
 * Declarative constraint-spec ADT — the engine's IR.
 *
 * Mirrors the reference's CoreSchema tree (pydantic: built by
 * `pydantic/_internal/_generate_schema.py:773-810`, consumed by
 * `pydantic-core/src/validators/mod.rs:523-668`, 47 schema kinds) but is a
 * Scala sealed trait designed to compile to Catalyst `Column` expressions,
 * not an interpreter tree.
 *
 * Pure data: no Spark dependency in this file. Compilation lives in
 * [[graft.compile.Compiler]].
 */
sealed trait Spec extends Serializable

/** Open extension point under the sealed ADT: function/custom-validator
 * specs carry Spark `Column` builders and live in FunctionSpecs.scala
 * (this file stays pure data). */
trait ExtensionSpec extends Spec

/** Validation mode — reference: strict vs lax
 * (`pydantic-core/src/validators/validation_state.rs`, `Strict` metadata
 * `pydantic/types.py:123`). Strict = type must already match; Lax = apply
 * the coercion tables of `pydantic-core/src/input/shared.rs`. */
sealed trait Mode extends Serializable
object Mode {
  case object Strict extends Mode
  case object Lax extends Mode
}

// ---------------------------------------------------------------------------
// Scalar specs
// ---------------------------------------------------------------------------

/** String schema + constrained-str — reference `validators/string.rs:42,110-185`.
 * Transform order mirrors the reference: strip -> ascii check -> length ->
 * pattern (unanchored search, `string.rs:332-339`) -> lower/upper. */
final case class StrSpec(
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    pattern: Option[String] = None,
    stripWhitespace: Boolean = false,
    toLower: Boolean = false,
    toUpper: Boolean = false,
    asciiOnly: Boolean = false,
    coerceNumbersToStr: Boolean = false,
    strict: Option[Boolean] = None
) extends Spec

/** Int schema — reference `validators/int.rs:44,98-187`. Lax coercions:
 * str->int with underscore cleanup (`input/shared.rs:77-99`), float->int only
 * if integral (`shared.rs:202-212`), bool->int. */
final case class IntSpec(
    gt: Option[Long] = None,
    ge: Option[Long] = None,
    lt: Option[Long] = None,
    le: Option[Long] = None,
    multipleOf: Option[Long] = None,
    strict: Option[Boolean] = None
) extends Spec

/** Float schema — reference `validators/float.rs:30-97`. `allowInfNan`
 * defaults true like the reference (`float.rs:36,76-77`). */
final case class FloatSpec(
    gt: Option[Double] = None,
    ge: Option[Double] = None,
    lt: Option[Double] = None,
    le: Option[Double] = None,
    multipleOf: Option[Double] = None,
    allowInfNan: Boolean = true,
    strict: Option[Boolean] = None
) extends Spec

/** Bool schema — reference `validators/bool.rs`; lax string tokens from
 * `input/shared.rs:25-45` and int 0/1 from `:47-55`. */
final case class BoolSpec(strict: Option[Boolean] = None) extends Spec

/** Decimal schema — reference `validators/decimal.rs` (digit counting
 * `decimal.rs:105-136`). */
final case class DecimalSpec(
    precision: Int = 38,
    scale: Int = 18,
    gt: Option[BigDecimal] = None,
    ge: Option[BigDecimal] = None,
    lt: Option[BigDecimal] = None,
    le: Option[BigDecimal] = None,
    multipleOf: Option[BigDecimal] = None,
    maxDigits: Option[Int] = None,
    decimalPlaces: Option[Int] = None,
    strict: Option[Boolean] = None
) extends Spec

/** Date schema — reference `validators/date.rs`. Bounds are ISO strings so
 * the spec stays a pure value. `now` constraints: past/future
 * (`errors/types.rs:343-350`). */
final case class DateSpec(
    gt: Option[String] = None,
    ge: Option[String] = None,
    lt: Option[String] = None,
    le: Option[String] = None,
    nowOp: Option[NowOp] = None,
    strict: Option[Boolean] = None
) extends Spec

/** Datetime schema — reference `validators/datetime.rs:44-138`. Lax accepts
 * epoch int/float and ISO strings. `tz` mirrors tz_constraint
 * (`datetime.rs:30-42`, errors `types.rs:368-374`): on string inputs the
 * offset suffix decides aware/naive; TimestampType input counts as aware
 * UTC (Spark normalizes instants), TimestampNTZ as naive.
 * `microsecondsPrecision` mirrors speedate's overflow behavior: Truncate
 * (default) keeps the first 6 fraction digits, Error rejects longer
 * fractions (`datetime.rs:26,219`). */
final case class DatetimeSpec(
    gt: Option[String] = None,
    ge: Option[String] = None,
    lt: Option[String] = None,
    le: Option[String] = None,
    nowOp: Option[NowOp] = None,
    strict: Option[Boolean] = None,
    tz: Option[TzConstraint] = None,
    microsecondsPrecision: MicrosecondsPrecision = MicrosecondsPrecision.Truncate
) extends Spec

/** tz_constraint — reference `validators/datetime.rs:30-42`. */
sealed trait TzConstraint extends Serializable
object TzConstraint {
  case object Aware extends TzConstraint
  case object Naive extends TzConstraint
  /** exact UTC offset in seconds (tz_constraint=<int>) */
  final case class Offset(seconds: Int) extends TzConstraint
}

sealed trait MicrosecondsPrecision extends Serializable
object MicrosecondsPrecision {
  case object Truncate extends MicrosecondsPrecision
  case object Error extends MicrosecondsPrecision
}

/** Time-of-day schema — reference `validators/time.rs`. Values and bounds
 * are "HH:MM:SS[.ffffff]" strings; compiled value is seconds-of-day
 * (DoubleType — Spark has no bare time type; documented mapping). */
final case class TimeSpec(
    gt: Option[String] = None,
    ge: Option[String] = None,
    lt: Option[String] = None,
    le: Option[String] = None,
    strict: Option[Boolean] = None
) extends Spec

/** Timedelta schema — reference `validators/timedelta.rs` (speedate:
 * ISO-8601 durations and "[-]HH:MM:SS[.ffffff]"). Compiled value is total
 * seconds (DoubleType; `DayTimeIntervalType` loses sub-ranges). Bounds in
 * seconds. */
final case class TimedeltaSpec(
    gt: Option[Double] = None,
    ge: Option[Double] = None,
    lt: Option[Double] = None,
    le: Option[Double] = None,
    strict: Option[Boolean] = None
) extends Spec

sealed trait NowOp extends Serializable
object NowOp {
  /** value must be strictly before now — error `date_past`/`datetime_past` */
  case object Past extends NowOp
  /** value must be strictly after now — error `date_future`/`datetime_future` */
  case object Future extends NowOp
}

/** Bytes schema — reference `validators/bytes.rs`; lengths are byte counts.
 * `mode` mirrors config `val_json_bytes` (`validators/config.rs`
 * ValBytesMode): how a STRING input coerces to bytes — utf8 (raw bytes),
 * base64, or hex; a malformed encoded string is `bytes_invalid_encoding`
 * carrying the Rust base64-/hex-crate Display string as `encoding_error`
 * (offset-precise, two-alphabet base64 fallback — see
 * [[graft.functions.BytesDecode]]). */
final case class BytesSpec(
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    strict: Option[Boolean] = None,
    mode: BytesEncoding = BytesEncoding.Utf8
) extends Spec

sealed trait BytesEncoding extends Serializable
object BytesEncoding {
  case object Utf8 extends BytesEncoding
  case object Base64 extends BytesEncoding
  case object Hex extends BytesEncoding
}

/** UUID schema — reference `validators/uuid.rs:73-156`; optional version
 * equality check (`uuid.rs:69,103`). */
final case class UuidSpec(version: Option[Int] = None, strict: Option[Boolean] = None)
    extends Spec

/** URL schema — reference `validators/url.rs` (839 LoC); constraint surface
 * from `pydantic/_internal/_known_annotated_metadata.py:59-66`.
 * `multiHost` mirrors MultiHostUrl (`url.rs` multi-host half /
 * `pydantic/networks.py:731-999` DSNs): the authority may be a
 * comma-separated host list (postgres://h1:5432,h2:5432/db), each host
 * validated. `defaultHost/Port/Path` mirror the DSN default-filling
 * (`networks.py` UrlConstraints): applied to the COERCED value when the
 * respective part is absent (single-host URLs only). */
final case class UrlSpec(
    allowedSchemes: Seq[String] = Nil,
    hostRequired: Boolean = false,
    maxLength: Option[Int] = None,
    strict: Option[Boolean] = None,
    multiHost: Boolean = false,
    defaultHost: Option[String] = None,
    defaultPort: Option[Int] = None,
    defaultPath: Option[String] = None
) extends Spec

/** IP types — pydantic `IPvAnyAddress` / `IPvAnyInterface` /
 * `IPvAnyNetwork` (`pydantic/networks.py:1159-1302`): try IPv4, then
 * IPv6, serialize via CPython `ipaddress.__str__` (RFC-5952 canonical
 * form; [[graft.functions.IpCanon]] transcribes the stdlib grammar).
 * `kind`: "address" | "interface" | "network"; network is strict
 * (host bits must be zero). Invalid input raises the PydanticCustomError
 * types `ip_any_address` / `ip_any_interface` / `ip_any_network`. */
final case class IpSpec(kind: String = "address") extends Spec

/** Literal membership — reference `validators/literal.rs:28-100` (per-type
 * hash-map lookup; Catalyst `isin` compiles to the same InSet). */
final case class LiteralSpec(values: Seq[String]) extends Spec

/** Enum membership — reference `validators/enum_.rs`. Distinct from Literal
 * only in error type string (`enum` vs `literal_error`). */
final case class EnumSpec(values: Seq[String]) extends Spec

/** None/null schema — reference `validators/none.rs`. */
case object NoneSpec extends Spec

/** Any — always passes (`validators/any.rs`). */
case object AnySpec extends Spec

/** Exact rationals — reference `validators/fraction.rs` (delegates to
 * Python's `fractions.Fraction`; ValueError/ZeroDivision/Overflow ->
 * `fraction_parsing`, TypeError -> `fraction_type`,
 * `fraction.rs:146-175`). Columnar output: `struct<num:long, den:long>`
 * in lowest terms, sign on the numerator, den > 0. Inputs: integers,
 * floats (the EXACT binary ratio, `Fraction(0.1)` =
 * 3602879701896397/36028797018963968), the Fraction string grammar
 * (`'3/4'`, `'1.5'`, `'2e-3'`, underscores), and `struct<num,den>` (the
 * Fraction-object analog). Bounds are rational strings (`"3/4"`,
 * `"2"`); violations use the ordered-check types with the bound
 * rendered like `str(Fraction)`. Engine deviation (documented):
 * rationals are Long-bounded — values whose reduced terms exceed 2^62
 * raise `fraction_parsing` instead of going bignum. */
final case class FractionSpec(
    gt: Option[String] = None,
    ge: Option[String] = None,
    lt: Option[String] = None,
    le: Option[String] = None,
    strict: Option[Boolean] = None
) extends Spec

/** Complex numbers — reference `validators/complex.rs` (string inputs
 * delegate to Python's `complex()` literal grammar, `:66-93`). Columnar
 * output: `struct<re:double, im:double>`. Numeric inputs become
 * `(x, 0)`; a `struct<re,im>` input is the python-complex-object analog;
 * strings parse the full literal grammar (underscores, exponents,
 * inf/infinity/nan, one optional paren pair). Failed string parse emits
 * `complex_str_parsing` (the JSON-mode type — engine columns are typed
 * data, documented choice); unsupported input types emit
 * `complex_type`. */
case object ComplexSpec extends Spec

// ---------------------------------------------------------------------------
// Combinators
// ---------------------------------------------------------------------------

/** Nullable wrapper — reference `validators/nullable.rs`: null passes,
 * otherwise inner spec applies. */
final case class NullableSpec(inner: Spec) extends Spec

/** Default handling — reference `validators/with_default.rs:83-143`.
 * `onError` mirrors `on_error: raise | omit | default` (`:110-122,168-171`).
 * `validateDefault` mirrors `validate_default` (`:143,204`): when true the
 * injected default runs through the inner spec — coerced like any input,
 * with violations at the field loc when it fails (pydantic raises at
 * first use of a bad default; un-flagged defaults inject UN-validated).
 * The engine's defaults are string literals, so they validate in lax
 * mode regardless of the field's dialect. */
final case class WithDefaultSpec(
    inner: Spec,
    default: String,
    onError: OnError = OnError.Raise,
    validateDefault: Boolean = false
) extends Spec

sealed trait OnError extends Serializable
object OnError {
  case object Raise extends OnError
  case object UseDefault extends OnError
  /** swallow the error and OMIT the value — `with_default.rs:110-122`
   * on_error=omit. Columnar mapping: the value becomes null with no
   * violation; a ListSpec whose item omits drops those nulls from the
   * coerced array (pydantic's "validating lists, dropping bad items"). */
  case object Omit extends OnError
}

/** Sequential pipeline — reference `validators/chain.rs`. Each step's output
 * value feeds the next; violations accumulate. */
final case class ChainSpec(steps: Seq[Spec]) extends Spec

/** Union — reference `validators/union.rs:102-210`. `LeftToRight` = first
 * success wins (exactly `coalesce` over try-branches). `Smart` replays the
 * exactness scoring (`union.rs:139-157`) as a three-tier coalesce:
 * EXACT (strict success, branch type == input column type) > STRICT
 * (cross-type strict, e.g. int->float) > LAX — golden-fixtured against
 * TypeAdapter smart unions in SmartUnionSpec. */
final case class UnionSpec(choices: Seq[Spec], mode: UnionMode = UnionMode.Smart)
    extends Spec

sealed trait UnionMode extends Serializable
object UnionMode {
  case object Smart extends UnionMode
  case object LeftToRight extends UnionMode
}

/** Tagged union — reference `union.rs:292-352`: discriminator field value
 * dispatches to a branch in O(1); we compile to CASE WHEN which Catalyst
 * executes the same way. Unknown tag -> `union_tag_invalid`. */
final case class TaggedUnionSpec(
    discriminator: String,
    /** per-tag spec — usually a ModelSpec, but any Spec (e.g. a nested
     * TaggedUnionSpec for two-level discriminators like the reference
     * north-star's Website -> SocialProfile). Ordered: `expected_tags`
     * renders in declaration order like the reference's choices dict
     * (`union.rs:316-331` builds tags_repr by insertion order). */
    choices: Seq[(String, Spec)]
) extends Spec

/** Override the error emitted by the inner spec — reference
 * `validators/custom_error.rs`. */
final case class CustomErrorSpec(inner: Spec, errorType: String, message: String)
    extends Spec

/** JSON-string schema — reference `validators/json.rs:24`: parse the string
 * as JSON, then validate the parsed value against `inner`.
 * `innerDdl` is the Spark DDL of the expected parsed shape.
 * `allowPartial` mirrors pydantic-core's `allow_partial`
 * (`validators/mod.rs:183-304` / jiter partial modes): `Some("on")`
 * recovers a truncated-JSON prefix before parsing (incomplete trailing
 * value dropped, containers closed), `Some("trailing-strings")`
 * additionally keeps a truncated trailing string value. */
final case class JsonSpec(innerDdl: String, inner: Option[ModelSpec] = None,
                          allowPartial: Option[String] = None)
    extends Spec

// ---------------------------------------------------------------------------
// Collections
// ---------------------------------------------------------------------------

/** List schema — reference `validators/list.rs:100-150`; min/max length and
 * per-element inner validation. */
final case class ListSpec(
    item: Spec = AnySpec,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    /** stop at the first element violation — reference `list.rs:21,113`;
     * columnar analog: the bundle keeps only the first element's
     * violations (evaluation itself is vectorized either way). */
    failFast: Boolean = false
) extends Spec

/** Tuple schema — reference `validators/tuple.rs` (positional heterogeneous
 * items + variadic tail). `items` validate positions 0..n-1; a missing
 * position is `missing` (unless the item spec carries a default,
 * `tuple.rs:90-95`); positions beyond the head validate against `variadic`
 * when set (tuple[X, ...]) and are `too_long` otherwise (`tuple.rs:232`).
 * `suffix` validators run AFTER the variadic item
 * (tuple[int, *tuple[str, ...], int, bool] — reference
 * `tuple.rs:122-210`): the last `suffix.size` input elements bind to the
 * suffix positionally and the variadic consumes `len - items.size -
 * suffix.size` middle elements (may be zero). Error locs mirror the
 * reference's tail-buffer counting iterator exactly: head and variadic
 * errors carry the true input index (`tuple.rs:163-166` — the buffer's
 * S-item lag cancels the counter's S-item deficit), while suffix errors
 * carry `P + j` when the variadic matched zero elements and `P + m - 1 +
 * j` when it matched m >= 1 (the loop leaves `index` at the LAST entered
 * buffer index, `tuple.rs:170-206`). A missing suffix position is
 * `missing` at `P + j` (only reachable with m == 0) unless its spec
 * carries a default. `suffix` requires `variadic` (pydantic's
 * variadic_item_index always points inside items_schema). Input may be an
 * array (homogeneous Spark type, per-position specs coerce) or a struct
 * (fields in declaration order). */
final case class TupleSpec(
    items: Seq[Spec],
    variadic: Option[Spec] = None,
    suffix: Seq[Spec] = Nil,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    /** keep only the first violation — reference `tuple.rs` fail_fast */
    failFast: Boolean = false
) extends Spec

/** Reference to a named definition — reference `definition-ref`
 * (`validators/definitions.rs`). Only meaningful inside a
 * [[DefinitionsSpec]], which substitutes it at compile time. */
final case class RefSpec(name: String) extends Spec

/** Recursive-schema container — reference `definitions` schema
 * (`validators/definitions.rs:134`). The reference resolves refs lazily at
 * runtime and raises `recursion_loop` on cyclic DATA; a columnar engine's
 * input types have finite static depth, so refs are UNROLLED at compile
 * time instead: each [[RefSpec]] expansion spends one unit of `maxUnroll`,
 * and refs beyond the budget compile to [[AnySpec]] (data deeper than the
 * unrolled schema passes unvalidated — the documented deviation; there is
 * no runtime recursion over a fixed-depth column). Unroll depth only needs
 * to cover the INPUT column's nesting depth. */
final case class DefinitionsSpec(
    defs: Map[String, Spec],
    root: Spec,
    maxUnroll: Int = 8
) extends Spec

/** NamedTuple schema — reference `validators/named_tuple.rs` (385 LoC).
 * Array input binds positionally (index locs; extra items -> ONE
 * `too_long` with `actual_length`, `named_tuple.rs:367-377`); struct
 * input binds by field name (name locs; extra keys are ALWAYS
 * `extra_forbidden`, `named_tuple.rs:296-305` "Named tuples cannot hold
 * extra fields"). Output is a struct of the REAL field names (vs
 * [[TupleSpec]]'s positional `_0.._n`). */
final case class NamedTupleSpec(
    name: String,
    fields: Seq[FieldSpec]
) extends Spec

/** Dataclass schema — reference `validators/dataclass.rs` (680 LoC,
 * `dataclass-args` keyword path). Field binding, defaults, aliases and
 * extra behavior are the model-fields engine verbatim (the reference
 * shares `LookupKey`/error machinery); only the wrong-input error type
 * differs (`dataclass_type`, `errors/types.rs:194,510`). The positional
 * `ArgsKwargs` call-binding half is a Python function-call concern with
 * no table analog (documented with §2.1 row 39). */
final case class DataclassSpec(
    name: String,
    fields: Seq[FieldSpec],
    extra: Extra = Extra.Ignore
) extends Spec

/** Set semantics = unique list — reference `validators/set.rs` and the
 * registry comment "sets - unique lists" (`validators/mod.rs:600-601`). */
final case class SetSpec(
    item: Spec = AnySpec,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None
) extends Spec

/** Dict schema — reference `validators/dict.rs`. */
final case class DictSpec(
    key: Spec = AnySpec,
    value: Spec = AnySpec,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None
) extends Spec

// ---------------------------------------------------------------------------
// Model (the row operator)
// ---------------------------------------------------------------------------

/** Per-field spec — reference `pydantic/fields.py:55-102` (FieldInfo). */
final case class FieldSpec(
    name: String,
    spec: Spec,
    required: Boolean = true,
    /** validation aliases, tried in order — reference `pydantic/aliases.py`
     * AliasChoices; LookupTree `model_fields.rs:108`. */
    aliases: Seq[String] = Nil,
    /** nested-path aliases — AliasPath('data', 0, 'name') ==
     * Seq("data", "0", "name"); tried after flat aliases. */
    aliasPaths: Seq[Seq[String]] = Nil
) extends Serializable

/** Extra-field behavior — reference `model_fields.rs:67`. */
sealed trait Extra extends Serializable
object Extra {
  case object Ignore extends Extra
  case object Forbid extends Extra
}

/** The row operator: named record of fields, error accumulation across all
 * fields — reference `validators/model_fields.rs:53-191,300+`
 * (`Vec<ValLineError>` accumulation at `:313`, outer-loc push `:211-216`). */
final case class ModelSpec(
    name: String,
    fields: Seq[FieldSpec],
    extra: Extra = Extra.Ignore,
    mode: Mode = Mode.Lax,
    modelChecks: Seq[ModelCheck] = Nil
) extends Spec {
  def field(n: String): FieldSpec = fields.find(_.name == n).get
}
