package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Violation-row vocabulary.
 *
 * Mirrors the reference's rendered error dicts `{type, loc, msg, input, ctx}`
 * (pydantic-core/src/errors/validation_exception.rs:507-520; ValLineError
 * `errors/line_error.rs:104-109`). `type` strings are taken verbatim from the
 * reference taxonomy (`pydantic-core/src/errors/types.rs:163-452`) so golden
 * fixtures transcribed from the reference tests compare exactly.
 *
 * A violation bundle is always `array<struct<loc,type,msg,input,ctx>>` —
 * empty array means "valid", mirroring `ValidationError.errors() == []`.
 */
object Violations {

  val structType: StructType = StructType(Seq(
    StructField("loc", ArrayType(StringType, containsNull = false)),
    StructField("type", StringType),
    StructField("msg", StringType),
    StructField("input", StringType),
    StructField("ctx", MapType(StringType, StringType))
  ))
  val arrayType: ArrayType = ArrayType(structType, containsNull = false)

  /** Empty (valid) bundle, correctly typed. */
  def empty: Column = array().cast(arrayType)

  private val emptyCtx: Column = typedLit(Map.empty[String, String])

  /** One violation struct. `input` is stringified (like the reference's
   * `input_value` repr). */
  def one(loc: Column, errType: String, msg: Column, input: Column,
          ctx: Column = emptyCtx): Column =
    struct(
      loc.as("loc"),
      lit(errType).as("type"),
      msg.as("msg"),
      input.cast(StringType).as("input"),
      ctx.as("ctx"))

  def oneS(loc: Column, errType: String, msg: String, input: Column,
           ctx: Map[String, String] = Map.empty): Column =
    one(loc, errType, lit(msg), input,
      if (ctx.isEmpty) emptyCtx else typedLit(ctx))

  /** Collect maybe-violations (null = check passed) into a bundle.
   *
   * Shape matters for performance: `filter(array(...), isNotNull)` reads
   * naturally but ArrayFilter is a higher-order function — CodegenFallback,
   * so it would eject the ENTIRE validation projection from whole-stage
   * codegen (measured: the verdict plan lost its codegen id). Instead each
   * check contributes a 0/1-element array and Concat (which has array
   * codegen) merges them; the violation struct is still built only behind
   * the check's `when` (cold error path, cf. `#[cold]` in
   * `validators/mod.rs:670-683`). */
  def collect(checks: Seq[Column]): Column =
    if (checks.isEmpty) empty
    else concat(checks.map(c => when(c.isNotNull, array(c)).otherwise(empty)): _*)

  /** Concatenate bundles (all non-null by construction). */
  def merge(bundles: Seq[Column]): Column = bundles match {
    case Seq() => empty
    case Seq(b) => b
    case bs => concat(bs: _*)
  }

  /** Docs-URL prefix — reference `validation_exception.rs:237-244`:
   * `https://errors.pydantic.dev/{major.minor}/v/`, version from the
   * grafted reference (pydantic 2.14.0b1 -> "2.14"). */
  val UrlPrefix = "https://errors.pydantic.dev/2.14/v/"

  /** Render-time completion of the `errors()` dict shape
   * `{type, loc, msg, input, ctx, url}`: the reference's `ValLineError`
   * carries no url either — `PyLineError` appends the prefix when
   * `errors(include_url=True)` renders (`validation_exception.rs:246`).
   * Same here: the stored bundle stays 5-field; call this when emitting
   * user-facing error rows. (transform is a HOF — interpreted — but this
   * is the cold render path, not the validation hot path.) */
  def withUrl(bundle: Column): Column =
    transform(bundle, v => struct(
      v.getField("loc").as("loc"),
      v.getField("type").as("type"),
      v.getField("msg").as("msg"),
      v.getField("input").as("input"),
      v.getField("ctx").as("ctx"),
      concat(lit(UrlPrefix), v.getField("type")).as("url")))

  /** Push an outer location segment onto every violation in a bundle —
   * reference: outer-loc pushing in `model_fields.rs:211-216`,
   * `line_error.rs:86-97`. */
  def pushLoc(bundle: Column, outer: Column): Column =
    transform(bundle, v => struct(
      concat(array(outer), v.getField("loc")).as("loc"),
      v.getField("type").as("type"),
      v.getField("msg").as("msg"),
      v.getField("input").as("input"),
      v.getField("ctx").as("ctx")))

  // Error `type` strings — verbatim from pydantic-core/src/errors/types.rs.
  object T {
    val missing = "missing"
    val extraForbidden = "extra_forbidden"
    val stringType = "string_type"
    val stringTooShort = "string_too_short"
    val stringTooLong = "string_too_long"
    val stringPatternMismatch = "string_pattern_mismatch"
    val stringUnicode = "string_unicode"
    val stringNotAscii = "string_not_ascii"
    val intType = "int_type"
    val intParsing = "int_parsing"
    val intFromFloat = "int_from_float"
    val floatType = "float_type"
    val floatParsing = "float_parsing"
    val boolType = "bool_type"
    val boolParsing = "bool_parsing"
    val bytesType = "bytes_type"
    val bytesTooShort = "bytes_too_short"
    val bytesTooLong = "bytes_too_long"
    val greaterThan = "greater_than"
    val greaterThanEqual = "greater_than_equal"
    val lessThan = "less_than"
    val lessThanEqual = "less_than_equal"
    val multipleOf = "multiple_of"
    val finiteNumber = "finite_number"
    val tooShort = "too_short"
    val tooLong = "too_long"
    val literalError = "literal_error"
    val enumError = "enum"
    val dateType = "date_type"
    val dateParsing = "date_parsing"
    val dateFromDatetimeInexact = "date_from_datetime_inexact"
    val datePast = "date_past"
    val dateFuture = "date_future"
    val datetimeType = "datetime_type"
    val datetimeParsing = "datetime_parsing"
    val datetimePast = "datetime_past"
    val datetimeFuture = "datetime_future"
    val timeType = "time_type"
    val timeParsing = "time_parsing"
    val timeDeltaType = "time_delta_type"
    val timeDeltaParsing = "time_delta_parsing"
    val uuidParsing = "uuid_parsing"
    val uuidVersion = "uuid_version"
    val urlParsing = "url_parsing"
    val urlScheme = "url_scheme"
    val urlTooLong = "url_too_long"
    val jsonInvalid = "json_invalid"
    val jsonType = "json_type"
    val noneRequired = "none_required"
    val unionTagInvalid = "union_tag_invalid"
    val unionTagNotFound = "union_tag_not_found"
    val decimalParsing = "decimal_parsing"
    val decimalType = "decimal_type"
    val decimalMaxDigits = "decimal_max_digits"
    val decimalMaxPlaces = "decimal_max_places"
    val valueError = "value_error"
    // PydanticCustomError types raised by the IPvAny* classes
    // (pydantic/networks.py:1211,1252,1291)
    val ipAnyAddress = "ip_any_address"
    val ipAnyInterface = "ip_any_interface"
    val ipAnyNetwork = "ip_any_network"
    // engine-level (table checks; no reference analog, SURVEY §2.3)
    val uniqueViolation = "unique_violation"
    val refIntegrity = "referential_integrity"
    val driftExceeded = "distribution_drift"
  }
}
