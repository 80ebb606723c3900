package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Lax coercion library — the must-replicate table of
 * `pydantic-core/src/input/shared.rs` (SURVEY §2.2), expressed as pure
 * `Column -> Column` functions so every rule stays inside whole-stage
 * codegen. These are deliberately NOT bare `cast`: Spark's string->bool cast,
 * for example, accepts "yes"/"no"… differently from the reference's token
 * table, and string->int cast does not strip underscores.
 */
object Coercions {

  /** `str_as_bool` tokens — `input/shared.rs:25-45`: 6 falsy + 6 truthy,
   * case-insensitive. */
  val falsyTokens: Seq[String] = Seq("0", "off", "f", "false", "n", "no")
  val truthyTokens: Seq[String] = Seq("1", "on", "t", "true", "y", "yes")

  /** str -> bool: token table; null when unparseable (caller raises
   * `bool_parsing`). */
  def strToBool(c: Column): Column = {
    val t = lower(trim(c))
    when(t.isin(falsyTokens: _*), lit(false))
      .when(t.isin(truthyTokens: _*), lit(true))
  }

  /** `clean_int_str` — `input/shared.rs:111+`: trim, strip underscores
   * (digit separators), allow a trailing ".000…" fractional part and an
   * exponent-free integer body. */
  private def cleanNumStr(c: Column): Column =
    regexp_replace(trim(c), "_", "")

  /** str -> long: cleaned try_cast; "42.000" accepted (fractional part all
   * zeros, `shared.rs` float fallback), "42.5" rejected -> null. */
  def strToLong(c: Column): Column = {
    val cleaned = cleanNumStr(c)
    val noFrac = regexp_replace(cleaned, "\\.0+$", "")
    try_cast(noFrac, LongType)
  }

  /** str -> double — `str_as_float` (`shared.rs:101-109`): trim +
   * underscores, then standard float grammar (inf/nan accepted — the
   * reference allows them unless allow_inf_nan=false). */
  def strToDouble(c: Column): Column =
    try_cast(cleanNumStr(c), DoubleType)

  /** float -> long only when integral and finite — `float_as_int`
   * (`shared.rs:202-212`); null when lossy (caller raises
   * `int_from_float`). */
  def doubleToLongExact(c: Column): Column =
    when(!isnan(c) && c =!= Double.PositiveInfinity &&
         c =!= Double.NegativeInfinity && c === floor(c) &&
         c >= Long.MinValue.toDouble && c <= Long.MaxValue.toDouble,
      c.cast(LongType))

  /** int -> bool: exactly 0/1 — `shared.rs:47-55`. */
  def longToBool(c: Column): Column =
    when(c === 0, lit(false)).when(c === 1, lit(true))

  /** str -> date: ISO-8601 (speedate `date.rs`); Spark's cast accepts the
   * same YYYY-MM-DD core grammar. */
  def strToDate(c: Column): Column = try_cast(trim(c), DateType)

  /** str -> timestamp: ISO-8601 (speedate `datetime.rs:338`). */
  def strToTimestamp(c: Column): Column = try_cast(trim(c), TimestampType)

  /** numeric epoch -> timestamp: seconds when |v| < 2e10 else milliseconds —
   * speedate's watershed heuristic (datetime.rs epoch interpretation). */
  def epochToTimestamp(c: Column): Column = {
    val d = c.cast(DoubleType)
    when(abs(d) < 2e10d, timestamp_seconds(d))
      .otherwise(timestamp_millis(d.cast(LongType)))
  }

  /** timestamp -> date only when the time-of-day is exactly midnight —
   * `DateFromDatetimeInexact` rule (`errors/types.rs:343`,
   * validators/date.rs lax path). Null when inexact. */
  def timestampToDateExact(c: Column): Column =
    when(c === date_trunc("DAY", c), c.cast(DateType))

  /** "HH:MM:SS[.ffffff]" -> seconds of day; null when malformed
   * (speedate time grammar, `validators/time.rs`). */
  def timeStrToSeconds(c: Column): Column = {
    val re = "^([01]?\\d|2[0-3]):([0-5]\\d):([0-5]\\d(?:\\.\\d{1,6})?)$"
    when(c.rlike(re),
      regexp_extract(c, re, 1).cast(DoubleType) * 3600 +
        regexp_extract(c, re, 2).cast(DoubleType) * 60 +
        regexp_extract(c, re, 3).cast(DoubleType))
  }

  /** Timedelta string -> total seconds; accepts ISO-8601 durations
   * ("[-]P1DT2H3M4.5S", "PT90S") and "[-]HH:MM:SS[.ffffff]"
   * (speedate `duration` grammar, `validators/timedelta.rs`). */
  def timedeltaStrToSeconds(c: Column): Column = {
    val iso = "^(-)?P(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d{1,6})?)S)?)?$"
    val hms = "^(-)?(\\d+):([0-5]\\d):([0-5]\\d(?:\\.\\d{1,6})?)$"
    // unmatched groups extract as "" -> try_cast nulls them -> 0.0
    def g(re: String, i: Int): Column =
      coalesce(regexp_extract(c, re, i).try_cast(DoubleType), lit(0.0))
    val isoSecs = g(iso, 2) * 86400 + g(iso, 3) * 3600 + g(iso, 4) * 60 + g(iso, 5)
    val isoSigned = when(regexp_extract(c, iso, 1) === "-", -isoSecs)
      .otherwise(isoSecs)
    val hmsSecs = g(hms, 2) * 3600 + g(hms, 3) * 60 + g(hms, 4)
    val hmsSigned = when(regexp_extract(c, hms, 1) === "-", -hmsSecs)
      .otherwise(hmsSecs)
    // "P" alone (no components) is not a valid duration
    when(c.rlike(iso) && c =!= "P" && c =!= "-P" && c =!= "PT" && c =!= "-PT",
      isoSigned)
      .when(c.rlike(hms), hmsSigned)
  }

  def try_cast(c: Column, to: DataType): Column = c.try_cast(to)
}
