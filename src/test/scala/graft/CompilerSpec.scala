package graft

import org.apache.spark.sql.types._

import graft.spec._

/**
 * Golden fixtures transcribed from the reference's validator tests —
 * string: pydantic-core/tests/validators/test_string.py,
 * int: test_int.py, bool: test_bool.py, float: test_float.py,
 * constrained types: tests/test_types.py. Each case asserts the exact
 * pydantic error `type` string (errors/types.rs).
 */
class CompilerSpec extends SparkTestBase {

  // ---------------------------------------------------------------- strings

  test("str: length + pattern violations (test_types.py:442-481 shape)") {
    val spec = StrSpec(minLength = Some(3), maxLength = Some(5),
      pattern = Some("^xxx[0-9]{3}$"))
    val out = types(spec, StringType,
      Seq("xxx123", null, "ab", "abcdef", "xxx12x"))
    // "xxx123" is 6 chars: too long; pattern ok
    assert(out(0) == Seq("string_too_long"))
    assert(out(1) == Seq())                       // null handled at field level
    assert(out(2).toSet == Set("string_too_short", "string_pattern_mismatch"))
    assert(out(3).toSet == Set("string_too_long", "string_pattern_mismatch"))
    // "xxx12x" = 6 chars: too long AND pattern mismatch
    assert(out(4).toSet == Set("string_too_long", "string_pattern_mismatch"))
  }

  test("str: pattern is unanchored search (string.rs:332-339)") {
    val spec = StrSpec(pattern = Some("ab"))
    assert(types(spec, StringType, Seq("xxabxx", "xx")) ==
      Seq(Seq(), Seq("string_pattern_mismatch")))
  }

  test("str: strip -> length order (string.rs:122-178)") {
    val spec = StrSpec(minLength = Some(3), stripWhitespace = true)
    // "  ab  " strips to "ab" (2 chars) -> too short
    assert(types(spec, StringType, Seq("  ab  ", " abc ")) ==
      Seq(Seq("string_too_short"), Seq()))
  }

  test("str: to_lower applied after checks; ascii check") {
    val spec = StrSpec(toLower = true, asciiOnly = true)
    val out = run(spec, StringType, Seq("ABC", "héllo"))
    assert(out(0) == (("abc", Seq())))
    assert(out(1)._2 == Seq("string_not_ascii"))
  }

  test("str strict: non-string input is string_type") {
    assert(types(StrSpec(strict = Some(true)), LongType, Seq(5L)) ==
      Seq(Seq("string_type")))
  }

  test("str lax: number coerces only with coerce_numbers_to_str (string.rs:23)") {
    assert(types(StrSpec(), LongType, Seq(5L)) == Seq(Seq("string_type")))
    assert(run(StrSpec(coerceNumbersToStr = true), LongType, Seq(5L)).head ==
      (("5", Seq())))
  }

  // ------------------------------------------------------------------- ints

  test("int lax: str->int with underscores + trailing .0 (shared.rs:77-99)") {
    val out = run(IntSpec(), StringType,
      Seq("42", " 42 ", "1_000", "42.0", "42.5", "abc"))
    assert(out(0) == ((42L, Seq())))
    assert(out(1) == ((42L, Seq())))
    assert(out(2) == ((1000L, Seq())))
    assert(out(3) == ((42L, Seq())))
    assert(out(4)._2 == Seq("int_parsing"))
    assert(out(5)._2 == Seq("int_parsing"))
  }

  test("int lax: float->int only when integral (shared.rs:202-212)") {
    val out = run(IntSpec(), DoubleType, Seq(42.0, 42.5, Double.NaN))
    assert(out(0) == ((42L, Seq())))
    assert(out(1)._2 == Seq("int_from_float"))
    assert(out(2)._2 == Seq("int_from_float"))
  }

  test("int strict: string rejected (int.rs strict)") {
    assert(types(IntSpec(), StringType, Seq("42"), Mode.Strict) ==
      Seq(Seq("int_type")))
  }

  test("int constraints: gt/ge/lt/le/multiple_of (int.rs:125-181)") {
    val spec = IntSpec(gt = Some(0), le = Some(100), multipleOf = Some(5))
    val out = types(spec, LongType, Seq(50L, 0L, 101L, 52L, -5L))
    assert(out(0) == Seq())
    assert(out(1) == Seq("greater_than"))
    assert(out(2).toSet == Set("less_than_equal", "multiple_of"))
    assert(out(3) == Seq("multiple_of"))
    assert(out(4) == Seq("greater_than"))
  }

  // ------------------------------------------------------------------ bools

  test("bool lax: the 6+6 token table (shared.rs:25-45)") {
    val spec = BoolSpec()
    val out = run(spec, StringType,
      Seq("true", "YES", "on", "1", "false", "No", "OFF", "0", "maybe"))
    assert(out.take(4).map(_._1) == Seq(true, true, true, true))
    assert(out.slice(4, 8).map(_._1) == Seq(false, false, false, false))
    assert(out(8)._2 == Seq("bool_parsing"))
  }

  test("bool lax: int 0/1 only (shared.rs:47-55)") {
    val out = run(BoolSpec(), LongType, Seq(0L, 1L, 2L))
    assert(out(0)._1 == false && out(1)._1 == true)
    assert(out(2)._2 == Seq("bool_parsing"))
  }

  test("bool strict: string rejected") {
    assert(types(BoolSpec(), StringType, Seq("true"), Mode.Strict) ==
      Seq(Seq("bool_type")))
  }

  // ----------------------------------------------------------------- floats

  test("float: parsing + finite check (float.rs:76-77)") {
    val out = run(FloatSpec(allowInfNan = false), StringType,
      Seq("1.5", "1_000.5", "nan", "abc"))
    assert(out(0) == ((1.5, Seq())))
    assert(out(1) == ((1000.5, Seq())))
    assert(out(2)._2 == Seq("finite_number"))
    assert(out(3)._2 == Seq("float_parsing"))
  }

  test("float: allow_inf_nan default true (float.rs:36)") {
    val out = types(FloatSpec(), DoubleType, Seq(Double.NaN))
    assert(out == Seq(Seq()))
  }

  // ---------------------------------------------------------- literal/enum

  test("literal membership (literal.rs:28-100)") {
    val out = types(LiteralSpec(Seq("a", "b")), StringType, Seq("a", "c"))
    assert(out == Seq(Seq(), Seq("literal_error")))
  }

  test("enum membership (enum_.rs)") {
    val out = types(EnumSpec(Seq("red", "green")), StringType, Seq("red", "blue"))
    assert(out == Seq(Seq(), Seq("enum")))
  }

  // ------------------------------------------------------------ combinators

  test("nullable: null passes, inner still checked (nullable.rs)") {
    val spec = NullableSpec(IntSpec(ge = Some(0)))
    val out = run(spec, LongType, Seq(null, 5L, -5L))
    assert(out(0) == ((null, Seq())))
    assert(out(1) == ((5L, Seq())))
    assert(out(2)._2 == Seq("greater_than_equal"))
  }

  test("with_default: null -> default; on_error=default swallows (with_default.rs:83-143)") {
    val spec = WithDefaultSpec(IntSpec(ge = Some(0)), "7")
    val out = run(spec, LongType, Seq(null, 3L))
    assert(out(0) == ((7L, Seq())))
    assert(out(1) == ((3L, Seq())))
    val spec2 = WithDefaultSpec(IntSpec(ge = Some(0)), "7", OnError.UseDefault)
    val out2 = run(spec2, LongType, Seq(-5L))
    assert(out2(0) == ((7L, Seq())))
  }

  test("chain: value threads through steps (chain.rs)") {
    val spec = ChainSpec(Seq(
      StrSpec(stripWhitespace = true, toLower = true),
      LiteralSpec(Seq("abc"))))
    val out = run(spec, StringType, Seq("  ABC ", "xyz"))
    assert(out(0) == (("abc", Seq())))
    assert(out(1)._2 == Seq("literal_error"))
  }

  test("custom_error overrides inner (custom_error.rs)") {
    val spec = CustomErrorSpec(IntSpec(ge = Some(0)), "not_a_nat", "must be natural")
    assert(types(spec, LongType, Seq(-1L)) == Seq(Seq("not_a_nat")))
  }

  // ----------------------------------------------------------------- unions

  test("union left_to_right: first success wins (union.rs:194-210)") {
    val spec = UnionSpec(Seq(IntSpec(), BoolSpec()), UnionMode.LeftToRight)
    val out = run(spec, StringType, Seq("42", "yes", "zzz"))
    assert(out(0)._1.toString == "42" && out(0)._2 == Seq())
    assert(out(1)._1.toString == "true" && out(1)._2 == Seq())
    assert(out(2)._2.nonEmpty)
  }

  test("union smart: strict branch preferred (union.rs:117-157 approximation)") {
    // int input, union[str, int]: smart keeps the int exact match even
    // though a lax str branch could coerce
    val spec = UnionSpec(Seq(StrSpec(coerceNumbersToStr = true), IntSpec()))
    val out = run(spec, LongType, Seq(5L))
    assert(out(0)._1.toString == "5" && out(0)._2 == Seq())
  }

  // ------------------------------------------------------------ collections

  test("list: size + per-element validation with index locs (list.rs:100-150)") {
    val spec = ListSpec(IntSpec(ge = Some(0)), minLength = Some(2))
    val out = run(spec, ArrayType(LongType),
      Seq(Seq(1L, 2L), Seq(5L), Seq(1L, -2L, -3L)))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("too_short"))
    assert(out(2)._2 == Seq("greater_than_equal", "greater_than_equal"))
  }

  test("set: dedupe is coercion not error (set.rs; mod.rs:600-601)") {
    val out = run(SetSpec(), ArrayType(LongType), Seq(Seq(1L, 1L, 2L)))
    assert(out(0)._1.asInstanceOf[scala.collection.Seq[_]].toSet == Set(1L, 2L))
    assert(out(0)._2 == Seq())
  }

  // ------------------------------------------------------------------- uuid

  test("uuid: parse + version (uuid.rs:69-156)") {
    val v4 = "c045d9e1-05bd-4a31-8b33-cdb7e2df5bd5"
    val out = types(UuidSpec(version = Some(4)), StringType,
      Seq(v4, "not-a-uuid", v4.replace("-4", "-1")))
    assert(out(0) == Seq())
    assert(out(1) == Seq("uuid_parsing"))
    assert(out(2) == Seq("uuid_version"))
  }

  // --------------------------------------------------------------- datetime

  test("datetime: str parse + bounds (datetime.rs:44-138)") {
    val spec = DatetimeSpec(ge = Some("2020-01-01 00:00:00"))
    val out = types(spec, StringType,
      Seq("2021-06-01 12:00:00", "2019-01-01 00:00:00", "garbage"))
    assert(out(0) == Seq())
    assert(out(1) == Seq("greater_than_equal"))
    assert(out(2) == Seq("datetime_parsing"))
  }

  test("date: datetime->date only at exact midnight (errors/types.rs:343)") {
    val out = types(DateSpec(), TimestampType,
      Seq(java.sql.Timestamp.valueOf("2021-06-01 00:00:00"),
        java.sql.Timestamp.valueOf("2021-06-01 10:30:00")))
    assert(out(0) == Seq())
    assert(out(1) == Seq("date_from_datetime_inexact"))
  }

  // ------------------------------------------------------------------ model

  test("model: error accumulation across fields + missing (model_fields.rs:313)") {
    import org.apache.spark.sql.functions._
    val model = ModelSpec("m", Seq(
      FieldSpec("text", StrSpec(minLength = Some(3))),
      FieldSpec("lang", EnumSpec(Seq("en", "de")))))
    val df = docs(Seq((1L, "hello", "en"), (2L, "ab", "xx"), (3L, null, "en")))
    val out = graft.compile.ModelValidator.plan(df, model)
      .select(col("id"), transform(col("violations"),
        v => concat_ws(":", v.getField("loc").getItem(0), v.getField("type")))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("lang:enum", "text:string_too_short"))
    assert(out(3L) == Seq("text:missing"))
  }

  test("model: extra=forbid flags unknown columns (model_fields.rs:67)") {
    val model = ModelSpec("m", Seq(
      FieldSpec("text", StrSpec())), extra = Extra.Forbid)
    val df = docs(Seq((1L, "hello", "en")))
    val out = graft.compile.ModelValidator.plan(df, model)
    import org.apache.spark.sql.functions._
    val vtypes = out.select(transform(col("violations"),
      v => v.getField("type")).as("t")).collect().head.getSeq[String](0)
    assert(vtypes.count(_ == "extra_forbidden") == 2) // id + lang
  }

  // ------------------------------------------------------------------- json

  test("json: parse-then-validate fused (json.rs:24)") {
    val spec = JsonSpec("k BIGINT")
    val out = run(spec, StringType, Seq("""{"k": 5}""", "not json"))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("json_invalid"))
  }

  test("definitions: recursive schema unrolls to input depth (definitions.rs analog)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import graft.compile.Compiler
    // Category { name: str(min 1), sub?: Category | None } — the classic
    // self-referential model (pydantic tests/test_forward_ref.py shape)
    val cat = ModelSpec("Category", Seq(
      FieldSpec("name", StrSpec(minLength = Some(1))),
      FieldSpec("sub", NullableSpec(RefSpec("Category")), required = false)))
    val spec = DefinitionsSpec(Map("Category" -> cat), RefSpec("Category"))
    val lvl1 = StructType(Seq(StructField("name", StringType)))
    val lvl2 = StructType(Seq(StructField("name", StringType),
      StructField("sub", lvl1)))
    val lvl3 = StructType(Seq(StructField("name", StringType),
      StructField("sub", lvl2)))
    val schema = StructType(Seq(StructField("x", lvl3)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Row("a", Row("b", Row("c")))),
      Row(Row("a", Row("", Row(""))))), 1), schema)
    val c = Compiler.compile(col("x"), lvl3, array(lit("x")), spec, Mode.Lax)
    val rows = df.select(
      transform(c.violations, v => v.getField("type")).as("t"),
      transform(c.violations, v =>
        concat_ws("/", v.getField("loc"))).as("l")).collect()
    assert(rows(0).getSeq[String](0) == Seq())
    // violations at nested ref levels carry the full loc path
    assert(rows(1).getSeq[String](0) == Seq("string_too_short", "string_too_short"))
    assert(rows(1).getSeq[String](1).toSet ==
      Set("x/sub/name", "x/sub/sub/name"))
    // budget cutoff: maxUnroll=1 validates only the first ref level
    val cut = Compiler.compile(col("x"), lvl3, array(lit("x")),
      spec.copy(maxUnroll = 2), Mode.Lax)
    val cutRows = df.select(
      transform(cut.violations, v => v.getField("type")).as("t")).collect()
    assert(cutRows(1).getSeq[String](0) == Seq("string_too_short")) // depth-3 passes unchecked
    // mutually recursive refs terminate
    val a = ModelSpec("A", Seq(FieldSpec("name", StrSpec()),
      FieldSpec("sub", NullableSpec(RefSpec("B")), required = false)))
    val bm = ModelSpec("B", Seq(FieldSpec("name", StrSpec()),
      FieldSpec("sub", NullableSpec(RefSpec("A")), required = false)))
    val mut = DefinitionsSpec(Map("A" -> a, "B" -> bm), RefSpec("A"))
    val mc = Compiler.compile(col("x"), lvl3, array(lit("x")), mut, Mode.Lax)
    assert(df.select(size(mc.violations)).collect()(0).getInt(0) == 0)
  }

  test("model_validator(mode='after'): cross-field check — value_error " +
    "at the model loc, gated on clean fields (functional_validators" +
    ".py:651-679)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import graft.compile.Compiler
    val m = ModelSpec("Range", Seq(
      FieldSpec("lo", IntSpec()),
      FieldSpec("hi", IntSpec(ge = Some(0)))),
      modelChecks = Seq(
        ModelCheck("ordered", s => s.getField("lo") <= s.getField("hi"),
          "lo must be <= hi"),
        ModelCheck("span", s => s.getField("hi") - s.getField("lo") < 100L,
          "span too wide")))
    val st = StructType(Seq(StructField("lo", LongType),
      StructField("hi", LongType)))
    val schema = StructType(Seq(StructField("x", st)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Row(1L, 2L)),    // clean
      Row(Row(5L, 2L)),    // ordered fails
      Row(Row(1L, 500L)),  // span fails
      Row(Row(5L, -1L))    // FIELD error (hi ge 0): model checks gated off
    ), 1), schema)
    val c = Compiler.compile(col("x"), st, array(), m, Mode.Lax)
    val rows = df.select(
      transform(c.violations, v => v.getField("type")).as("t"),
      transform(c.violations, v => v.getField("msg")).as("m"),
      transform(c.violations, v => size(v.getField("loc"))).as("locn"),
      transform(c.violations, v => v.getField("input")).as("i"),
      transform(c.violations, v => v.getField("ctx")("error")).as("e"))
      .collect()
    assert(rows(0).getSeq[String](0) == Seq())
    assert(rows(1).getSeq[String](0) == Seq("value_error"))
    assert(rows(1).getSeq[String](1) == Seq("Value error, lo must be <= hi"))
    assert(rows(1).getSeq[Int](2) == Seq(0)) // loc = () — model root
    assert(rows(1).getSeq[String](3) == Seq("""{"lo":5,"hi":2}"""))
    assert(rows(1).getSeq[String](4) == Seq("lo must be <= hi"))
    assert(rows(2).getSeq[String](1) == Seq("Value error, span too wide"))
    // field violation present -> after-model validators NOT called
    assert(rows(3).getSeq[String](0) == Seq("greater_than_equal"))
  }
}
