package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compile.{Compiler, ModelValidator}
import graft.spec._

/**
 * Golden-fixture replay of the reference's own test cases — full
 * `{type, loc, msg, input, ctx}` equality, not just error types
 * (the `sbt -batch test` replay the north star demands).
 *
 * Every fixture cites the reference test it transcribes. Expected dicts are
 * copied verbatim from `exc_info.value.errors(include_url=False)` asserts in
 * the reference suite; ctx values are stringified (our violation schema is
 * map<string,string>, FIXTURES.md §3).
 */
class GoldenFixturesSpec extends SparkTestBase {

  /** One violation as a comparable tuple. */
  type V = (Seq[String], String, String, String, Map[String, String])

  /** Validate a single-row table against a model; violations sorted by loc
   * (the reference accumulates in field order; our compiler emits in field
   * order too, so order-sensitive comparison is intentional). */
  def golden(model: ModelSpec, schema: StructType, row: Row): Seq[V] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
    val planned = ModelValidator.plan(df, model)
    planned.select(explode(col(ModelValidator.VIOLATIONS)).as("v"))
      .select(col("v.loc"), col("v.type"), col("v.msg"), col("v.input"),
        col("v.ctx"))
      .collect().toSeq.map { r =>
        (r.getSeq[String](0), r.getString(1), r.getString(2),
          r.getString(3),
          Option(r.getMap[String, String](4)).map(_.toMap).getOrElse(Map.empty))
      }
  }

  test("test_types.py:435-462 test_string_fails — pattern + min_length golden dicts") {
    // class MoreStringsModel: str_regex: constr(pattern=r'^xxx\d{3}$');
    //                         str_min_length: constr(min_length=5)
    val model = ModelSpec("MoreStringsModel", Seq(
      FieldSpec("str_regex", StrSpec(pattern = Some("^xxx\\d{3}$"))),
      FieldSpec("str_min_length", StrSpec(minLength = Some(5)))))
    val schema = StructType(Seq(
      StructField("str_regex", StringType),
      StructField("str_min_length", StringType)))
    val got = golden(model, schema, Row("xxx123xxx", "1234"))
    assert(got == Seq(
      (Seq("str_regex"), "string_pattern_mismatch",
        "String should match pattern '^xxx\\d{3}$'", "xxx123xxx",
        Map("pattern" -> "^xxx\\d{3}$")),
      (Seq("str_min_length"), "string_too_short",
        "String should have at least 5 characters", "1234",
        Map("min_length" -> "5"))))
  }

  test("test_types.py:1576-1584 — greater_than golden dict (Gt(0), input -1)") {
    val model = ModelSpec("Model", Seq(FieldSpec("x", IntSpec(gt = Some(0)))))
    val schema = StructType(Seq(StructField("x", LongType)))
    val got = golden(model, schema, Row(-1L))
    assert(got == Seq(
      (Seq("x"), "greater_than", "Input should be greater than 0", "-1",
        Map("gt" -> "0"))))
  }

  test("errors/types.rs:502 — missing field golden dict") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("a", IntSpec()), FieldSpec("b", StrSpec())))
    val schema = StructType(Seq(StructField("a", LongType)))
    val got = golden(model, schema, Row(1L))
    assert(got == Seq(
      (Seq("b"), "missing", "Field required", null, Map.empty[String, String])))
  }

  test("errors/types.rs:505 — extra_forbidden golden dict") {
    val model = ModelSpec("Model", Seq(FieldSpec("a", IntSpec())),
      extra = Extra.Forbid)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("stray", StringType)))
    val got = golden(model, schema, Row(1L, "x"))
    assert(got == Seq(
      (Seq("stray"), "extra_forbidden", "Extra inputs are not permitted",
        "x", Map.empty[String, String])))
  }

  test("errors/types.rs:550 — int_parsing golden dict (core test_int.py 'wrong')") {
    val model = ModelSpec("Model", Seq(FieldSpec("n", IntSpec())))
    val schema = StructType(Seq(StructField("n", StringType)))
    val got = golden(model, schema, Row("wrong"))
    assert(got == Seq(
      (Seq("n"), "int_parsing",
        "Input should be a valid integer, unable to parse string as an integer",
        "wrong", Map.empty[String, String])))
  }

  test("errors/types.rs:551 — int_from_float golden dict (float 1.5)") {
    val model = ModelSpec("Model", Seq(FieldSpec("n", IntSpec())))
    val schema = StructType(Seq(StructField("n", DoubleType)))
    val got = golden(model, schema, Row(1.5))
    assert(got == Seq(
      (Seq("n"), "int_from_float",
        "Input should be a valid integer, got a number with a fractional part",
        "1.5", Map.empty[String, String])))
  }

  test("errors/types.rs:548 — bool_parsing golden dict (core test_bool.py 'wrong')") {
    val model = ModelSpec("Model", Seq(FieldSpec("b", BoolSpec())))
    val schema = StructType(Seq(StructField("b", StringType)))
    val got = golden(model, schema, Row("wrong"))
    assert(got == Seq(
      (Seq("b"), "bool_parsing",
        "Input should be a valid boolean, unable to interpret input",
        "wrong", Map.empty[String, String])))
  }

  test("errors/types.rs:540,562 — enum/literal expected-list repr \"'a', 'b' or 'c'\"") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("e", EnumSpec(Seq("a", "b", "c"))),
      FieldSpec("l", LiteralSpec(Seq("x", "y")))))
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("l", StringType)))
    val got = golden(model, schema, Row("z", "z"))
    assert(got.map(v => (v._2, v._3)) == Seq(
      ("enum", "Input should be 'a', 'b' or 'c'"),
      ("literal_error", "Input should be 'x' or 'y'")))
  }

  test("errors/types.rs:518-521 — ge/le/multiple_of messages verbatim") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("a", IntSpec(ge = Some(10))),
      FieldSpec("b", IntSpec(le = Some(5))),
      FieldSpec("c", IntSpec(multipleOf = Some(3)))))
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("c", LongType)))
    val got = golden(model, schema, Row(9L, 6L, 7L))
    assert(got == Seq(
      (Seq("a"), "greater_than_equal",
        "Input should be greater than or equal to 10", "9", Map("ge" -> "10")),
      (Seq("b"), "less_than_equal",
        "Input should be less than or equal to 5", "6", Map("le" -> "5")),
      (Seq("c"), "multiple_of",
        "Input should be a multiple of 3", "7", Map("multiple_of" -> "3"))))
  }

  test("errors/types.rs:539 — string_not_ascii message verbatim") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("s", StrSpec(asciiOnly = true))))
    val schema = StructType(Seq(StructField("s", StringType)))
    val got = golden(model, schema, Row("héllo"))
    assert(got == Seq(
      (Seq("s"), "string_not_ascii",
        "String should contain only ASCII characters", "héllo",
        Map.empty[String, String])))
  }

  test("errors/types.rs:522 — finite_number (allow_inf_nan=False, core test_float.py)") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("f", FloatSpec(allowInfNan = false))))
    val schema = StructType(Seq(StructField("f", DoubleType)))
    val got = golden(model, schema, Row(Double.PositiveInfinity))
    assert(got == Seq(
      (Seq("f"), "finite_number", "Input should be a finite number",
        "Infinity", Map.empty[String, String])))
  }

  test("errors/types.rs:516 — none_required golden dict") {
    val model = ModelSpec("Model", Seq(FieldSpec("x", NoneSpec,
      required = false)))
    val schema = StructType(Seq(StructField("x", StringType)))
    val got = golden(model, schema, Row("notnull"))
    assert(got == Seq(
      (Seq("x"), "none_required", "Input should be None", "notnull",
        Map.empty[String, String])))
  }

  test("list element loc carries the index (errors/location.rs:15-23)") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("xs", ListSpec(IntSpec(ge = Some(0))))))
    val schema = StructType(Seq(
      StructField("xs", ArrayType(LongType))))
    val got = golden(model, schema, Row(Seq(1L, -2L, 3L)))
    assert(got == Seq(
      (Seq("xs", "1"), "greater_than_equal",
        "Input should be greater than or equal to 0", "-2", Map("ge" -> "0"))))
  }

  test("uuid_version golden dict (uuid.rs:69,103)") {
    val model = ModelSpec("Model", Seq(
      FieldSpec("u", UuidSpec(version = Some(4)))))
    val schema = StructType(Seq(StructField("u", StringType)))
    // a valid v1 UUID rejected by UUID4
    val got = golden(model, schema,
      Row("c96e505c-4c62-11ee-be56-0242ac120002"))
    assert(got == Seq(
      (Seq("u"), "uuid_version", "UUID version 4 expected",
        "c96e505c-4c62-11ee-be56-0242ac120002",
        Map("expected_version" -> "4"))))
  }

  test("errors() url key — validation_exception.rs:237-246 render-time prefix") {
    import org.apache.spark.sql.functions._
    import graft.compile.{Compiler, Violations}
    // pydantic: {'type': 'int_parsing', ..., 'url':
    //   'https://errors.pydantic.dev/<major.minor>/v/int_parsing'}
    val c = Compiler.compile(lit("zz"), org.apache.spark.sql.types.StringType,
      array(lit("x")), IntSpec(), Mode.Lax)
    val r = spark.range(1)
      .select(explode(Violations.withUrl(c.violations)).as("v"))
      .select(col("v.type"), col("v.url"), col("v.msg")).collect().head
    assert(r.getString(0) == "int_parsing")
    assert(r.getString(1) == "https://errors.pydantic.dev/2.14/v/int_parsing")
    assert(r.getString(2) ==
      "Input should be a valid integer, unable to parse string as an integer")
  }
}
