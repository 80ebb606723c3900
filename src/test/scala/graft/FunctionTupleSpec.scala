package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import graft.compile.Compiler

/**
 * Function (custom) validators — cases transcribed from
 * `pydantic/functional_validators.py` docstring examples (Before/After/
 * Plain/Wrap) and `pydantic/experimental/pipeline.py` (predicate,
 * transform, eq/not_eq/in_/not_in) — plus TupleSpec fixtures mirroring
 * `pydantic-core/tests/validators/test_tuple.py`.
 */
class FunctionTupleSpec extends SparkTestBase {

  // ------------------------------------------------- function validators

  test("after validator: double after int validation (functional_validators.py:43-56)") {
    val spec = FunctionAfterSpec(IntSpec(), _ * 2)
    val out = run(spec, StringType, Seq("2", "x", null))
    assert(out(0) == ((4L, Seq())))
    assert(out(1)._2 == Seq("int_parsing"))
    assert(out(2) == ((null, Seq())))
  }

  test("before validator: strip then parse (functional_validators.py:30 shape)") {
    val spec = FunctionBeforeSpec(c => trim(c), IntSpec(ge = Some(0)))
    val out = run(spec, StringType, Seq(" 5 ", " -3 ", " zz "))
    assert(out(0) == ((5L, Seq())))
    assert(out(1)._2 == Seq("greater_than_equal"))
    assert(out(2)._2 == Seq("int_parsing"))
  }

  test("before validator with declared output type") {
    // str -> array via split, then list validation of the parts
    val spec = FunctionBeforeSpec(c => split(c, ","),
      ListSpec(IntSpec(), minLength = Some(2)), Some("ARRAY<STRING>"))
    val out = run(spec, StringType, Seq("1,2,3", "1", "1,x"))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("too_short"))
    assert(out(2)._2 == Seq("int_parsing"))
  }

  test("plain validator replaces validation (functional_validators.py:158)") {
    val spec = FunctionPlainSpec(c => upper(c), "STRING")
    assert(run(spec, StringType, Seq("abc")) == Seq(("ABC", Seq())))
  }

  test("wrap validator: swallow inner error, substitute fallback (functional_validators.py:258 shape)") {
    val spec = FunctionWrapSpec(IntSpec(), ctx =>
      (when(size(ctx.violations) === 0, ctx.validated).otherwise(lit(-1L)),
        graft.compile.Violations.empty))
    val out = run(spec, StringType, Seq("7", "bad"))
    assert(out(0) == ((7L, Seq())))
    assert(out(1) == ((-1L, Seq())))
  }

  test("predicate: predicate_failed with exact message (pipeline.py:605-621)") {
    val spec = ChainSpec(Seq(IntSpec(), PredicateSpec(c => c % 2 === 0, "is_even")))
    val schema = StructType(Seq(StructField("x", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L)), 1), schema)
    val c = Compiler.compile(col("x"), LongType, array(lit("x")), spec, Mode.Lax)
    val r = df.select(element_at(c.violations, 1).getField("type").as("t"),
      element_at(c.violations, 1).getField("msg").as("m")).collect().head
    assert(r.getString(0) == "predicate_failed")
    assert(r.getString(1) == "Predicate 'is_even' failed")
  }

  test("pipeline eq/not_eq/in_/not_in -> value_error with _check_func message (pipeline.py:405-415)") {
    import Pipeline._
    val eqSpec = validateAsInt.eqTo(5).spec
    val out = run(eqSpec, LongType, Seq(5L, 6L))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("value_error"))

    val schema = StructType(Seq(StructField("x", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(6L)), 1), schema)
    val c = Compiler.compile(col("x"), LongType, array(lit("x")), eqSpec, Mode.Lax)
    val msg = df.select(element_at(c.violations, 1).getField("msg"))
      .collect().head.getString(0)
    assert(msg == "Value error, Expected == 5")

    assert(types(validateAsInt.notEqTo(5).spec, LongType, Seq(5L, 6L)) ==
      Seq(Seq("value_error"), Seq()))
    assert(types(validateAsStr.in_("a", "b").spec, StringType, Seq("a", "c")) ==
      Seq(Seq(), Seq("value_error")))
    assert(types(validateAsStr.notIn("a", "b").spec, StringType, Seq("a", "c")) ==
      Seq(Seq("value_error"), Seq()))
  }

  test("pipeline transform + predicate compose") {
    import Pipeline._
    val p = validateAsInt.ge(0).transform(_ * 10)
      .predicate("lt100")(_ < 100)
    val out = run(p.spec, StringType, Seq("5", "20"))
    assert(out(0) == ((50L, Seq())))
    assert(out(1)._2 == Seq("predicate_failed")) // 200 >= 100
  }

  // ------------------------------------------------------------- tuples

  private val posTuple = TupleSpec(Seq(
    IntSpec(ge = Some(0)), StrSpec(minLength = Some(1)), IntSpec()))

  test("tuple: positional pass + per-position coercion (test_tuple.py positional)") {
    val out = run(posTuple, ArrayType(StringType),
      Seq(Seq("1", "a", "2"), Seq("-1", "", "2")))
    assert(out(0)._2 == Seq())
    assert(out(0)._1.asInstanceOf[Row].toSeq == Seq(1L, "a", 2L))
    assert(out(1)._2.toSet == Set("greater_than_equal", "string_too_short"))
  }

  test("tuple: short input -> missing at the absent positions (tuple.rs:94)") {
    val out = types(posTuple, ArrayType(StringType), Seq(Seq("1")))
    assert(out.head == Seq("missing", "missing"))
  }

  test("tuple: missing position with default uses it (tuple.rs:90-95)") {
    val spec = TupleSpec(Seq(IntSpec(),
      WithDefaultSpec(IntSpec(), default = "9")))
    val out = run(spec, ArrayType(StringType), Seq(Seq("1")))
    assert(out.head._2 == Seq())
    assert(out.head._1.asInstanceOf[Row].toSeq == Seq(1L, 9L))
  }

  test("tuple: extra items without variadic -> too_long (tuple.rs:232)") {
    val out = types(posTuple, ArrayType(StringType),
      Seq(Seq("1", "a", "2", "3")))
    assert(out.head == Seq("too_long"))
  }

  test("tuple: variadic tail validates every extra item (tuple[int, str, ...])") {
    val spec = TupleSpec(Seq(IntSpec()),
      variadic = Some(StrSpec(minLength = Some(2))))
    val out = run(spec, ArrayType(StringType),
      Seq(Seq("1", "ab", "cd"), Seq("1", "x", "yz")))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("string_too_short"))
  }

  // ---- post-variadic suffix: tuple[int, *tuple[str, ...], int, bool]
  // goldens from pydantic_core SchemaValidator({'type':'tuple',
  // 'items_schema':[int,str,int,bool],'variadic_item_index':1})

  private val sufTuple = TupleSpec(Seq(IntSpec()),
    variadic = Some(StrSpec()), suffix = Seq(IntSpec(), BoolSpec()))

  private def locsAndTypes(spec: Spec, values: Seq[Any]) = {
    val schema = StructType(Seq(StructField("x", ArrayType(StringType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(v => Row(v)), 1), schema)
    val c = Compiler.compile(col("x"), ArrayType(StringType),
      array(lit("t")), spec, Mode.Lax)
    df.select(transform(c.violations,
        v => struct(v.getField("type"), v.getField("loc"))))
      .collect().map(_.getSeq[Row](0)
        .map(r => (r.getString(0), r.getSeq[String](1).drop(1).mkString(","))))
      .toSeq
  }

  test("tuple suffix: last S elements bind to the suffix, variadic takes the middle (tuple.rs:122-210)") {
    val out = run(sufTuple, ArrayType(StringType), Seq(
      Seq("1", "a", "b", "2", "true"), // 2 variadic
      Seq("1", "2", "true"),           // zero variadic: suffix wins the elems
      Seq("1", "a", "b", "x", "9", "true"))) // 3 variadic
    assert(out(0)._2 == Seq())
    assert(out(0)._1.asInstanceOf[Row].toSeq ==
      Seq(1L, Seq("a", "b"), 2L, true))
    assert(out(1)._2 == Seq())
    assert(out(1)._1.asInstanceOf[Row].toSeq == Seq(1L, Seq(), 2L, true))
    assert(out(2)._2 == Seq())
  }

  test("tuple suffix: missing suffix positions report loc P+j (golden: [1] -> missing@1, missing@2)") {
    assert(locsAndTypes(sufTuple, Seq(Seq("1"), Seq(), Seq("1", "5"))) == Seq(
      Seq(("missing", "1"), ("missing", "2")),
      Seq(("missing", "0"), ("missing", "1"), ("missing", "2")),
      Seq(("missing", "2")))) // "5" coerces at the first suffix slot
  }

  test("tuple suffix: error locs lag by one once the variadic matched (tuple.rs:170-206)") {
    assert(locsAndTypes(sufTuple, Seq(
      Seq("1", "a", "7"),            // m=0: true indices 1,2
      Seq("1", "a", "b", "c"),       // m=1: lagged to 1,2 (true: 2,3)
      Seq("1", "a", "b", "x", "c"))) // m=2: lagged to 2,3 (true: 3,4)
      == Seq(
        Seq(("int_parsing", "1"), ("bool_parsing", "2")),
        Seq(("int_parsing", "1"), ("bool_parsing", "2")),
        Seq(("int_parsing", "2"), ("bool_parsing", "3"))))
  }

  test("tuple suffix: variadic errors keep the TRUE input index (tuple.rs:163-166 counter lag cancels)") {
    val spec = TupleSpec(Seq(IntSpec()), variadic = Some(IntSpec()),
      suffix = Seq(BoolSpec()))
    assert(locsAndTypes(spec, Seq(Seq("1", "x", "2", "true"))) ==
      Seq(Seq(("int_parsing", "1"))))
  }

  test("tuple suffix: default fills an absent suffix position (golden: [1] -> (1, 7))") {
    val spec = TupleSpec(Seq(IntSpec()), variadic = Some(StrSpec()),
      suffix = Seq(WithDefaultSpec(IntSpec(), default = "7")))
    val out = run(spec, ArrayType(StringType), Seq(Seq("1"), Seq("1", "a")))
    assert(out(0)._2 == Seq())
    assert(out(0)._1.asInstanceOf[Row].toSeq == Seq(1L, Seq(), 7L))
    assert(out(1)._2 == Seq("int_parsing")) // 'a' claimed by the suffix
  }

  test("tuple suffix: fail_fast stops at the first head error (golden ff)") {
    val spec = sufTuple.copy(failFast = true)
    assert(locsAndTypes(spec, Seq(Seq("x", "a", "b", "y", "z"))) ==
      Seq(Seq(("int_parsing", "0"))))
  }

  test("tuple suffix: struct input binds statically") {
    val st = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", LongType),
      StructField("d", StringType)))
    val schema = StructType(Seq(StructField("s", st)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Row(1L, "v", 2L, "true")), Row(Row(1L, "v", 2L, "zz"))), 1),
      schema)
    val c = Compiler.compile(col("s"), st, array(lit("s")), sufTuple,
      Mode.Lax)
    val out = df.select(transform(c.violations, v => v.getField("type")))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq())
    assert(out(1) == Seq("bool_parsing"))
  }

  test("tuple suffix: requires a variadic item") {
    intercept[IllegalArgumentException] {
      run(TupleSpec(Seq(IntSpec()), suffix = Seq(IntSpec())),
        ArrayType(StringType), Seq(Seq("1")))
    }
  }

  test("tuple suffix: json schema flattens to prefixItems with inline variadic (pydantic golden)") {
    val js = graft.spec.JsonSchemaGen.toJson(sufTuple)
    assert(js == """{"maxItems": 4, "minItems": 4, "prefixItems": """ +
      """[{"type": "integer"}, {"items": {"type": "string"}, "type": "array"}, """ +
      """{"type": "integer"}, {"type": "boolean"}], "type": "array"}""")
  }

  test("tuple: min/max length with variadic (tuple.rs:257,298)") {
    val spec = TupleSpec(Seq(IntSpec()), variadic = Some(AnySpec),
      minLength = Some(2), maxLength = Some(3))
    assert(types(spec, ArrayType(StringType),
      Seq(Seq("1"), Seq("1", "2", "3", "4"), Seq("1", "2"))) ==
      Seq(Seq("too_short"), Seq("too_long"), Seq()))
  }

  test("tuple: fail_fast keeps only the first violation") {
    val spec = posTuple.copy(failFast = true)
    assert(types(spec, ArrayType(StringType), Seq(Seq("-1", "", "2"))) ==
      Seq(Seq("greater_than_equal")))
  }

  test("tuple: struct input = fields in declaration order") {
    val schema = StructType(Seq(StructField("s", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Row(1L, "x")), Row(Row(-1L, "x"))), 1), schema)
    val spec = TupleSpec(Seq(IntSpec(ge = Some(0)), StrSpec()))
    val c = Compiler.compile(col("s"), schema("s").dataType,
      array(lit("s")), spec, Mode.Lax)
    val out = df.select(transform(c.violations, v => v.getField("type")))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq())
    assert(out(1) == Seq("greater_than_equal"))
  }

  test("tuple: non-collection input -> tuple_type") {
    assert(types(posTuple, LongType, Seq(5L)) == Seq(Seq("tuple_type")))
  }

  test("tuple: element loc carries the position index") {
    val schema = StructType(Seq(StructField("x", ArrayType(StringType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq("-1", "a", "2"))), 1), schema)
    val c = Compiler.compile(col("x"), ArrayType(StringType),
      array(lit("tup")), posTuple, Mode.Lax)
    val loc = df.select(element_at(c.violations, 1).getField("loc"))
      .collect().head.getSeq[String](0)
    assert(loc == Seq("tup", "0"))
  }

  // --------------------------------------- tagged-union message rendering

  test("tagged union: unknown tag renders actual value + expected_tags ctx") {
    val schema = StructType(Seq(StructField("s", StructType(Seq(
      StructField("kind", StringType), StructField("v", LongType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Row("frog", 1L)), Row(Row(null, 1L))), 1), schema)
    val spec = TaggedUnionSpec("kind", Seq(
      "cat" -> ModelSpec("c", Seq(FieldSpec("v", IntSpec()))),
      "dog" -> ModelSpec("d", Seq(FieldSpec("v", IntSpec())))))
    val c = Compiler.compile(col("s"), schema("s").dataType,
      array(lit("s")), spec, Mode.Lax)
    val rows = df.select(
      element_at(c.violations, 1).getField("type").as("t"),
      element_at(c.violations, 1).getField("msg").as("m"),
      element_at(c.violations, 1).getField("ctx").as("ctx")).collect()
    assert(rows(0).getString(0) == "union_tag_invalid")
    assert(rows(0).getString(1) ==
      "Input tag 'frog' found using 'kind' does not match any of the expected tags: 'cat', 'dog'")
    val ctx = rows(0).getMap[String, String](2)
    assert(ctx("tag") == "frog" && ctx("expected_tags") == "'cat', 'dog'")
    assert(rows(1).getString(0) == "union_tag_not_found")
    assert(rows(1).getString(1) ==
      "Unable to extract tag using discriminator 'kind'")
  }

  // ------------------------------------------------------- named tuple

  private val ntSpec = NamedTupleSpec("Pt", Seq(
    FieldSpec("x", IntSpec(ge = Some(0))),
    FieldSpec("y", WithDefaultSpec(StrSpec(), default = "d"))))

  test("named-tuple: positional binding, defaults, named output (named_tuple.rs:308-365)") {
    val out = run(ntSpec, ArrayType(StringType),
      Seq(Seq("1", "a"), Seq("5"), Seq("-1", "b")))
    assert(out(0)._2 == Seq())
    val r0 = out(0)._1.asInstanceOf[Row]
    assert(r0.schema.fieldNames.toSeq == Seq("x", "y"))
    assert(r0.toSeq == Seq(1L, "a"))
    // absent position with default uses it (default_value at :357-358)
    assert(out(1)._2 == Seq() && out(1)._1.asInstanceOf[Row].toSeq == Seq(5L, "d"))
    assert(out(2)._2 == Seq("greater_than_equal"))
  }

  test("named-tuple: extra positional items -> ONE too_long that replaces field errors (named_tuple.rs:367-377)") {
    val c = Compiler.compile(col("x"), ArrayType(StringType),
      array(lit("x")), ntSpec, Mode.Lax)
    val schema = StructType(Seq(StructField("x", ArrayType(StringType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(Seq("-1", "a", "zz"))), 1), schema)
    val rows = df.select(
      element_at(c.violations, 1).getField("type").as("t"),
      element_at(c.violations, 1).getField("msg").as("m"),
      element_at(c.violations, 1).getField("ctx").as("ctx"),
      size(c.violations).as("n")).collect()
    // the -1 ge violation is DISCARDED; only too_long is raised
    assert(rows(0).getInt(3) == 1 && rows(0).getString(0) == "too_long")
    assert(rows(0).getString(1) ==
      "NamedTuple should have at most 2 items after validation, not 3")
    val ctx = rows(0).getMap[String, String](2)
    assert(ctx("field_type") == "NamedTuple" && ctx("max_length") == "2"
      && ctx("actual_length") == "3")
  }

  test("named-tuple: short input without default -> missing at the index (named_tuple.rs:357-361)") {
    val out = types(NamedTupleSpec("P", Seq(
      FieldSpec("a", IntSpec()), FieldSpec("b", IntSpec()))),
      ArrayType(StringType), Seq(Seq("1")))
    assert(out.head == Seq("missing"))
  }

  test("named-tuple: struct input binds by name; extra keys ALWAYS forbidden (named_tuple.rs:296-305)") {
    val schema = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", StringType), StructField("z", StringType))))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(Row("3", "oops"))), 1), schema)
    val c = Compiler.compile(col("s"), schema("s").dataType,
      array(lit("s")), ntSpec, Mode.Lax)
    val r = df.select(c.value.as("v"),
      transform(c.violations, x => x.getField("type")).as("t"),
      transform(c.violations, x => x.getField("loc")).as("l")).collect().head
    assert(r.getSeq[String](1) == Seq("extra_forbidden"))
    assert(r.getSeq[scala.collection.Seq[String]](2).head.toSeq == Seq("s", "z"))
    assert(r.getStruct(0).toSeq == Seq(3L, "d"))
  }

  test("named-tuple: non-collection input -> named_tuple_type (errors/types.rs:512)") {
    val c = Compiler.compile(lit(5L), LongType, array(lit("x")),
      ntSpec, Mode.Lax)
    val r = spark.range(1).select(
      element_at(c.violations, 1).getField("type").as("t"),
      element_at(c.violations, 1).getField("msg").as("m")).collect().head
    assert(r.getString(0) == "named_tuple_type")
    assert(r.getString(1) ==
      "Input should be a tuple, list, dictionary or an instance of Pt")
  }

  // --------------------------------------------------------- dataclass

  test("dataclass: model-fields engine with dataclass_type on wrong input (dataclass.rs; errors/types.rs:510)") {
    val dc = DataclassSpec("User", Seq(
      FieldSpec("id", IntSpec(ge = Some(0))),
      FieldSpec("name", StrSpec(minLength = Some(1)))),
      extra = Extra.Forbid)
    val schema = StructType(Seq(StructField("s", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("rogue", StringType))))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(Row("7", "ada", "x")), Row(Row("-1", "", null))), 1), schema)
    val c = Compiler.compile(col("s"), schema("s").dataType,
      array(lit("s")), dc, Mode.Lax)
    val rows = df.select(c.value.as("v"),
      transform(c.violations, x => x.getField("type")).as("t")).collect()
    assert(rows(0).getSeq[String](1) == Seq("extra_forbidden"))
    assert(rows(0).getStruct(0).toSeq == Seq(7L, "ada"))
    assert(rows(1).getSeq[String](1).toSet ==
      Set("greater_than_equal", "string_too_short"))
    // wrong input type
    val bad = Compiler.compile(lit("nope"), StringType, array(lit("x")),
      dc, Mode.Lax)
    val r = spark.range(1).select(
      element_at(bad.violations, 1).getField("type").as("t"),
      element_at(bad.violations, 1).getField("msg").as("m")).collect().head
    assert(r.getString(0) == "dataclass_type")
    assert(r.getString(1) == "Input should be a dictionary or an instance of User")
  }
}
