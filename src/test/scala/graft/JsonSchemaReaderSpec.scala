package graft

import graft.spec._

/** JSON Schema import ([[JsonSchemaReader]]) — the export→import→export
 * fixpoint over the invertible ADT surface, plus direct construction
 * from a hand-written schema document. */
class JsonSchemaReaderSpec extends SparkTestBase {

  private def fix(s: Spec): Unit = {
    val once = JsonSchemaGen.toJson(s)
    val twice = JsonSchemaGen.toJson(JsonSchemaReader.fromJson(once))
    assert(twice == once, s"\nspec:  $s\nonce:  $once\ntwice: $twice")
  }

  test("export -> import -> export is a fixpoint across the ADT") {
    val model = ModelSpec("doc", Seq(
      FieldSpec("id", IntSpec(ge = Some(0))),
      FieldSpec("lang", EnumSpec(Seq("en", "de"))),
      FieldSpec("note", WithDefaultSpec(StrSpec(), "n/a"),
        required = false)), Extra.Forbid)
    val specs: Seq[Spec] = Seq(
      StrSpec(), StrSpec(minLength = Some(1), maxLength = Some(9),
        pattern = Some("^a.*$")),
      IntSpec(gt = Some(0), le = Some(10), multipleOf = Some(2)),
      FloatSpec(ge = Some(0.5), lt = Some(2.5)),
      BoolSpec(), NoneSpec, AnySpec,
      DateSpec(), DatetimeSpec(), TimeSpec(), TimedeltaSpec(),
      BytesSpec(minLength = Some(4)), UuidSpec(),
      UrlSpec(maxLength = Some(2083)),
      FractionSpec(), ComplexSpec, DecimalSpec(),
      JsonSpec("string"),
      EnumSpec(Seq("a", "b")), LiteralSpec(Seq("x")),
      NullableSpec(IntSpec()),
      WithDefaultSpec(StrSpec(), "dflt"),
      WithDefaultSpec(AnySpec, "42"),
      UnionSpec(Seq(IntSpec(), StrSpec())),
      TaggedUnionSpec("kind", Seq(
        "A" -> ModelSpec("A", Seq(FieldSpec("x", IntSpec()))),
        "B" -> ModelSpec("B", Seq(FieldSpec("y", StrSpec()))))),
      ListSpec(StrSpec(minLength = Some(1)), minLength = Some(1)),
      SetSpec(IntSpec(), maxLength = Some(5)),
      DictSpec(value = FloatSpec()),
      TupleSpec(Seq(IntSpec(), StrSpec())),
      TupleSpec(Seq(IntSpec()), variadic = Some(StrSpec()),
        maxLength = Some(8)),
      model,
      DefinitionsSpec(Map("node" -> ModelSpec("node", Seq(
        FieldSpec("v", IntSpec()),
        FieldSpec("next", NullableSpec(RefSpec("node")),
          required = false)))), RefSpec("node")))
    specs.foreach(fix)
  }

  test("hand-written schema constructs the expected ADT") {
    val schema =
      """{"title": "doc", "type": "object", "properties": {
        |  "id": {"type": "integer", "minimum": 0},
        |  "lang": {"enum": ["en", "de"]},
        |  "tags": {"type": "array", "items":
        |    {"type": "string", "minLength": 1}}},
        | "required": ["id", "lang"], "additionalProperties": false}"""
        .stripMargin
    val expected = ModelSpec("doc", Seq(
      FieldSpec("id", IntSpec(ge = Some(0))),
      FieldSpec("lang", EnumSpec(Seq("en", "de"))),
      FieldSpec("tags", ListSpec(StrSpec(minLength = Some(1))),
        required = false)), Extra.Forbid)
    assert(JsonSchemaReader.fromJson(schema) == expected)
  }

  test("imported schema compiles and validates like the ADT original") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spec = JsonSchemaReader.fromJson(
      """{"type": "string", "minLength": 3, "pattern": "^[a-z]+$"}""")
    assert(spec == StrSpec(minLength = Some(3), pattern = Some("^[a-z]+$")))
    val out = types(spec, StringType, Seq("abc", "ab", "ABC"))
    assert(out == Seq(Seq(), Seq("string_too_short"),
      Seq("string_pattern_mismatch")))
  }
}
