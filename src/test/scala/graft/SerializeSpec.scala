package graft

import org.apache.spark.sql.functions._

import graft.serialize.Serializer
import graft.serialize.Serializer.DumpSpec
import graft.spec._
import graft.spec.Pipeline._

class SerializeSpec extends SparkTestBase {

  import spark.implicits._

  val m = ModelSpec("doc", Seq(
    FieldSpec("id", IntSpec()), FieldSpec("name", StrSpec()),
    FieldSpec("secret", StrSpec())))

  lazy val df = Seq((1L, "alpha", "s1"), (2L, null, "s2"))
    .toDF("id", "name", "secret")

  test("dump: include/exclude/alias/computed — column pruning semantics") {
    val out = Serializer.dump(df, m, DumpSpec(
      exclude = Set("secret"),
      byAlias = Map("name" -> "label"),
      computed = Seq("id2" -> (col("id") * 2))))
    assert(out.columns.toSeq == Seq("id", "label", "id2"))
    assert(out.filter(col("id") === 1).select("id2").as[Long].head() == 2L)
  }

  test("dumpJson: exclude_none maps to ignoreNullFields") {
    val keep = Serializer.dumpJson(df.filter(col("id") === 2), m)
      .as[String].head()
    assert(keep.contains("\"name\":null"))
    val drop = Serializer.dumpJson(df.filter(col("id") === 2), m,
      DumpSpec(excludeNone = true)).as[String].head()
    assert(!drop.contains("name"))
  }

  test("round trip: serialize then parse is identity on valid rows") {
    val ok = df.select(Serializer.roundTripOk(df, m).as("ok"))
      .as[Boolean].collect()
    assert(ok.forall(identity))
  }

  test("json schema export covers constraints, models, unions") {
    val spec = ModelSpec("thing", Seq(
      FieldSpec("s", StrSpec(minLength = Some(2), pattern = Some("^a"))),
      FieldSpec("n", IntSpec(ge = Some(0), lt = Some(10))),
      FieldSpec("e", EnumSpec(Seq("x", "y"))),
      FieldSpec("opt", NullableSpec(FloatSpec()), required = false)),
      extra = Extra.Forbid)
    val js = JsonSchemaGen.toJson(spec)
    assert(js.contains(""""title": "thing""""))
    assert(js.contains(""""minLength": 2"""))
    assert(js.contains(""""minimum": 0""") && js.contains(""""exclusiveMaximum": 10"""))
    assert(js.contains(""""enum": ["x", "y"]"""))
    assert(js.contains(""""anyOf""""))
    assert(js.contains(""""additionalProperties": false"""))
    assert(js.contains(""""required": ["s", "n", "e"]"""))
    // must be machine-parseable
    spark.range(1).select(
      from_json(lit(js), org.apache.spark.sql.types.DataType.fromDDL(
        "title string, type string")).getField("title")).collect()
  }

  test("pipeline DSL builds the same specs as explicit ADT construction") {
    val viaDsl = model("rec",
      field("name", validateAsStr.strip.minLen(1).toLowerCase),
      field("age", validateAsInt.ge(0).lt(150)),
      field("tag", in("a", "b") | validateAsStr.pattern("^x")))
    assert(viaDsl.field("name").spec ==
      StrSpec(minLength = Some(1), stripWhitespace = true, toLower = true))
    assert(viaDsl.field("age").spec == IntSpec(ge = Some(0), lt = Some(150)))
    assert(viaDsl.field("tag").spec ==
      UnionSpec(Seq(EnumSpec(Seq("a", "b")),
        StrSpec(pattern = Some("^x"))), UnionMode.LeftToRight))
    // and the DSL spec actually validates
    val got = types(viaDsl.field("age").spec,
      org.apache.spark.sql.types.LongType, Seq(5L, -1L, 200L))
    assert(got == Seq(Nil, Seq("greater_than_equal"), Seq("less_than")))
  }
}
