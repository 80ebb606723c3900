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

  test("dumpJson: exclude_unset omits fields whose source is null even with a default (main.py:472-485)") {
    val md = ModelSpec("doc", Seq(
      FieldSpec("id", IntSpec()),
      FieldSpec("name", WithDefaultSpec(StrSpec(), default = "anon"),
        required = false)))
    // unset (null) name WITH exclude_unset -> omitted entirely
    val unset = Serializer.dumpJson(df.filter(col("id") === 2), md,
      DumpSpec(excludeUnset = true)).as[String].head()
    assert(!unset.contains("name"))
    // without exclude_unset the default fills in
    val filled = Serializer.dumpJson(df.filter(col("id") === 2), md)
      .as[String].head()
    assert(filled.contains("\"name\":\"anon\""))
  }

  test("dumpJson: exclude_defaults omits fields equal to their default") {
    val md = ModelSpec("doc", Seq(
      FieldSpec("id", IntSpec()),
      FieldSpec("name", WithDefaultSpec(StrSpec(), default = "alpha"),
        required = false)))
    // id=1 has name="alpha" == default -> omitted; id=2 null -> default
    // "alpha" -> also omitted (value equals default after application)
    val out = Serializer.dumpJson(df, md, DumpSpec(excludeDefaults = true))
      .as[String].collect()
    assert(out.forall(!_.contains("name")))
    // a non-default value survives
    val df2 = Seq((3L, "beta", "s")).toDF("id", "name", "secret")
    val keep = Serializer.dumpJson(df2, md, DumpSpec(excludeDefaults = true))
      .as[String].head()
    assert(keep.contains("\"name\":\"beta\""))
  }

  test("exclude_computed_fields drops computed columns (main.py:480)") {
    val md = ModelSpec("m", Seq(FieldSpec("id", IntSpec())))
    val spec0 = DumpSpec(computed = Seq("y" -> (col("id") * 2)))
    val withC = Serializer.dumpJson(df.limit(1), md, spec0).as[String].head()
    assert(withC.contains("\"y\""))
    val without = Serializer.dumpJson(df.limit(1), md,
      spec0.copy(excludeComputedFields = true)).as[String].head()
    assert(!without.contains("\"y\""))
  }

  test("nested IncEx trees project into structs and arrays (filter.rs; pydantic goldens)") {
    import Serializer.IncEx
    // model: a={b:int,c:str}, d:int, items=[{x:int,y:str}] — goldens from
    // pydantic 2.13 model_dump/model_dump_json with the same IncEx args
    val md = ModelSpec("m", Seq(FieldSpec("a", AnySpec),
      FieldSpec("d", IntSpec()), FieldSpec("items", AnySpec)))
    val dfn = Seq((1L, "z", 7L)).toDF("b", "c", "d")
      .select(struct(col("b"), col("c")).as("a"), col("d"),
        array(struct(lit(1L).as("x"), lit("p").as("y")),
          struct(lit(2L).as("x"), lit("q").as("y"))).as("items"))
    // include={'a': {'b': True}} -> {'a': {'b': 1}}
    val j1 = Serializer.dumpJson(dfn, md, DumpSpec(
      includeTree = Map("a" -> IncEx.tree("b" -> IncEx.Leaf))))
      .as[String].head()
    assert(j1 == """{"a":{"b":1}}""")
    // exclude={'a': {'c': True}, 'd': True} -> a.b + items intact
    val j2 = Serializer.dumpJson(dfn, md, DumpSpec(
      excludeTree = Map("a" -> IncEx.tree("c" -> IncEx.Leaf),
        "d" -> IncEx.Leaf)))
      .as[String].head()
    assert(j2 == """{"a":{"b":1},"items":[{"x":1,"y":"p"},{"x":2,"y":"q"}]}""")
    // include={'items': {'__all__': {'x': True}}} -> per-element projection
    val j3 = Serializer.dumpJson(dfn, md, DumpSpec(
      includeTree = Map("items" -> IncEx.tree("__all__" ->
        IncEx.tree("x" -> IncEx.Leaf)))))
      .as[String].head()
    assert(j3 == """{"items":[{"x":1},{"x":2}]}""")
    // mixed Leaf + Tree include, json mode
    val j4 = Serializer.dumpJson(dfn, md, DumpSpec(
      includeTree = Map("a" -> IncEx.tree("b" -> IncEx.Leaf),
        "d" -> IncEx.Leaf)))
      .as[String].head()
    assert(j4 == """{"a":{"b":1},"d":7}""")
    // dump (python mode): projected struct type, null struct stays null
    val dfNull = Seq(Tuple1(Option.empty[Long])).toDF("pad")
      .select(lit(null).cast("struct<b:bigint,c:string>").as("a"),
        lit(7L).as("d"), lit(null).cast("array<struct<x:bigint,y:string>>")
          .as("items"))
    val pn = Serializer.dump(dfNull, md, DumpSpec(
      includeTree = Map("a" -> IncEx.tree("b" -> IncEx.Leaf))))
    assert(pn.schema("a").dataType.simpleString == "struct<b:bigint>")
    assert(pn.collect().head.isNullAt(0))
  }

  test("IncEx integer sequence indices select elements (filter.rs int keys; " +
    "pydantic goldens)") {
    import Serializer.IncEx
    // items = [{x:0,y:a},{x:1,y:b},{x:2,y:c},{x:3,y:d}]; goldens from a
    // live pydantic run of model_dump with the same include/exclude args
    val md = ModelSpec("m", Seq(FieldSpec("items", AnySpec)))
    val dfn = Seq(Tuple1(1)).toDF("pad").select(
      array((0 until 4).map(i => struct(lit(i.toLong).as("x"),
        lit(('a' + i).toChar.toString).as("y"))): _*).as("items"))
    def dj(spec: DumpSpec): String =
      Serializer.dumpJson(dfn, md, spec).as[String].head()
    // include={'items': {0: True, 2: True}} -> elements 0 and 2
    assert(dj(DumpSpec(includeTree = Map("items" ->
      IncEx.tree("0" -> IncEx.Leaf, "2" -> IncEx.Leaf)))) ==
      """{"items":[{"x":0,"y":"a"},{"x":2,"y":"c"}]}""")
    // include={'items': {-1: True}} -> last element
    assert(dj(DumpSpec(includeTree = Map("items" ->
      IncEx.tree("-1" -> IncEx.Leaf)))) ==
      """{"items":[{"x":3,"y":"d"}]}""")
    // exclude={'items': {0: True}} -> element 0 dropped
    assert(dj(DumpSpec(excludeTree = Map("items" ->
      IncEx.tree("0" -> IncEx.Leaf)))) ==
      """{"items":[{"x":1,"y":"b"},{"x":2,"y":"c"},{"x":3,"y":"d"}]}""")
    // exclude={'items': {'__all__': True}} -> emptied sequence
    assert(dj(DumpSpec(excludeTree = Map("items" ->
      IncEx.tree("__all__" -> IncEx.Leaf)))) == """{"items":[]}""")
    // exclude={'items': {0: True, '__all__': {'y': True}}} -> element 0
    // dropped AND the survivors lose y (matches pydantic exactly)
    assert(dj(DumpSpec(excludeTree = Map("items" ->
      IncEx.tree("0" -> IncEx.Leaf,
        "__all__" -> IncEx.tree("y" -> IncEx.Leaf))))) ==
      """{"items":[{"x":1},{"x":2},{"x":3}]}""")
    // int-key SUBTREES, homogeneous form (round 5; pydantic goldens from
    // a live model_dump_json run with the same args):
    // include={'items': {0: {'x'}}} -> only element 0, projected to x
    assert(dj(DumpSpec(includeTree = Map("items" ->
      IncEx.tree("0" -> IncEx.tree("x" -> IncEx.Leaf))))) ==
      """{"items":[{"x":0}]}""")
    // include={'items': {0: {'x'}, -1: {'x'}}} -> first and last, both x
    assert(dj(DumpSpec(includeTree = Map("items" ->
      IncEx.tree("0" -> IncEx.tree("x" -> IncEx.Leaf),
        "-1" -> IncEx.tree("x" -> IncEx.Leaf))))) ==
      """{"items":[{"x":0},{"x":3}]}""")
    // heterogeneous combinations stay rejected (columnar arrays cannot
    // hold differently-shaped elements): differing subtrees, Leaf mixed
    // with a subtree, subtree beside '__all__' (pydantic UNIONS the
    // projections per element), per-index EXCLUDE subtree
    for (bad <- Seq(
      DumpSpec(includeTree = Map("items" ->
        IncEx.tree("0" -> IncEx.tree("x" -> IncEx.Leaf),
          "1" -> IncEx.tree("y" -> IncEx.Leaf)))),
      DumpSpec(includeTree = Map("items" ->
        IncEx.tree("0" -> IncEx.tree("x" -> IncEx.Leaf),
          "1" -> IncEx.Leaf))),
      DumpSpec(includeTree = Map("items" ->
        IncEx.tree("0" -> IncEx.tree("x" -> IncEx.Leaf),
          "__all__" -> IncEx.tree("y" -> IncEx.Leaf)))),
      DumpSpec(excludeTree = Map("items" ->
        IncEx.tree("0" -> IncEx.tree("y" -> IncEx.Leaf))))))
      assert(intercept[IllegalArgumentException] { dj(bad) }
        .getMessage.contains("heterogeneous"))
  }

  test("exclude_defaults compares in the field's native type (double vs default '1')") {
    val md = ModelSpec("m", Seq(
      FieldSpec("id", IntSpec()),
      FieldSpec("v", WithDefaultSpec(FloatSpec(), default = "1"),
        required = false)))
    // value 1.0 equals default "1" natively (a string compare rendered
    // "1.0" != "1" and never suppressed); 2.5 survives
    val dfd = Seq((1L, 1.0), (2L, 2.5)).toDF("id", "v")
    val out = Serializer.dumpJson(dfd, md, DumpSpec(excludeDefaults = true))
      .as[String].collect()
    assert(!out(0).contains("\"v\""), s"default value not suppressed: ${out(0)}")
    assert(out(1).contains("\"v\":2.5"))
  }

  test("timedeltaIso rolls rounded-up fractions into the larger unit (no PT1M60S)") {
    val out = Seq(119.9999999, 59.9999999, -119.9999999, 3599.9999999)
      .toDF("s")
      .select(Serializer.timedeltaJson(col("s"), "iso8601"))
      .as[String].collect().toSeq
    assert(out == Seq("PT2M", "PT1M", "-PT2M", "PT1H"))
  }

  test("field_serializer with when_used gates (functional_serializers.py:46-52)") {
    import Serializer.FieldSer
    val spec = DumpSpec(fieldSerializers = Map(
      "name" -> FieldSer(c => upper(c), "json"),
      "secret" -> FieldSer(c => concat(lit("<"), c, lit(">")), "unless-none")))
    // json mode: both apply
    val j = Serializer.dumpJson(df.filter(col("id") === 1), m, spec)
      .as[String].head()
    assert(j.contains("\"name\":\"ALPHA\"") && j.contains("\"secret\":\"<s1>\""))
    // python (dump) mode: when_used='json' does NOT apply, unless-none does
    val p = Serializer.dump(df.filter(col("id") === 1), m, spec)
    assert(p.select("name").as[String].head() == "alpha")
    assert(p.select("secret").as[String].head() == "<s1>")
    // unless-none: null input stays null, fn not applied
    val n = Serializer.dump(df.filter(col("id") === 2), m, spec)
    assert(n.select("name").as[String].head() == null)
  }

  test("ser_json_timedelta: iso8601 matches pydantic/speedate rendering (config.rs:121)") {
    val secs = Seq(0.0, 1.5, 93784.0, 345600.0, -90.0, 0.123456, -86399.5)
    val out = secs.toDF("s")
      .select(Serializer.timedeltaJson(col("s"), "iso8601").as("iso"))
      .as[String].collect().toSeq
    // expected strings from pydantic 2.13.4 TypeAdapter(timedelta).dump_json
    assert(out == Seq("PT0S", "PT1.5S", "P1DT2H3M4S", "P4D", "-PT1M30S",
      "PT0.123456S", "-PT23H59M59.5S"))
    val f = Seq(1.5).toDF("s")
      .select(Serializer.timedeltaJson(col("s"), "float")).as[Double].head()
    assert(f == 1.5)
  }

  test("ser_json_bytes: utf8/base64/hex (config.rs:136)") {
    val b = Seq("hi!").toDF("s").select(col("s").cast("binary").as("b"))
    assert(b.select(Serializer.bytesJson(col("b"), "utf8")).as[String].head() == "hi!")
    assert(b.select(Serializer.bytesJson(col("b"), "base64")).as[String].head() == "aGkh")
    assert(b.select(Serializer.bytesJson(col("b"), "hex")).as[String].head() == "686921")
  }

  test("ser_json_inf_nan: null/constants/strings match pydantic (config.rs:142)") {
    val fm = ModelSpec("f", Seq(
      FieldSpec("x", FloatSpec()), FieldSpec("y", FloatSpec()),
      FieldSpec("d", FloatSpec())))
    val fdf = Seq((Double.PositiveInfinity, Double.NaN, 1.5))
      .toDF("x", "y", "d")
    // default = 'null' (pinned against pydantic: {"x":null,"y":null})
    assert(Serializer.dumpJson(fdf, fm).as[String].head() ==
      """{"x":null,"y":null,"d":1.5}""")
    assert(Serializer.dumpJson(fdf, fm,
      DumpSpec(serJsonInfNan = "strings")).as[String].head() ==
      """{"x":"Infinity","y":"NaN","d":1.5}""")
    assert(Serializer.dumpJson(fdf, fm,
      DumpSpec(serJsonInfNan = "constants")).as[String].head() ==
      """{"x":Infinity,"y":NaN,"d":1.5}""")
    // -Infinity too
    val neg = Seq((Double.NegativeInfinity, 0.0, 2.0)).toDF("x", "y", "d")
    assert(Serializer.dumpJson(neg, fm,
      DumpSpec(serJsonInfNan = "constants")).as[String].head() ==
      """{"x":-Infinity,"y":0.0,"d":2.0}""")
    // a STRING field whose value is literally "NaN" is not unquoted
    val sm = ModelSpec("s", Seq(
      FieldSpec("x", FloatSpec()), FieldSpec("s", StrSpec())))
    val sdf = Seq((Double.NaN, "NaN")).toDF("x", "s")
    assert(Serializer.dumpJson(sdf, sm,
      DumpSpec(serJsonInfNan = "constants")).as[String].head() ==
      """{"x":NaN,"s":"NaN"}""")
    // a NESTED string field named like the float field is untouched too
    // (computed struct with inner key "x" holding the literal "NaN")
    val nested = Serializer.dumpJson(sdf, sm, DumpSpec(
      serJsonInfNan = "constants",
      computed = Seq("inner" -> struct(col("s").as("x"))))).as[String].head()
    assert(nested == """{"x":NaN,"s":"NaN","inner":{"x":"NaN"}}""")
    // constants + excludeNone still omits genuinely-null fields
    val ndf = Seq((Option.empty[Double], 2.0)).toDF("x", "y")
    val nm = ModelSpec("n", Seq(
      FieldSpec("x", FloatSpec()), FieldSpec("y", FloatSpec())))
    assert(Serializer.dumpJson(ndf, nm, DumpSpec(
      serJsonInfNan = "constants", excludeNone = true)).as[String].head() ==
      """{"y":2.0}""")
  }

  test("ser_json_temporal: iso8601/seconds/milliseconds pinned vs pydantic (config.rs:150)") {
    import java.sql.{Date, Timestamp}
    val df = Seq(
      (Timestamp.valueOf("2024-03-05 12:30:45.123456"), Date.valueOf("2024-03-05")),
      (Timestamp.valueOf("2024-03-05 12:30:45"), Date.valueOf("2024-03-05")),
      (Timestamp.valueOf("2024-03-05 12:30:45.0001"), Date.valueOf("2024-03-05"))
    ).toDF("ts", "d")
    val iso = df.select(Serializer.datetimeJson(col("ts")).as("s"))
      .as[String].collect()
    // pydantic: fraction only when nonzero, full 6 digits otherwise
    assert(iso(0) == "2024-03-05T12:30:45.123456")
    assert(iso(1) == "2024-03-05T12:30:45")
    assert(iso(2) == "2024-03-05T12:30:45.000100")
    // pydantic: {"d":1709641845.123456, date: 1709596800.0 / x1000}
    val num = df.limit(1).select(
      Serializer.datetimeJson(col("ts"), "seconds").as("a"),
      Serializer.dateJson(col("d"), "seconds").as("b"),
      Serializer.dateJson(col("d"), "milliseconds").as("c"))
      .as[(Double, Double, Double)].head()
    assert(num == ((1709641845.123456, 1709596800.0, 1709596800000.0)))
    // aware datetime appends Z
    assert(df.limit(1).select(Serializer.datetimeJson(col("ts"),
      utcSuffix = true)).as[String].head().endsWith("Z"))
    // time: seconds-of-day 3723.1204 -> "01:02:03.120400" / 3723.x / x1000
    val t = Seq(3723.1204, 3723.0).toDF("t")
    val tout = t.select(Serializer.timeJson(col("t")).as("iso"),
      Serializer.timeJson(col("t"), "milliseconds").as("ms")).collect()
    assert(tout(0).getString(0) == "01:02:03.120400")
    assert(tout(1).getString(0) == "01:02:03")
    assert(tout(0).getDouble(1) == 3723120.4)
    // a fraction that rounds up to a full second rolls over the seconds
    val roll = Seq(3723.9999996).toDF("t")
      .select(Serializer.timeJson(col("t"))).as[String].head()
    assert(roll == "01:02:04")
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

  test("json schema export: named-tuple, dataclass, time/timedelta, recursive $defs (pinned vs pydantic)") {
    // pydantic: {"maxItems":2,"minItems":1,"prefixItems":[...],"type":"array"}
    val nt = JsonSchemaGen.toJson(NamedTupleSpec("Pt", Seq(
      FieldSpec("x", IntSpec()),
      FieldSpec("y", WithDefaultSpec(StrSpec(), default = "d")))))
    assert(nt.contains(""""maxItems": 2""") && nt.contains(""""minItems": 1"""))
    assert(nt.contains(""""prefixItems": [{"type": "integer"}"""))
    // dataclass renders as an object schema like a model
    val dc = JsonSchemaGen.toJson(DataclassSpec("DC", Seq(
      FieldSpec("id", IntSpec()))))
    assert(dc.contains(""""title": "DC"""") && dc.contains(""""type": "object""""))
    assert(JsonSchemaGen.toJson(TimeSpec()) ==
      """{"type": "string", "format": "time"}""")
    assert(JsonSchemaGen.toJson(TimedeltaSpec()) ==
      """{"type": "string", "format": "duration"}""")
    // recursive: {"$defs": {"Cat": {...with $ref inside...}}, "$ref": "#/$defs/Cat"}
    val cat = ModelSpec("Cat", Seq(
      FieldSpec("name", StrSpec()),
      FieldSpec("sub", NullableSpec(RefSpec("Cat")), required = false)))
    val rec = JsonSchemaGen.toJson(DefinitionsSpec(Map("Cat" -> cat), RefSpec("Cat")))
    assert(rec.startsWith("""{"$defs": {"Cat": """))
    assert(rec.endsWith(""""$ref": "#/$defs/Cat"}"""))
    assert(rec.contains("""{"$ref": "#/$defs/Cat"}""")) // the inner self-ref
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
