package graft.spec

/**
 * JSON Schema export — `model_json_schema` parity
 * (reference: `pydantic/main.py:604-640`, generator
 * `pydantic/json_schema.py:350-448`, per-kind methods `:620-2196`).
 *
 * Pure Scala (no Spark): walks the Spec ADT and emits a draft-2020-12-style
 * schema document the way pydantic does for the equivalent model. Only the
 * kinds our engine supports are emitted; Python-runtime-only kinds don't
 * exist in the ADT.
 */
object JsonSchemaGen {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")

  private def str(s: String): String = s""""${esc(s)}""""

  private def defaulted(s: Spec): Boolean = s match {
    case _: WithDefaultSpec => true
    case NullableSpec(inner) => defaulted(inner)
    case _ => false
  }

  def toJson(spec: Spec): String = spec match {
    case s: StrSpec =>
      obj(Seq("type" -> str("string")) ++
        s.minLength.map(v => "minLength" -> v.toString) ++
        s.maxLength.map(v => "maxLength" -> v.toString) ++
        s.pattern.map(p => "pattern" -> str(p)))
    case s: IntSpec =>
      obj(Seq("type" -> str("integer")) ++
        s.gt.map(v => "exclusiveMinimum" -> v.toString) ++
        s.ge.map(v => "minimum" -> v.toString) ++
        s.lt.map(v => "exclusiveMaximum" -> v.toString) ++
        s.le.map(v => "maximum" -> v.toString) ++
        s.multipleOf.map(v => "multipleOf" -> v.toString))
    case s: FloatSpec =>
      obj(Seq("type" -> str("number")) ++
        s.gt.map(v => "exclusiveMinimum" -> v.toString) ++
        s.ge.map(v => "minimum" -> v.toString) ++
        s.lt.map(v => "exclusiveMaximum" -> v.toString) ++
        s.le.map(v => "maximum" -> v.toString) ++
        s.multipleOf.map(v => "multipleOf" -> v.toString))
    case _: BoolSpec => obj(Seq("type" -> str("boolean")))
    case s: DecimalSpec =>
      obj(Seq("anyOf" -> s"[${obj(Seq("type" -> str("number")))}, ${obj(Seq("type" -> str("string")))}]"))
    case _: DateSpec => obj(Seq("type" -> str("string"), "format" -> str("date")))
    case _: DatetimeSpec => obj(Seq("type" -> str("string"), "format" -> str("date-time")))
    case s: BytesSpec =>
      obj(Seq("type" -> str("string"), "format" -> str("binary")) ++
        s.minLength.map(v => "minLength" -> v.toString) ++
        s.maxLength.map(v => "maxLength" -> v.toString))
    case s: UuidSpec => obj(Seq("type" -> str("string"), "format" -> str("uuid")))
    // IPvAny* __get_pydantic_json_schema__ (networks.py:1203,1244,1283)
    case IpSpec(kind) =>
      obj(Seq("type" -> str("string"), "format" -> str(s"ipvany$kind")))
    case s: UrlSpec =>
      obj(Seq("type" -> str("string"), "format" -> str("uri"),
        "minLength" -> "1") ++ s.maxLength.map(v => "maxLength" -> v.toString))
    case LiteralSpec(vs) =>
      obj(Seq("enum" -> vs.map(str).mkString("[", ", ", "]")))
    case EnumSpec(vs) =>
      obj(Seq("enum" -> vs.map(str).mkString("[", ", ", "]")))
    case NoneSpec => obj(Seq("type" -> str("null")))
    case AnySpec => "{}"
    case NullableSpec(inner) =>
      obj(Seq("anyOf" -> s"[${toJson(inner)}, ${obj(Seq("type" -> str("null")))}]"))
    case WithDefaultSpec(inner, default, _, _) =>
      // pydantic inlines `default` next to the inner schema
      val innerJson = toJson(inner)
      val d = s""""${esc(default)}""""
      if (innerJson == "{}") obj(Seq("default" -> d))
      else innerJson.dropRight(1) + s""", "default": $d}"""
    case ChainSpec(steps) => toJson(steps.last)
    case CustomErrorSpec(inner, _, _) => toJson(inner)
    case JsonSpec(_, inner, _) =>
      obj(Seq("type" -> str("string"),
        "contentMediaType" -> str("application/json")))
    case UnionSpec(choices, _) =>
      obj(Seq("anyOf" -> choices.map(toJson).mkString("[", ", ", "]")))
    case TaggedUnionSpec(disc, choices) =>
      obj(Seq(
        "oneOf" -> choices.map(p => toJson(p._2)).mkString("[", ", ", "]"),
        "discriminator" -> obj(Seq("propertyName" -> str(disc)))))
    case s: ListSpec =>
      obj(Seq("type" -> str("array"), "items" -> toJson(s.item)) ++
        s.minLength.map(v => "minItems" -> v.toString) ++
        s.maxLength.map(v => "maxItems" -> v.toString))
    case s: SetSpec =>
      obj(Seq("type" -> str("array"), "items" -> toJson(s.item),
        "uniqueItems" -> "true") ++
        s.minLength.map(v => "minItems" -> v.toString) ++
        s.maxLength.map(v => "maxItems" -> v.toString))
    case s: DictSpec =>
      obj(Seq("type" -> str("object"),
        "additionalProperties" -> toJson(s.value)))
    case m: ModelSpec =>
      val props = m.fields.map(f => s""""${esc(f.name)}": ${toJson(f.spec)}""")
        .mkString("{", ", ", "}")
      // pydantic: a field with a default is NOT in `required`, matching
      // the validator (which fills the default when the key is absent)
      val req = m.fields.filter(f => f.required && !defaulted(f.spec))
        .map(f => str(f.name)).mkString("[", ", ", "]")
      obj(Seq(
        "title" -> str(m.name),
        "type" -> str("object"),
        "properties" -> props,
        "required" -> req) ++
        (if (m.extra == Extra.Forbid) Seq("additionalProperties" -> "false")
         else Nil))
    case s: TupleSpec if s.suffix.nonEmpty =>
      // post-variadic tuples: pydantic flattens to prefixItems with the
      // variadic rendered INLINE as an array schema and pins min/maxItems
      // to the total position count (TypeAdapter(tuple[int, *tuple[str,
      // ...], int, bool]).json_schema())
      val total = s.items.size + 1 + s.suffix.size
      val flat = s.items.map(toJson) ++
        Seq(obj(Seq("items" -> toJson(s.variadic.get),
          "type" -> str("array")))) ++ s.suffix.map(toJson)
      obj(Seq("maxItems" -> total.toString, "minItems" -> total.toString,
        "prefixItems" -> flat.mkString("[", ", ", "]"),
        "type" -> str("array")))
    case s: TupleSpec =>
      // draft-2020-12 prefixItems, like pydantic for tuple[...] types
      obj(Seq("type" -> str("array"),
        "prefixItems" -> s.items.map(toJson).mkString("[", ", ", "]")) ++
        s.variadic.map(v => "items" -> toJson(v)) ++
        (if (s.variadic.isEmpty)
          Seq("minItems" -> s.items.size.toString,
            "maxItems" -> s.items.size.toString)
        else s.minLength.map(v => "minItems" -> v.toString).toSeq ++
          s.maxLength.map(v => "maxItems" -> v.toString)))
    case _: TimeSpec =>
      obj(Seq("type" -> str("string"), "format" -> str("time")))
    // pydantic: TypeAdapter(complex).json_schema() == {'type': 'string'};
    // Fraction adds format 'fraction'
    case ComplexSpec => obj(Seq("type" -> str("string")))
    case _: FractionSpec =>
      obj(Seq("format" -> str("fraction"), "type" -> str("string")))
    case _: TimedeltaSpec =>
      obj(Seq("type" -> str("string"), "format" -> str("duration")))
    case s: NamedTupleSpec =>
      // pydantic: prefixItems per field, minItems = required (no-default)
      // count, maxItems = field count
      val required = s.fields.count(f => f.required && !defaulted(f.spec))
      obj(Seq(
        "maxItems" -> s.fields.size.toString,
        "minItems" -> required.toString,
        "prefixItems" -> s.fields.map(f => toJson(f.spec))
          .mkString("[", ", ", "]"),
        "type" -> str("array")))
    case dc: DataclassSpec =>
      // same object schema as a model (pydantic renders dataclasses so)
      toJson(ModelSpec(dc.name, dc.fields, dc.extra))
    case DefinitionsSpec(defs, root, _) =>
      // pydantic: {"$defs": {...}, <root, usually a $ref>} — refs stay
      // symbolic here (no unrolling; JSON Schema is natively recursive)
      val d = defs.toSeq.sortBy(_._1)
        .map { case (n, sp) => s""""${esc(n)}": ${toJson(sp)}""" }
        .mkString("{", ", ", "}")
      val rootBody = toJson(root).drop(1).dropRight(1).trim
      if (rootBody.isEmpty) s"""{"$$defs": $d}"""
      else s"""{"$$defs": $d, $rootBody}"""
    case RefSpec(name) =>
      obj(Seq("$ref" -> str(s"#/$$defs/$name")))
    // function validators wrap/replace inner schemas — pydantic emits the
    // handler schema (or {} for plain, which is opaque)
    case FunctionBeforeSpec(_, inner, _) => toJson(inner)
    case FunctionAfterSpec(inner, _) => toJson(inner)
    case FunctionWrapSpec(inner, _) => toJson(inner)
    case _: FunctionPlainSpec => "{}"
    case _: PredicateSpec | _: CheckSpec => "{}"
    case _: ExtensionSpec => "{}"
  }
}
