package graft.spec

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * JSON Schema import — the inverse of [[JsonSchemaGen]], so constraint
 * models can be DEFINED as data (a schema registry, a config file, a
 * pydantic `model_json_schema()` dump) and compiled to Catalyst without
 * touching Scala. pydantic's own analog is validation-schema construction
 * from `__get_pydantic_core_schema__` trees; here the interchange format
 * is draft-2020-12 JSON Schema, the format the EXPORTER emits — so
 * `fromJson(toJson(spec))` round-trips to an equivalent spec, pinned by
 * the export→import→export fixpoint property test.
 *
 * Documented lossy corners (the schema language is smaller than the ADT):
 *  - `enum` imports as [[EnumSpec]] (a [[LiteralSpec]] export is
 *    indistinguishable — same validation semantics, different error type);
 *  - decimal's `anyOf [number, string]` imports as the equivalent union;
 *  - `complex` (`{"type":"string"}`) imports as a plain string spec;
 *  - named tuples / dataclasses import as the structurally-equal
 *    tuple / model; tagged-union tags recover from choice `title`s
 *    (model choices) or positional indices otherwise;
 *  - function validators / predicates export opaquely (`{}`) and cannot
 *    be reconstructed — they import as [[AnySpec]].
 */
object JsonSchemaReader {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): Spec = read(mapper.readTree(json))

  private def optInt(n: JsonNode, k: String): Option[Int] =
    Option(n.get(k)).map(_.asInt)
  private def optLong(n: JsonNode, k: String): Option[Long] =
    Option(n.get(k)).map(_.asLong)
  private def optDouble(n: JsonNode, k: String): Option[Double] =
    Option(n.get(k)).map(_.asDouble)
  private def optText(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).map(_.asText)
  private def without(n: JsonNode, keys: String*): JsonNode = {
    val c = n.deepCopy[ObjectNode]()
    keys.foreach(c.remove)
    c
  }
  private def isNullType(n: JsonNode): Boolean =
    n.isObject && n.size == 1 && optText(n, "type").contains("null")

  def read(n: JsonNode): Spec = {
    require(n.isObject, s"schema node must be an object, got: $n")

    // $defs wraps everything else (including a $ref root alongside it)
    if (n.has("$defs")) {
      val defs = n.get("$defs").properties().asScala
        .map(e => e.getKey -> read(e.getValue)).toMap
      val rest = without(n, "$defs")
      val root = if (rest.isEmpty) AnySpec else read(rest)
      return DefinitionsSpec(defs, root)
    }
    optText(n, "$ref") match {
      case Some(r) =>
        return RefSpec(r.stripPrefix("#/$defs/"))
      case None =>
    }
    // a `default` sibling wraps the rest in WithDefault (exporter inlines)
    if (n.has("default"))
      return WithDefaultSpec(read(without(n, "default")),
        n.get("default").asText)

    if (n.has("anyOf")) {
      val cs = n.get("anyOf").elements().asScala.toSeq
      return cs match {
        case Seq(inner, nul) if isNullType(nul) => NullableSpec(read(inner))
        case _ => UnionSpec(cs.map(read))
      }
    }
    if (n.has("oneOf") && n.has("discriminator")) {
      val disc = n.get("discriminator").get("propertyName").asText
      val cs = n.get("oneOf").elements().asScala.toSeq.zipWithIndex.map {
        case (c, i) => optText(c, "title").getOrElse(i.toString) -> read(c)
      }
      return TaggedUnionSpec(disc, cs)
    }
    if (n.has("enum"))
      return EnumSpec(n.get("enum").elements().asScala.map(_.asText).toSeq)

    optText(n, "type") match {
      case Some("string") =>
        optText(n, "format") match {
          case Some("date") => DateSpec()
          case Some("date-time") => DatetimeSpec()
          case Some("time") => TimeSpec()
          case Some("duration") => TimedeltaSpec()
          case Some("uuid") => UuidSpec()
          case Some("uri") => UrlSpec(maxLength = optInt(n, "maxLength"))
          case Some("fraction") => FractionSpec()
          case Some("ipvanyaddress") => IpSpec("address")
          case Some("ipvanyinterface") => IpSpec("interface")
          case Some("ipvanynetwork") => IpSpec("network")
          case Some("binary") => BytesSpec(minLength = optInt(n, "minLength"),
            maxLength = optInt(n, "maxLength"))
          case _ if optText(n, "contentMediaType")
            .contains("application/json") => JsonSpec("string")
          case _ => StrSpec(minLength = optInt(n, "minLength"),
            maxLength = optInt(n, "maxLength"),
            pattern = optText(n, "pattern"))
        }
      case Some("integer") =>
        IntSpec(gt = optLong(n, "exclusiveMinimum"),
          ge = optLong(n, "minimum"), lt = optLong(n, "exclusiveMaximum"),
          le = optLong(n, "maximum"), multipleOf = optLong(n, "multipleOf"))
      case Some("number") =>
        FloatSpec(gt = optDouble(n, "exclusiveMinimum"),
          ge = optDouble(n, "minimum"), lt = optDouble(n, "exclusiveMaximum"),
          le = optDouble(n, "maximum"),
          multipleOf = optDouble(n, "multipleOf"))
      case Some("boolean") => BoolSpec()
      case Some("null") => NoneSpec
      case Some("array") =>
        val item = Option(n.get("items")).map(read)
        if (n.has("prefixItems")) {
          val items = n.get("prefixItems").elements().asScala.toSeq.map(read)
          if (item.isEmpty)
            TupleSpec(items) // min/maxItems implied by the head size
          else
            TupleSpec(items, variadic = item,
              minLength = optInt(n, "minItems"),
              maxLength = optInt(n, "maxItems"))
        } else if (Option(n.get("uniqueItems")).exists(_.asBoolean))
          SetSpec(item.getOrElse(AnySpec), optInt(n, "minItems"),
            optInt(n, "maxItems"))
        else
          ListSpec(item.getOrElse(AnySpec), optInt(n, "minItems"),
            optInt(n, "maxItems"))
      case Some("object") if n.has("properties") =>
        val reqd = Option(n.get("required")).map(
          _.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty)
        val fields = n.get("properties").properties().asScala.toSeq.map {
          e =>
            val spec = read(e.getValue)
            val defaulted = spec.isInstanceOf[WithDefaultSpec]
            FieldSpec(e.getKey, spec,
              required = reqd.contains(e.getKey) || defaulted)
        }
        val extra = if (Option(n.get("additionalProperties"))
            .exists(v => v.isBoolean && !v.asBoolean)) Extra.Forbid
          else Extra.Ignore
        ModelSpec(optText(n, "title").getOrElse("model"), fields, extra)
      case Some("object") =>
        Option(n.get("additionalProperties")) match {
          case Some(v) if v.isObject => DictSpec(value = read(v))
          case _ => DictSpec()
        }
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported type: $other")
      case None => AnySpec // {} — opaque (function validators, Any)
    }
  }
}
