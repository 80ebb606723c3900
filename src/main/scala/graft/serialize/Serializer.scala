package graft.serialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.spec.ModelSpec

/**
 * Serialization — the engine's `model_dump` / `model_dump_json`
 * (reference: `pydantic/main.py:469-601` -> `SchemaSerializer.to_python/
 * to_json`, type serializers in `pydantic-core/src/serializers/`).
 *
 * Columnar mapping (SURVEY §2.4):
 *  - include/exclude        -> column pruning (Catalyst prunes the scan too)
 *  - by_alias               -> `.alias(serialization_alias)`
 *  - computed fields        -> derived columns (`@computed_field`,
 *                              `pydantic/fields.py:1693-1713`)
 *  - exclude_none           -> `to_json` ignoreNullFields (per-record field
 *                              omission, exactly pydantic's exclude_none)
 *  - mode=json              -> `to_json(struct(...))` one codegen'd
 *                              projection; round_trip = write + re-read
 */
object Serializer {

  /** Per-model serialization options — FieldInfo's serialization surface
   * (`exclude`, `serialization_alias`) plus call-level include/exclude
   * (`main.py:472-485`). */
  final case class DumpSpec(
      include: Option[Seq[String]] = None,
      exclude: Set[String] = Set.empty,
      byAlias: Map[String, String] = Map.empty,
      computed: Seq[(String, Column)] = Nil,
      excludeNone: Boolean = false)

  /** The serialized projection: model fields filtered by include/exclude,
   * renamed by alias, plus computed fields — in model field order like the
   * reference (fields serialize in definition order). */
  def dumpColumns(model: ModelSpec, spec: DumpSpec = DumpSpec()): Seq[Column] = {
    val kept = model.fields.map(_.name)
      .filter(n => spec.include.forall(_.contains(n)))
      .filterNot(spec.exclude.contains)
    kept.map(n => col(n).as(spec.byAlias.getOrElse(n, n))) ++
      spec.computed.map { case (n, c) => c.as(n) }
  }

  /** `model_dump` analog: typed projection. */
  def dump(df: DataFrame, model: ModelSpec, spec: DumpSpec = DumpSpec()): DataFrame =
    df.select(dumpColumns(model, spec): _*)

  /** `model_dump_json` analog: one JSON string column per row.
   * excludeNone maps to ignoreNullFields (pydantic's exclude_none). */
  def dumpJson(df: DataFrame, model: ModelSpec, spec: DumpSpec = DumpSpec(),
               outCol: String = "json"): DataFrame =
    df.select(to_json(
      struct(dumpColumns(model, spec): _*),
      Map("ignoreNullFields" -> spec.excludeNone.toString)).as(outCol))

  /** Round-trip check column: serialize then re-parse equals the
   * projection (pydantic `round_trip=True`). */
  def roundTripOk(df: DataFrame, model: ModelSpec): Column = {
    val s = struct(dumpColumns(model): _*)
    val dt = df.select(s.as("__s")).schema("__s").dataType
    from_json(to_json(s), dt) === s
  }
}
