package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/**
 * Field lookup by alias — the engine's LookupTree
 * (reference: `pydantic/aliases.py` AliasPath/AliasChoices;
 * `pydantic-core/src/lookup_key.rs`, consumed at `model_fields.rs:108`).
 *
 * Flat aliases (AliasChoices) are plain column-name fallbacks; AliasPath
 * navigates nested structs and array indices ("data", "0", "name" ==
 * AliasPath('data', 0, 'name')). Resolution happens at compile time
 * against the static schema — a path that doesn't fit the schema simply
 * doesn't match (like the reference's lookup miss), falling through to
 * the next choice or a `missing` violation.
 */
object AliasResolver {

  /** Resolve `path` starting from a struct type; `root` turns the first
   * segment into a Column (top-level column or struct getField). */
  def resolve(st: StructType, root: String => Column,
              path: Seq[String]): Option[(Column, DataType)] = {
    if (path.isEmpty) return None
    val head = path.head
    if (!st.fieldNames.contains(head)) return None
    walk(root(head), st(head).dataType, path.tail)
  }

  private def walk(c: Column, dt: DataType,
                   rest: Seq[String]): Option[(Column, DataType)] =
    rest match {
      case Seq() => Some((c, dt))
      case seg +: tail =>
        dt match {
          case s: StructType if s.fieldNames.contains(seg) =>
            walk(c.getField(seg), s(seg).dataType, tail)
          case ArrayType(et, _) if seg.forall(_.isDigit) =>
            // 0-based like AliasPath integer segments; `get` (unlike
            // getItem) nulls out-of-bounds instead of throwing under ANSI
            walk(org.apache.spark.sql.functions.get(c,
              org.apache.spark.sql.functions.lit(seg.toInt)), et, tail)
          case _ => None
        }
    }
}
