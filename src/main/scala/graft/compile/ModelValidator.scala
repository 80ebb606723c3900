package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import Violations.{T, oneS, collect, merge}

/**
 * The row operator applied to a whole table — the engine's equivalent of
 * `SchemaValidator.validate_python` looped over records
 * (`pydantic-core/src/validators/mod.rs:183-211`), except it is ONE Catalyst
 * projection over the Dataset: every field's coercion + checks + the
 * violation bundle evaluate in a single whole-stage-codegen pass, no
 * per-record interpreter.
 *
 * Top-level fields are compiled flat (no struct wrapping) so Catalyst's
 * column pruning sees exactly which physical columns each check touches.
 */
object ModelValidator {

  val VIOLATIONS = "violations"
  val VALID = "valid"

  /** Add coerced field columns, the `violations` bundle and a `valid` flag.
   * Keeps every original column (callers prune). */
  def plan(df: DataFrame, model: ModelSpec): DataFrame = {
    val st = df.schema
    val present = st.fieldNames.toSet
    val results: Seq[(String, Column, Column)] = model.fields.map { f =>
      val floc = array(lit(f.name))
      val hit: Option[(Column, DataType)] =
        (f.name +: f.aliases).find(present.contains)
          .map(src => (col(src), st(src).dataType))
          .orElse(f.aliasPaths.iterator
            .flatMap(pth => AliasResolver.resolve(st, col, pth))
            .nextOption())
      hit match {
        case None =>
          if (f.required && !nullTolerant(f.spec))
            (f.name, lit(null).cast(StringType),
              collect(Seq(oneS(floc, T.missing, "Field required", lit(null)))))
          else {
            val c = Compiler.compile(lit(null).cast(StringType), StringType,
              floc, f.spec, model.mode)
            (f.name, c.value, c.violations)
          }
        case Some((col0, srcType)) =>
          val c = Compiler.compile(col0, srcType, floc, f.spec,
            model.mode)
          val (value, viols) =
            if (f.required && !nullTolerant(f.spec))
              (when(col0.isNotNull, c.value),
                when(col0.isNull, collect(Seq(oneS(floc, T.missing,
                  "Field required", lit(null))))).otherwise(c.violations))
            else (c.value, c.violations)
          (f.name, value, viols)
      }
    }
    val extraChecks: Seq[Column] = model.extra match {
      case Extra.Forbid =>
        val known = model.fields.flatMap(f => f.name +: f.aliases).toSet
        st.fieldNames.filterNot(known.contains).toSeq.map { ex =>
          when(col(ex).isNotNull,
            oneS(array(lit(ex)), T.extraForbidden,
              "Extra inputs are not permitted", col(ex)))
        }
      case Extra.Ignore => Nil
    }
    val fieldBundle = merge(results.map(_._3) :+ collect(extraChecks))
    // model-level (cross-field) checks — @model_validator(mode='after'):
    // predicates see the COERCED field struct, errors land at the model
    // root (loc = (), the reference's root-model loc) as value_error with
    // the raw input row as JSON; gated on clean field validation exactly
    // like pydantic (after-model validators are not called when field
    // errors exist).
    val bundle =
      if (model.modelChecks.isEmpty) fieldBundle
      else {
        val coerced = struct(results.map { case (n, v, _) => v.as(n) }: _*)
        val rawRow = to_json(struct(st.fieldNames.toSeq.map(col): _*))
        val checks = model.modelChecks.map { ck =>
          when(size(fieldBundle) === 0 &&
              !coalesce(ck.pred(coerced), lit(false)),
            oneS(array().cast("array<string>"), T.valueError,
              s"Value error, ${ck.msg}", rawRow, Map("error" -> ck.msg)))
        }
        merge(Seq(fieldBundle, collect(checks)))
      }
    // ONE projection: coerced values + bundle all reference the ORIGINAL
    // input columns (a withColumn chain would shadow them) and stay in a
    // single whole-stage-codegen stage.
    val fieldNames = model.fields.map(_.name).toSet
    val passthrough = st.fieldNames.filterNot(fieldNames.contains).toSeq.map(col)
    df.select(passthrough ++
      results.map { case (n, v, _) => v.as(n) } :+
      bundle.as(VIOLATIONS): _*)
      .withColumn(VALID, size(col(VIOLATIONS)) === 0)
  }

  /**
   * Scale path for models with a heavy list-of-struct field (e.g. the
   * north-star `websites`): scalar fields validate in the usual codegen'd
   * projection, while list ELEMENTS validate through posexplode + a second
   * projection, re-aggregated per row key.
   *
   * Why: the inline path evaluates element specs through array
   * higher-order functions — CodegenFallback, interpreted per element —
   * and a complex element model merged into the row projection blows the
   * 64KB codegen method limit, ejecting even the SCALAR checks from
   * codegen. Splitting restores codegen for the scalars and halves total
   * work (measured 1.8x on the north-star model at 0.5M rows). Only
   * VIOLATING elements shuffle (filtered before the groupBy), so the
   * exchange carries violation structs, not documents.
   *
   * Differences vs inline (documented): element violations append after
   * scalar-field violations (sorted by element index), and the output is
   * slim — key + coerced scalar fields + bundles; the raw list column is
   * not carried through (it would drag the array through the join
   * exchange and re-merge the >64KB projection via CollapseProject).
   */
  def planExplodedList(df: DataFrame, model: ModelSpec, keyCol: String,
                       listField: String): DataFrame = {
    val st = df.schema
    val f = model.field(listField)
    val (itemSpec, minL, maxL) = f.spec match {
      case ListSpec(item, mn, mx, _) => (item, mn, mx)
      case SetSpec(item, mn, mx) => (item, mn, mx)
      case other => throw new IllegalArgumentException(
        s"planExplodedList needs a List/Set field, got $other")
    }
    val elemType = st(listField).dataType.asInstanceOf[ArrayType].elementType
    // Keep a stub entry for the list field (AnySpec, not required) so that
    // under Extra.Forbid the still-present list column counts as a KNOWN
    // field, not extra_forbidden; its real checks live below. The stub's
    // value column is immediately projected away, so Catalyst never carries
    // the array past this select.
    val scalarModel = model.copy(fields = model.fields.map(f0 =>
      if (f0.name == listField) f0.copy(spec = AnySpec, required = false)
      else f0))
    val scalarFieldNames =
      scalarModel.fields.map(_.name).filterNot(_ == listField)

    // row-local list checks (computed while the list column is in scope,
    // folded into the scalar bundle): required/missing — same semantics as
    // the inline plan() path — plus min/max size.
    val lcol = col(listField)
    val sizeChecks = collect(Seq(
      (if (f.required)
        Some(when(lcol.isNull,
          oneS(array(lit(listField)), T.missing, "Field required", lit(null))))
      else None),
      minL.map(n => when(lcol.isNotNull && size(lcol) < n,
        oneS(array(lit(listField)), T.tooShort,
          s"List should have at least $n item${if (n == 1) "" else "s"} after validation, not fewer",
          lcol, Map("min_length" -> n.toString)))),
      maxL.map(n => when(lcol.isNotNull && size(lcol) > n,
        oneS(array(lit(listField)), T.tooLong,
          s"List should have at most $n item${if (n == 1) "" else "s"} after validation, not more",
          lcol, Map("max_length" -> n.toString))))
    ).flatten)

    val scalar = plan(df, scalarModel).select(
      (keyCol +: scalarFieldNames).distinct.map(col) :+
        concat(col(VIOLATIONS), sizeChecks).as(VIOLATIONS): _*)

    // element pass: explode -> validate -> keep violators only
    val eloc = concat(array(lit(listField)), array(col("__pos").cast("string")))
    val compiled = Compiler.compile(col("__elem"), elemType, eloc, itemSpec,
      model.mode)
    val elemViols = df
      .select(col(keyCol).as("__k"),
        posexplode(col(listField)).as(Seq("__pos", "__elem")))
      .select(col("__k"), col("__pos"), compiled.violations.as("__v"))
      .filter(size(col("__v")) > 0)
      .groupBy("__k")
      .agg(collect_list(struct(col("__pos"), col("__v"))).as("__pv"))
      // deterministic element order despite shuffle: sort the (tiny,
      // violators-only) aggregated array by element index. sort_array
      // can't order structs containing maps; a comparator lambda can.
      .select(col("__k"),
        flatten(transform(
          array_sort(col("__pv"),
            (a, b) => a.getField("__pos") - b.getField("__pos")),
          p => p.getField("__v"))).as("__ev"))

    scalar.join(elemViols, scalar(keyCol) === elemViols("__k"), "left")
      .drop("__k")
      .withColumn(VIOLATIONS,
        concat(col(VIOLATIONS), coalesce(col("__ev"), Violations.empty)))
      .drop("__ev")
      .withColumn(VALID, size(col(VIOLATIONS)) === 0)
  }

  /** Rough expression-weight of a spec tree — how many compiled nodes it
   * expands to. Used to decide when a list field's element spec is heavy
   * enough that the inline HOF path would (a) run interpreted and (b) push
   * the row projection over the 64KB codegen method limit. */
  def specWeight(s: Spec): Int = s match {
    case m: ModelSpec => 1 + m.fields.map(f => specWeight(f.spec)).sum
    case TaggedUnionSpec(_, cs) => 1 + cs.map(p => specWeight(p._2)).sum
    // Smart unions compile every branch strict+lax
    case UnionSpec(cs, UnionMode.Smart) => 1 + 2 * cs.map(specWeight).sum
    case UnionSpec(cs, _) => 1 + cs.map(specWeight).sum
    case NullableSpec(i) => 1 + specWeight(i)
    case WithDefaultSpec(i, _, _, _) => 1 + specWeight(i)
    case ChainSpec(ss) => 1 + ss.map(specWeight).sum
    case CustomErrorSpec(i, _, _) => 1 + specWeight(i)
    case ListSpec(i, _, _, _) => 1 + specWeight(i)
    case SetSpec(i, _, _) => 1 + specWeight(i)
    case DictSpec(k, v, _, _) => 1 + specWeight(k) + specWeight(v)
    case tu: TupleSpec => 1 + tu.items.map(specWeight).sum +
      tu.variadic.map(specWeight).getOrElse(0)
    case FunctionBeforeSpec(_, i, _) => 1 + specWeight(i)
    case FunctionAfterSpec(i, _) => 1 + specWeight(i)
    case FunctionWrapSpec(i, _) => 1 + specWeight(i)
    case JsonSpec(_, i, _) => 1 + i.map(specWeight(_)).getOrElse(0)
    case nt: NamedTupleSpec => 1 + nt.fields.map(f => specWeight(f.spec)).sum
    case dc: DataclassSpec => 1 + dc.fields.map(f => specWeight(f.spec)).sum
    // weigh the UNROLLED tree — that is what compiles
    case d: DefinitionsSpec =>
      specWeight(graft.spec.Definitions.unroll(d.root, d.defs, d.maxUnroll))
    case _ => 1
  }

  /**
   * [[plan]] with automatic scale routing: a list/set field whose ELEMENT
   * spec weighs >= `explodeThreshold` nodes validates through the exploded
   * path ([[planExplodedList]]) instead of inline HOFs — callers no longer
   * need to know the scale path exists. `keyCol` must uniquely identify
   * rows (the exploded violations re-join on it). Only the heaviest
   * qualifying list field explodes (one join); others stay inline.
   */
  def planAuto(df: DataFrame, model: ModelSpec, keyCol: String,
               explodeThreshold: Int = 8): DataFrame = {
    val present = df.schema.fieldNames.toSet
    val candidates = model.fields.flatMap { f =>
      val itemW = f.spec match {
        case ListSpec(item, _, _, _) => Some(specWeight(item))
        case SetSpec(item, _, _) => Some(specWeight(item))
        case _ => None
      }
      itemW.collect {
        case w if w >= explodeThreshold && present.contains(f.name) &&
          df.schema(f.name).dataType.isInstanceOf[ArrayType] => (f.name, w)
      }
    }
    if (candidates.isEmpty) plan(df, model)
    else planExplodedList(df, model, keyCol, candidates.maxBy(_._2)._1)
  }

  /** Validated projection: model fields only (extras dropped, like
   * `extra='ignore'`), plus verdict columns. */
  def validate(df: DataFrame, model: ModelSpec): DataFrame = {
    val planned = plan(df, model)
    planned.select(
      (model.fields.map(f => col(f.name)) :+ col(VIOLATIONS) :+ col(VALID)): _*)
  }

  /** Violation sink: one row per violation — the exploded analog of
   * `ValidationError.errors()` (`validation_exception.rs:507-520`).
   * `keyCols` identify the offending row. */
  def violations(df: DataFrame, model: ModelSpec, keyCols: Seq[String]): DataFrame = {
    val planned = plan(df, model)
    planned
      .filter(size(col(VIOLATIONS)) > 0)
      .select(keyCols.map(col) :+ explode(col(VIOLATIONS)).as("v"): _*)
      .select(keyCols.map(col) ++ Seq(
        col("v.loc").as("loc"),
        col("v.type").as("type"),
        col("v.msg").as("msg"),
        col("v.input").as("input"),
        col("v.ctx").as("ctx")): _*)
  }

  private def nullTolerant(s: Spec): Boolean = s match {
    case _: NullableSpec | _: WithDefaultSpec | NoneSpec | AnySpec => true
    case ChainSpec(steps) => steps.headOption.exists(nullTolerant)
    case UnionSpec(cs, _) => cs.exists(nullTolerant)
    case _ => false
  }
}
