package graft.spec

import org.apache.spark.sql.Column

/**
 * Function (custom) validators — the engine's user-extension surface,
 * mirroring the reference's Before/After/Plain/Wrap validators
 * (`pydantic/functional_validators.py:30,91,158,258`; engine
 * `pydantic-core/src/validators/function.rs`) and the experimental
 * pipeline's `predicate`/`transform`/`eq`/`not_eq`/`in_`/`not_in`
 * (`pydantic/experimental/pipeline.py:129,237,271-279`).
 *
 * Columnar translation: a user "function" is a `Column => Column`
 * expression builder — it runs INSIDE whole-stage codegen, per row, with
 * no serialization boundary (the closure builds the expression tree once
 * at compile time; nothing user-side executes per row). A Scala-lambda UDF
 * escape hatch exists via `org.apache.spark.sql.functions.udf` — the
 * caller wraps it in a Column fn (`c => myUdf(c)`) — but expression
 * builders should be the default: a UDF is an opaque box Catalyst can
 * neither push down nor fuse.
 *
 * Error mapping (reference `errors/types.rs:312-315`): a failed check
 * raises `ValueError` in pydantic and surfaces as `value_error` with
 * message "Value error, {error}". In the columnar world functions cannot
 * raise, so checks are declared as predicates ([[PredicateSpec]] /
 * [[CheckSpec]]) and transforms are total ([[FunctionBeforeSpec]] /
 * [[FunctionAfterSpec]] / [[FunctionPlainSpec]]); [[FunctionWrapSpec]]
 * sees the inner result and may rewrite both value and violations.
 *
 * These specs live outside Spec.scala because they carry Spark `Column`
 * functions — the rest of the ADT stays pure data.
 */

/** Model-level (cross-field) check — the columnar
 * `@model_validator(mode="after")` (`pydantic/functional_validators.py:
 * 651-679`, executed by `validators/function.rs`): `pred` sees the
 * COERCED model struct (all fields at once); returning false raises the
 * reference's ValueError shape — loc `()` (model root), type
 * `value_error`, msg `"Value error, {msg}"`, ctx.error, input = the raw
 * input struct rendered as JSON. Faithful gating: pydantic only calls
 * after-model validators when every FIELD validated cleanly, so a model
 * check never fires beside field violations. */
final case class ModelCheck(name: String, pred: Column => Column,
    msg: String)

/** mode='before' — transform the RAW input, then validate with `inner`
 * (`functional_validators.py:30` BeforeValidator). `outDdl` declares the
 * transform's output type (Spark DDL, e.g. "STRING"); None = unchanged. */
final case class FunctionBeforeSpec(
    fn: Column => Column,
    inner: Spec,
    outDdl: Option[String] = None
) extends ExtensionSpec

/** mode='after' — validate with `inner`, then transform the validated
 * value (`functional_validators.py:91` AfterValidator). The transform must
 * preserve the inner output type (pydantic after-validators return the
 * field type; a type-changing transform belongs in a Plain validator). */
final case class FunctionAfterSpec(inner: Spec, fn: Column => Column)
    extends ExtensionSpec

/** mode='plain' — the function REPLACES validation
 * (`functional_validators.py:158` PlainValidator). `outDdl` = output type. */
final case class FunctionPlainSpec(fn: Column => Column, outDdl: String)
    extends ExtensionSpec

/** What a wrap validator sees: the raw input, the inner-validated value,
 * the inner violation bundle, and the loc path — the columnar analog of
 * `(value, handler)` where calling the handler yields
 * (validated, violations). */
final case class WrapCtx(
    input: Column,
    validated: Column,
    violations: Column,
    loc: Column)

/** mode='wrap' — full control around the inner validator
 * (`functional_validators.py:258` WrapValidator): the function returns the
 * (value, violations) pair, e.g. swallowing inner errors and substituting
 * a fallback, or adding post-hoc checks. Must preserve the inner output
 * type and the violations bundle type. */
final case class FunctionWrapSpec(inner: Spec, fn: WrapCtx => (Column, Column))
    extends ExtensionSpec

/** Named predicate over the CURRENT value — pipeline `predicate()`
 * (`experimental/pipeline.py:605-621`): failure emits
 * `predicate_failed` / "Predicate '{name}' failed". Null input passes
 * (upstream specs own null handling). Value passes through unchanged. */
final case class PredicateSpec(pred: Column => Column, name: String)
    extends ExtensionSpec

/** Unnamed check — the pipeline's `_check_func` (`pipeline.py:405-415`):
 * failure raises ValueError(f"Expected {desc}") which renders as
 * `value_error` / "Value error, Expected {desc}". Backs `eq/not_eq/in_/
 * not_in` and any constraint the typed specs don't cover. */
final case class CheckSpec(pred: Column => Column, desc: String) extends ExtensionSpec
