package graft.spec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Schema-evolution diff between two inference profiles
 * ([[SpecInfer.profile]] outputs) — the CI-for-schemas half of the
 * SpecInfer loop: infer the spec of yesterday's snapshot and today's,
 * diff them, gate the pipeline on `breaking`.
 *
 * Semantics mirror what "breaking" means for a validator (pydantic's
 * model-evolution question: does data that validated before still
 * validate?): a change is BREAKING when the constraint set NARROWS —
 * a field removed, its kind changed, nullability revoked, length/numeric
 * bounds tightened, enum values removed, or the inferred pattern changed
 * (incomparable regexes are conservatively breaking). Widenings (new
 * field, nullability granted, bounds loosened, enum values added) are
 * compatible. Reasons are emitted as a fixed-order comma-joined tag list
 * so the oracle replay is string-exact.
 *
 * Scale: inputs are one row per COLUMN (profile outputs), so the
 * full-outer join is metadata-sized regardless of table scale.
 */
object SpecDiff {

  def profileDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = Seq("field", "kind", "nullable", "min_len", "max_len",
      "min_num", "max_num", "enum_vals", "pattern")
    val l = a.select(cols.map(c => col(c).as(s"a_$c")): _*)
    val r = b.select(cols.map(c => col(c).as(s"b_$c")): _*)
    val j = l.join(r, col("a_field") === col("b_field"), "full_outer")

    def nz(c: Column) = coalesce(c, lit(false))
    val fKind = nz(col("a_kind") =!= col("b_kind"))
    val fNullNar = nz(col("a_nullable") && !col("b_nullable"))
    val fNullWid = nz(!col("a_nullable") && col("b_nullable"))
    val fLenNar = nz(col("b_min_len") > col("a_min_len")) ||
      nz(col("b_max_len") < col("a_max_len"))
    val fLenWid = nz(col("b_min_len") < col("a_min_len")) ||
      nz(col("b_max_len") > col("a_max_len"))
    val fNumNar = nz(col("b_min_num") > col("a_min_num")) ||
      nz(col("b_max_num") < col("a_max_num"))
    val fNumWid = nz(col("b_min_num") < col("a_min_num")) ||
      nz(col("b_max_num") > col("a_max_num"))
    val aE = split(col("a_enum_vals"), ",")
    val bE = split(col("b_enum_vals"), ",")
    val bothE = col("a_enum_vals").isNotNull && col("b_enum_vals").isNotNull
    val fEnumRem = nz(bothE && size(array_except(aE, bE)) > 0)
    val fEnumAdd = nz(bothE && size(array_except(bE, aE)) > 0)
    val fPat = !(col("a_pattern") <=> col("b_pattern"))

    val anyCh = fKind || fNullNar || fNullWid || fLenNar || fLenWid ||
      fNumNar || fNumWid || fEnumRem || fEnumAdd || fPat
    val status = when(col("a_field").isNull, "added")
      .when(col("b_field").isNull, "removed")
      .when(anyCh, "changed").otherwise("same")
    val breaking = when(status === "removed", 1)
      .when(status === "added", 0)
      .otherwise((fKind || fNullNar || fLenNar || fNumNar || fEnumRem ||
        fPat).cast("int"))
    val reasons = when(status === "changed", concat_ws(",",
      when(fKind, "kind"),
      when(fNullNar, "nullable_narrowed"), when(fNullWid, "nullable_widened"),
      when(fLenNar, "len_narrowed"), when(fLenWid, "len_widened"),
      when(fNumNar, "num_narrowed"), when(fNumWid, "num_widened"),
      when(fEnumRem, "enum_removed"), when(fEnumAdd, "enum_added"),
      when(fPat, "pattern")))

    j.select(coalesce(col("a_field"), col("b_field")).as("field"),
      status.as("status"), col("a_kind").as("kind_a"),
      col("b_kind").as("kind_b"), breaking.as("breaking"),
      reasons.as("reasons"))
  }
}
