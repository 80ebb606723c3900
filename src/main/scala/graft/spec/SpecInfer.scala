package graft.spec

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Constraint-spec INFERENCE: profile a (sampled) table and suggest the
 * [[ModelSpec]] that would validate it — the bootstrap step a validation
 * engine needs at 100 TB, where nobody hand-writes specs for 3000-column
 * estates. pydantic has no direct analog (users author models; the closest
 * is `create_model` + datamodel-code-generator's schema-from-data flow);
 * the engine-side contract is: `infer(sample)` produces a spec whose
 * compiled validation ACCEPTS the sample (zero violations — pinned by
 * SpecInferSpec), and whose JSON Schema export round-trips through
 * [[JsonSchemaReader]], so inferred specs are first-class citizens of the
 * registry flow.
 *
 * Decision rules (deterministic, so the DuckDB oracle `i_infer` replays
 * them exactly):
 *  - dtype → kind: string→str, integral→int, fractional→float,
 *    boolean→bool, date→date, timestamp→datetime, decimal→decimal;
 *  - a string column with `0 < distinct ≤ enumMaxDistinct` → enum of the
 *    sorted observed values;
 *  - a non-enum string column whose every non-null value full-matches a
 *    pattern from [[patterns]] (priority order, Java-regex ∩ RE2 so both
 *    engines agree) gets that pattern as its suggested constraint;
 *  - numeric columns get observed [min, max] as suggested ge/le bounds;
 *  - a column with observed nulls wraps in [[NullableSpec]].
 *
 * Scale shape: the heavy work is one hash-aggregate pass over the sample
 * (exact `count(DISTINCT)` expands the scan |cols|-fold — that is what
 * "exact" costs; pass `approx = true` for HyperLogLog++ distinct counts
 * and no enum-value extraction when profiling beyond sample scale), plus
 * one second tiny aggregate collecting the values of enum CANDIDATES only
 * (state bounded by enumMaxDistinct per column — never the corpus; a text
 * column can never reach it). The two 1-row collects are bounded by the
 * column count, not the data. Inference is defined over a SAMPLE by
 * construction — the suggested bounds are what the sample supports, and
 * validating the full table against them is exactly the drift signal the
 * engine's checks quantify.
 */
object SpecInfer {

  /** Suggested-pattern table, tried in order; first pattern matching ALL
   * non-null values wins. Anchored full-match, Java-regex ∩ RE2. */
  val patterns: Seq[(String, String)] = Seq(
    "uuid" ->
      "\\A[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\\z",
    "int_string" -> "\\A-?[0-9]+\\z",
    "decimal_string" -> "\\A-?[0-9]+\\.[0-9]+\\z",
    "email" -> "\\A[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\z",
    "json_object" -> "\\A\\{.*\\}\\z")

  private def kindOf(dt: DataType): String = dt match {
    case StringType => "str"
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType => "float"
    case BooleanType => "bool"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "datetime"
    case _: DecimalType => "decimal"
    case _ => "other"
  }

  /** One collected stats row + enum-candidate values. Internal core shared
   * by [[profile]] (renders rows) and [[infer]] (builds specs). */
  private def gather(df: DataFrame, enumMaxDistinct: Int, approx: Boolean)
      : (Seq[ColStats], Long) = {
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__total")) ++
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(f.name)
        val nd =
          if (approx) approx_count_distinct(c).as(s"__nd_$i")
          else count_distinct(c).as(s"__nd_$i")
        val base = Seq(count(c).as(s"__nn_$i"), nd)
        val typed = kindOf(f.dataType) match {
          case "str" =>
            Seq(min(length(c)).cast(LongType).as(s"__minl_$i"),
              max(length(c)).cast(LongType).as(s"__maxl_$i")) ++
              patterns.zipWithIndex.map { case ((_, re), j) =>
                sum(when(c.rlike(re), 1L).otherwise(0L)).as(s"__pm_${i}_$j")
              }
          case "int" | "float" | "decimal" =>
            Seq(min(c).cast(DoubleType).as(s"__mn_$i"),
              max(c).cast(DoubleType).as(s"__mx_$i"))
          case _ => Nil
        }
        base ++ typed
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head() // bounded: ONE row
    val total = r.getAs[Long]("__total")
    def optL(n: String): Option[Long] =
      if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Long](n))
    def optD(n: String): Option[Double] =
      if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))

    val pre = fields.zipWithIndex.map { case (f, i) =>
      val kind0 = kindOf(f.dataType)
      val nn = r.getAs[Long](s"__nn_$i")
      val nd = r.getAs[Long](s"__nd_$i")
      val isEnum = kind0 == "str" && !approx && nd > 0 && nd <= enumMaxDistinct
      val pat =
        if (kind0 == "str" && !isEnum && nn > 0)
          patterns.zipWithIndex.collectFirst {
            case ((nm, _), j) if r.getAs[Long](s"__pm_${i}_$j") == nn => nm
          }
        else None
      ColStats(f.name, if (isEnum) "enum" else kind0,
        nNull = total - nn, nDistinct = nd,
        minLen = if (kind0 == "str") optL(s"__minl_$i") else None,
        maxLen = if (kind0 == "str") optL(s"__maxl_$i") else None,
        minNum = if (Set("int", "float", "decimal")(kind0)) optD(s"__mn_$i")
          else None,
        maxNum = if (Set("int", "float", "decimal")(kind0)) optD(s"__mx_$i")
          else None,
        enumVals = None, pattern = pat)
    }
    // second pass, enum candidates only: collect_set state is bounded by
    // enumMaxDistinct values per column (we already KNOW nd ≤ the cap)
    val cand = pre.filter(_.kind == "enum").map(_.field)
    val stats =
      if (cand.isEmpty) pre
      else {
        val evRow = df.select(cand.map(n =>
          sort_array(collect_set(col(n).cast(StringType))).as(n)): _*).head()
        pre.map { s =>
          if (s.kind == "enum")
            s.copy(enumVals = Some(evRow.getSeq[String](evRow.fieldIndex(s.field))))
          else s
        }
      }
    (stats, total)
  }

  final case class ColStats(field: String, kind: String, nNull: Long,
      nDistinct: Long, minLen: Option[Long], maxLen: Option[Long],
      minNum: Option[Double], maxNum: Option[Double],
      enumVals: Option[Seq[String]], pattern: Option[String])

  private val profileSchema = StructType(Seq(
    StructField("field", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("nullable", BooleanType, nullable = false),
    StructField("n_null", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_len", LongType, nullable = true),
    StructField("max_len", LongType, nullable = true),
    StructField("min_num", DoubleType, nullable = true),
    StructField("max_num", DoubleType, nullable = true),
    StructField("enum_vals", StringType, nullable = true),
    StructField("pattern", StringType, nullable = true)))

  /** Per-field inference profile as a DataFrame — the oracle-checkable
   * rendering of the decision table (one row per input column). */
  def profile(df: DataFrame, enumMaxDistinct: Int = 16,
              approx: Boolean = false): DataFrame = {
    val (stats, _) = gather(df, enumMaxDistinct, approx)
    val rows = stats.map { s =>
      Row(s.field, s.kind, s.nNull > 0, s.nNull, s.nDistinct,
        s.minLen.map(Long.box).orNull, s.maxLen.map(Long.box).orNull,
        s.minNum.map(Double.box).orNull, s.maxNum.map(Double.box).orNull,
        s.enumVals.map(_.mkString(",")).orNull, s.pattern.orNull)
    }
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, profileSchema)
  }

  /** Suggested model: compiled validation of `df` itself yields ZERO
   * violations (SpecInferSpec pins this self-consistency property). */
  def infer(df: DataFrame, name: String = "inferred",
            enumMaxDistinct: Int = 16): ModelSpec = {
    val (stats, _) = gather(df, enumMaxDistinct, approx = false)
    val fields = stats.map { s =>
      val inner: Spec = s.kind match {
        case "enum" => EnumSpec(s.enumVals.getOrElse(Nil))
        case "str" => StrSpec(minLength = s.minLen.map(_.toInt),
          maxLength = s.maxLen.map(_.toInt),
          pattern = s.pattern.map(n => patterns.toMap.apply(n)))
        case "int" => IntSpec(ge = s.minNum.map(_.toLong),
          le = s.maxNum.map(_.toLong))
        case "float" | "decimal" => FloatSpec(ge = s.minNum, le = s.maxNum)
        case "bool" => BoolSpec()
        case "date" => DateSpec()
        case "datetime" => DatetimeSpec()
        case _ => AnySpec
      }
      FieldSpec(s.field, if (s.nNull > 0) NullableSpec(inner) else inner)
    }
    ModelSpec(name, fields)
  }
}
