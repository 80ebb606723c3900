package graft.serialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec.{ModelSpec, NullableSpec, Spec, WithDefaultSpec}

/**
 * Serialization — the engine's `model_dump` / `model_dump_json`
 * (reference: `pydantic/main.py:469-601` -> `SchemaSerializer.to_python/
 * to_json`, type serializers in `pydantic-core/src/serializers/`).
 *
 * Columnar mapping (SURVEY §2.4):
 *  - include/exclude          -> column pruning (Catalyst prunes the scan too)
 *  - by_alias                 -> `.alias(serialization_alias)`
 *  - computed fields          -> derived columns (`@computed_field`,
 *                                `pydantic/fields.py:1693-1713`)
 *  - exclude_none             -> `to_json` ignoreNullFields (per-record field
 *                                omission, exactly pydantic's exclude_none)
 *  - exclude_unset            -> field null BEFORE default application =>
 *                                omitted ("provided" == source non-null —
 *                                the columnar notion of fields_set;
 *                                `main.py:472-485`). JSON mode only: a
 *                                relational projection cannot drop a column
 *                                per row.
 *  - exclude_defaults         -> value equal to the field default => omitted
 *                                (JSON mode only, same reason)
 *  - field_serializer         -> per-field Column fn with `when_used` modes
 *                                always | unless-none | json |
 *                                json-unless-none
 *                                (`functional_serializers.py:20-230`)
 *  - ser_json_timedelta/bytes -> [[timedeltaJson]] / [[bytesJson]]
 *                                (`serializers/config.rs:121-138`)
 *  - ser_json_inf_nan         -> DumpSpec.serJsonInfNan: null | constants |
 *                                strings (`serializers/config.rs:142-143`)
 *  - mode=json                -> `to_json(struct(...))` one codegen'd
 *                                projection; round_trip = write + re-read
 */
object Serializer {

  /** Per-field serializer — `@field_serializer` + its `when_used` gate
   * (`functional_serializers.py:46-52`). */
  final case class FieldSer(fn: Column => Column, whenUsed: String = "always")

  /** Nested include/exclude tree — pydantic's IncEx
   * (`pydantic/main.py:79`, applied by `pydantic-core/src/serializers/
   * filter.rs`): `model_dump(include={'a': {'b': True}})`. `Leaf` is the
   * python `True` (take/drop the whole field); `Tree` recurses into a
   * nested struct's children. Applied to an array-of-struct field, a
   * `Tree` projects EVERY element (`{'__all__': sub}` is honored too —
   * an `__all__` key's subtree applies per element; integer sequence
   * indices are a documented non-goal: a columnar projection is
   * per-field, not per-row-position). */
  sealed trait IncEx extends Serializable
  object IncEx {
    case object Leaf extends IncEx
    final case class Tree(children: Map[String, IncEx]) extends IncEx
    /** convenience: Tree from (name -> subtree) pairs */
    def tree(kvs: (String, IncEx)*): Tree = Tree(kvs.toMap)
  }

  /** Per-model serialization options — FieldInfo's serialization surface
   * plus call-level include/exclude/exclude_* (`main.py:472-485`). */
  final case class DumpSpec(
      include: Option[Seq[String]] = None,
      exclude: Set[String] = Set.empty,
      /** Nested IncEx trees (supersede `include` when non-empty; an
       * `excludeTree` entry of `Leaf` equals a flat `exclude` entry).
       * Sub-`Tree`s require the dump call to receive the DataFrame (the
       * projection needs the struct schema) — `dump`/`dumpJson` pass it. */
      includeTree: Map[String, IncEx] = Map.empty,
      excludeTree: Map[String, IncEx] = Map.empty,
      byAlias: Map[String, String] = Map.empty,
      computed: Seq[(String, Column)] = Nil,
      excludeNone: Boolean = false,
      excludeUnset: Boolean = false,
      excludeDefaults: Boolean = false,
      /** `exclude_computed_fields` (`main.py:480,503`): drop every
       * computed column from the dump. */
      excludeComputedFields: Boolean = false,
      fieldSerializers: Map[String, FieldSer] = Map.empty,
      /** `ser_json_inf_nan` (`serializers/config.rs:142-143`):
       * 'null' (reference default: nonfinite floats render as JSON null) |
       * 'strings' ("Infinity"/"-Infinity"/"NaN" quoted) |
       * 'constants' (bare Infinity/NaN tokens — invalid JSON, like the
       * reference). Applies to top-level float fields of the dump. */
      serJsonInfNan: String = "null")

  /** The field's declared default, if any (top-level or under Nullable). */
  private def defaultOf(spec: Spec): Option[String] = spec match {
    case WithDefaultSpec(_, d, _, _) => Some(d)
    case NullableSpec(inner) => defaultOf(inner)
    case _ => None
  }

  /** One serialized field value: default application, field serializer
   * (gated by when_used), exclude_unset/exclude_defaults nulling (the
   * nulls become omissions under ignoreNullFields in JSON mode). */
  private def serValue(model: ModelSpec, n: String, spec: DumpSpec,
                       json: Boolean): Column = {
    val base = col(n)
    val dflt = model.fields.find(_.name == n).flatMap(f => defaultOf(f.spec))
    val withDefault = dflt.map(d => coalesce(base, lit(d))).getOrElse(base)
    val served = spec.fieldSerializers.get(n) match {
      case Some(FieldSer(fn, whenUsed)) =>
        val applies = whenUsed match {
          case "always" | "unless-none" => true
          case "json" | "json-unless-none" => json
          case other => throw new IllegalArgumentException(
            s"when_used must be always|unless-none|json|json-unless-none, got $other")
        }
        if (!applies) withDefault
        else if (whenUsed.endsWith("unless-none"))
          when(withDefault.isNotNull, fn(withDefault))
        else fn(withDefault)
      case None => withDefault
    }
    // NATIVE-typed default comparison: the analyzer coerces the string
    // default literal to the field's type (a DoubleType field with default
    // "1" suppresses value 1.0 — a cast-to-string compare rendered "1.0"
    // != "1" and never suppressed)
    val v1 =
      if (spec.excludeDefaults && dflt.isDefined)
        when(withDefault === lit(dflt.get), lit(null)).otherwise(served)
      else served
    if (spec.excludeUnset) when(base.isNotNull, v1) else v1
  }

  // ------------------------------------------------------ nested IncEx

  /** Some((subInclude, subExclude)) when child `name` survives the pair. */
  private def keptChild(name: String, inc: Option[Map[String, IncEx]],
                        exc: Map[String, IncEx])
      : Option[(Option[Map[String, IncEx]], Map[String, IncEx])] = {
    val incChild = inc.map(_.get(name))
    if (incChild.exists(_.isEmpty)) None // include tree defined, child absent
    else if (exc.get(name).contains(IncEx.Leaf)) None // excluded outright
    else {
      val si = incChild.flatten match {
        case Some(IncEx.Tree(m)) => Some(m)
        case _ => None
      }
      val se = exc.get(name) match {
        case Some(IncEx.Tree(m)) => m
        case _ => Map.empty[String, IncEx]
      }
      Some((si, se))
    }
  }

  /** For arrays: an `__all__` subtree applies per element (filter.rs's
   * sequence key); otherwise the maps project each element directly. */
  private def elementTrees(inc: Option[Map[String, IncEx]],
                           exc: Map[String, IncEx])
      : (Option[Map[String, IncEx]], Map[String, IncEx]) = {
    val si = inc match {
      case Some(m) if m.contains("__all__") => m("__all__") match {
        case IncEx.Tree(t) => Some(t)
        case IncEx.Leaf => None
      }
      case other => other
    }
    val se = exc.get("__all__") match {
      case Some(IncEx.Tree(t)) => t
      case _ => exc
    }
    (si, se)
  }

  private val IntKeyRe = "\\A-?[0-9]+\\z".r

  /** Sequence-index keys (`filter.rs` int keys, `{0: ..., -1: ...}`) —
   * written as string-ints in the engine's string-keyed trees. Returns
   * (intInclude, intExclude, dropAll, subInclude, subExclude): int keys
   * SELECT elements by position (negative = from the end), `__all__` ->
   * Leaf in exclude empties the sequence, and the remaining keys project
   * each kept element as before.
   *
   * Int-key SUBTREES (round 5): supported when the rebuilt element type
   * stays HOMOGENEOUS — every include int key maps to the SAME subtree
   * (then only int-selected elements survive and all project under it,
   * `include={'items': {0: {'i'}, -1: {'i'}}}` -> `[{i..},{i..}]`,
   * matching the pydantic golden exactly). Heterogeneous combinations
   * stay rejected with a typed error, because columnar arrays cannot
   * hold differently-SHAPED elements: differing per-index subtrees,
   * Leaf mixed with subtrees, an int subtree beside `__all__`/field keys
   * (pydantic UNIONS the two projections per element), and per-index
   * EXCLUDE subtrees (the reference strips a field from one element
   * only). */
  private def splitElementKeys(inc: Option[Map[String, IncEx]],
                               exc: Map[String, IncEx])
      : (Map[Int, IncEx], Map[Int, IncEx], Boolean,
         Option[Map[String, IncEx]], Map[String, IncEx]) = {
    def ints(m: Map[String, IncEx]): Map[Int, IncEx] =
      m.collect { case (k, v) if IntKeyRe.matches(k) => k.toInt -> v }
    val (ii, ie) = (inc.map(ints).getOrElse(Map.empty), ints(exc))
    ie.foreach { case (k, v) =>
      if (v != IncEx.Leaf) throw new IllegalArgumentException(
        s"IncEx integer index $k in EXCLUDE must map to Leaf (True): a " +
          "per-index exclude subtree strips fields from SOME elements " +
          "only — heterogeneous, columnar arrays cannot type it")
    }
    val intSub: Option[Map[String, IncEx]] =
      ii.values.toSeq.distinct match {
        case Seq() | Seq(IncEx.Leaf) => None // none, or pure positional
        case Seq(IncEx.Tree(m)) =>
          if (inc.exists(_.keys.exists(k => !IntKeyRe.matches(k))))
            throw new IllegalArgumentException(
              "IncEx integer-index subtrees cannot mix with '__all__' or " +
                "field keys in the same include map: pydantic unions the " +
                "projections per element — heterogeneous, columnar arrays " +
                "cannot type it")
          Some(m)
        case _ => throw new IllegalArgumentException(
          "IncEx integer indices must all map to the SAME subtree (or all " +
            "to Leaf): differing per-index projections are heterogeneous " +
            "— columnar arrays cannot type it; use '__all__'")
      }
    val dropAll = exc.get("__all__").contains(IncEx.Leaf)
    // an include map holding ONLY int keys is pure positional selection —
    // it must not project element fields away (Some(empty) would)
    val (si0, se) = elementTrees(
      inc.map(_.filterNot(kv => IntKeyRe.matches(kv._1)))
        .filterNot(m => m.isEmpty && ii.nonEmpty),
      exc.filterNot(kv => IntKeyRe.matches(kv._1)))
    (ii, ie, dropAll, intSub.orElse(si0), se)
  }

  /** The data type [[projectIncEx]] produces for `dt` under (inc, exc). */
  private def projectedType(dt: DataType, inc: Option[Map[String, IncEx]],
                            exc: Map[String, IncEx]): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.flatMap { f =>
        keptChild(f.name, inc, exc).map { case (si, se) =>
          StructField(f.name, projectedType(f.dataType, si, se), f.nullable)
        }
      })
    case ArrayType(et, n) =>
      val (_, _, _, si, se) = splitElementKeys(inc, exc)
      ArrayType(projectedType(et, si, se), n)
    case other => other
  }

  /** Recursive nested-struct projection under an IncEx pair — one codegen'd
   * expression per field (struct rebuild / per-element transform), no UDF. */
  private def projectIncEx(c: Column, dt: DataType,
                           inc: Option[Map[String, IncEx]],
                           exc: Map[String, IncEx]): Column = dt match {
    case st: StructType =>
      val kept = st.fields.toSeq.flatMap { f =>
        keptChild(f.name, inc, exc).map { case (si, se) =>
          projectIncEx(c.getField(f.name), f.dataType, si, se).as(f.name)
        }
      }
      // a null struct stays null (not a struct of nulls), like pydantic
      when(c.isNull, lit(null).cast(projectedType(dt, inc, exc)))
        .otherwise(struct(kept: _*))
    case ArrayType(et, _) =>
      val (intInc, intExc, dropAll, si, se) = splitElementKeys(inc, exc)
      if (dropAll) array().cast(ArrayType(projectedType(et, si, se)))
      else if (intInc.isEmpty && intExc.isEmpty)
        transform(c, x => projectIncEx(x, et, si, se))
      else {
        // positional selection (filter.rs int keys): keep element i iff
        // (no include map with int keys, OR i selected, OR '__all__'
        // included) AND i not excluded; negative keys count from the end.
        // Rebuild = mark (keep, projected) -> filter -> unwrap; the HOF
        // chain is serializer-path only (validation stays codegen'd).
        def matches(keys: Iterable[Int], i: Column): Column =
          keys.map(k => if (k >= 0) i === k else i === size(c) + k)
            .reduceOption(_ || _).getOrElse(lit(false))
        val allIncluded = inc.exists(_.contains("__all__"))
        val marked = transform(c, (x, i) => struct(
          ((lit(intInc.isEmpty || allIncluded) || matches(intInc.keys, i)) &&
            !matches(intExc.keys, i)).as("k"),
          projectIncEx(x, et, si, se).as("v")))
        transform(filter(marked, e => e.getField("k")),
          e => e.getField("v"))
      }
    case _ => c
  }

  /** The serialized projection: model fields filtered by include/exclude
   * (flat sets or nested IncEx trees), renamed by alias, plus computed
   * fields — in model field order like the reference (fields serialize in
   * definition order). `schema` (the source DataFrame's) is required only
   * when a nested sub-`Tree` must project into a struct field. */
  def dumpColumns(model: ModelSpec, spec: DumpSpec = DumpSpec(),
                  json: Boolean = false,
                  schema: Option[StructType] = None): Seq[Column] = {
    val kept = model.fields.map(_.name)
      .filter(n => if (spec.includeTree.nonEmpty) spec.includeTree.contains(n)
                   else spec.include.forall(_.contains(n)))
      .filterNot(n => spec.exclude.contains(n) ||
        spec.excludeTree.get(n).contains(IncEx.Leaf))
    kept.map { n =>
      val served = serValue(model, n, spec, json)
      val si = spec.includeTree.get(n) match {
        case Some(IncEx.Tree(m)) => Some(m)
        case _ => None
      }
      val se = spec.excludeTree.get(n) match {
        case Some(IncEx.Tree(m)) => m
        case _ => Map.empty[String, IncEx]
      }
      val out = if (si.isDefined || se.nonEmpty) {
        val dt = schema.getOrElse(throw new IllegalArgumentException(
          s"nested IncEx on '$n' needs the source schema — use dump/dumpJson"))
          .apply(n).dataType
        projectIncEx(served, dt, si, se)
      } else served
      out.as(spec.byAlias.getOrElse(n, n))
    } ++ (if (spec.excludeComputedFields) Nil
          else spec.computed.map { case (n, c) => c.as(n) })
  }

  /** `model_dump` analog: typed projection (mode='python'). exclude_unset/
   * exclude_defaults surface as NULLs here — a relational row cannot omit
   * a column (documented deviation). */
  def dump(df: DataFrame, model: ModelSpec, spec: DumpSpec = DumpSpec()): DataFrame =
    df.select(dumpColumns(model, spec, json = false, Some(df.schema)): _*)

  /** `model_dump_json` analog: one JSON string column per row. Fields
   * nulled by exclude_none/exclude_unset/exclude_defaults are omitted from
   * the rendered object, exactly like pydantic. */
  def dumpJson(df: DataFrame, model: ModelSpec, spec: DumpSpec = DumpSpec(),
               outCol: String = "json"): DataFrame = {
    val ignoreNulls =
      spec.excludeNone || spec.excludeUnset || spec.excludeDefaults
    // ser_json_inf_nan: Spark's to_json natively QUOTES nonfinite doubles
    // ("NaN"/"Infinity"/"-Infinity") — exactly the reference's 'strings'
    // mode. 'null' pre-nulls nonfinite values; 'constants' renders bare
    // Infinity/NaN tokens (invalid JSON, faithfully mirroring pydantic)
    // by assembling the object from per-field fragments. Top-level float
    // fields only; with excludeNone/Unset/Defaults set, a 'null'-mode
    // nonfinite field is omitted rather than rendered null (documented
    // deviation).
    val probe = df.select(dumpColumns(model, spec, json = true,
      Some(df.schema)): _*)
    val floatFields = probe.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(_.name)
    val adjusted: Seq[Column] = probe.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      if (floatFields.contains(f.name) && spec.serJsonInfNan == "null")
        when(isnan(c) || abs(c) === lit(Double.PositiveInfinity),
          lit(null).cast(f.dataType)).otherwise(c).as(f.name)
      else c.as(f.name)
    }
    val out = spec.serJsonInfNan match {
      case "null" | "strings" =>
        to_json(struct(adjusted: _*),
          Map("ignoreNullFields" -> ignoreNulls.toString))
      case "constants" =>
        // Rebuild the object from PER-FIELD to_json fragments so the bare
        // Infinity/NaN tokens are swapped in only for the actual top-level
        // float fields — a nested or string field that happens to be named
        // like one, or to contain "NaN", is untouched. Field order and
        // number rendering are to_json's own (one field per fragment).
        val frags = probe.schema.fields.toSeq.map { f =>
          val c = col(f.name)
          val std = regexp_replace(
            to_json(struct(c.as(f.name)),
              Map("ignoreNullFields" -> ignoreNulls.toString)),
            "^\\{|\\}$", "")
          val frag =
            if (floatFields.contains(f.name)) {
              val key = lit("\"" + f.name + "\":")
              when(isnan(c), concat(key, lit("NaN")))
                .when(c === lit(Double.PositiveInfinity),
                  concat(key, lit("Infinity")))
                .when(c === lit(Double.NegativeInfinity),
                  concat(key, lit("-Infinity")))
                .otherwise(std)
            } else std
          nullif(frag, lit("")) // omitted fields -> null, skipped by concat_ws
        }
        concat(lit("{"), concat_ws(",", frags: _*), lit("}"))
      case other => throw new IllegalArgumentException(
        s"ser_json_inf_nan must be null|constants|strings, got $other")
    }
    probe.select(out.as(outCol))
  }

  /** Round-trip check column: serialize then re-parse equals the
   * projection (pydantic `round_trip=True`). */
  def roundTripOk(df: DataFrame, model: ModelSpec): Column = {
    val s = struct(dumpColumns(model): _*)
    val dt = df.select(s.as("__s")).schema("__s").dataType
    from_json(to_json(s), dt) === s
  }

  // ---------------------------------------------- type-level ser modes

  /** `ser_json_timedelta` (`serializers/config.rs:121`): 'iso8601' (the
   * speedate rendering pydantic emits — "PT1.5S", "P1DT2H3M4S", "P4D",
   * "-PT1M30S", zero -> "PT0S") or 'float' (total seconds). Input is the
   * engine's timedelta value column (total seconds, DoubleType). */
  def timedeltaJson(totalSeconds: Column, mode: String = "iso8601"): Column =
    mode match {
      case "float" => totalSeconds.cast(DoubleType)
      case "iso8601" => timedeltaIso(totalSeconds).cast(StringType)
      case other => throw new IllegalArgumentException(
        s"ser_json_timedelta must be iso8601|float, got $other")
    }

  /** speedate `Duration::to_string`: absolute-value decomposition with a
   * leading '-' for negatives, zero units omitted, fractional seconds
   * trimmed of trailing zeros, 'PT0S' for zero. Every unit derives from
   * ONE rounded total-microseconds value (like [[timeJson]]) so a fraction
   * that rounds up to a full second/minute rolls into the larger unit —
   * 119.9999999s renders 'PT2M', never the invalid 'PT1M60S'. */
  def timedeltaIso(totalSeconds: Column): Column = {
    val totalMicro = round(abs(totalSeconds) * 1e6).cast(LongType)
    // Column `/` is double division — decompose with exact integer
    // arithmetic: subtract the remainder first so the division is over an
    // exact multiple (bit-exact for any duration under 2^53 microseconds)
    def idiv(x: Column, y: Long): Column =
      ((x - x % y) / y).cast(LongType)
    val d = idiv(totalMicro, 86400000000L)
    val h = idiv(totalMicro % 86400000000L, 3600000000L)
    val m = idiv(totalMicro % 3600000000L, 60000000L)
    val micro = totalMicro % 60000000L // microseconds within the minute
    val sWhole = idiv(micro, 1000000L)
    val frac = micro % 1000000L
    val sStr = when(frac > 0,
      concat(sWhole.cast(StringType), lit("."),
        regexp_replace(lpad(frac.cast(StringType), 6, "0"), "0+$", "")))
      .otherwise(sWhole.cast(StringType))
    val body = concat(
      when(d > 0, concat(d.cast(StringType), lit("D"))).otherwise(lit("")),
      when(h > 0 || m > 0 || micro > 0, lit("T")).otherwise(lit("")),
      when(h > 0, concat(h.cast(StringType), lit("H"))).otherwise(lit("")),
      when(m > 0, concat(m.cast(StringType), lit("M"))).otherwise(lit("")),
      when(micro > 0, concat(sStr, lit("S"))).otherwise(lit("")))
    when(totalSeconds.isNull, lit(null).cast(StringType))
      .when(totalMicro === 0, lit("PT0S"))
      .otherwise(concat(
        when(totalSeconds < 0, lit("-")).otherwise(lit("")),
        lit("P"), body))
  }

  /** `ser_json_temporal` (`serializers/config.rs:150-190` TemporalMode)
   * for datetime columns: 'iso8601' (speedate Display, pinned vs
   * pydantic — the 6-digit microsecond fraction appears ONLY when
   * nonzero, never trimmed), 'seconds' (epoch seconds as double) or
   * 'milliseconds'. `utcSuffix` appends the aware-datetime 'Z'. */
  def datetimeJson(ts: Column, mode: String = "iso8601",
                   utcSuffix: Boolean = false): Column = mode match {
    case "iso8601" =>
      val base = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
      val micros = date_format(ts, "SSSSSS")
      val full = when(micros =!= "000000", concat(base, lit("."), micros))
        .otherwise(base)
      if (utcSuffix) concat(full, lit("Z")) else full
    case "seconds" => ts.cast(DoubleType)
    case "milliseconds" => ts.cast(DoubleType) * 1000
    case other => throw new IllegalArgumentException(
      s"ser_json_temporal must be iso8601|seconds|milliseconds, got $other")
  }

  /** `ser_json_temporal` for date columns: 'seconds'/'milliseconds' are
   * the MIDNIGHT-UTC epoch (reference `date_to_json`). */
  def dateJson(d: Column, mode: String = "iso8601"): Column = mode match {
    case "iso8601" => date_format(d, "yyyy-MM-dd")
    // datediff-based epoch is session-timezone-INDEPENDENT (a Date ->
    // Timestamp cast would silently use spark.sql.session.timeZone and
    // break the documented midnight-UTC contract off-UTC sessions)
    case "seconds" => datediff(d, lit("1970-01-01")).cast(DoubleType) * 86400
    case "milliseconds" =>
      datediff(d, lit("1970-01-01")).cast(DoubleType) * 86400000
    case other => throw new IllegalArgumentException(
      s"ser_json_temporal must be iso8601|seconds|milliseconds, got $other")
  }

  /** `ser_json_temporal` for time values (the engine's seconds-of-day
   * doubles, [[graft.spec.TimeSpec]]): 'seconds' is seconds-since-
   * midnight (reference `time_to_json`), 'milliseconds' x1000. */
  def timeJson(secondsOfDay: Column, mode: String = "iso8601"): Column =
    mode match {
      case "iso8601" =>
        // derive whole seconds from TOTAL microseconds so a fraction that
        // rounds up to 1e6 rolls into the seconds (not a truncated pad)
        val totalMicro = round(secondsOfDay * 1e6).cast(LongType)
        val s = floor(totalMicro / 1000000L).cast(LongType)
        val micro = totalMicro % 1000000L
        val base = concat(
          lpad((s / 3600).cast(LongType).cast(StringType), 2, "0"), lit(":"),
          lpad(((s % 3600) / 60).cast(LongType).cast(StringType), 2, "0"), lit(":"),
          lpad((s % 60).cast(StringType), 2, "0"))
        when(micro > 0,
          concat(base, lit("."), lpad(micro.cast(StringType), 6, "0")))
          .otherwise(base)
      case "seconds" => secondsOfDay.cast(DoubleType)
      case "milliseconds" => secondsOfDay.cast(DoubleType) * 1000
      case other => throw new IllegalArgumentException(
        s"ser_json_temporal must be iso8601|seconds|milliseconds, got $other")
    }

  /** IEEE negative zero (x == 0.0 compares equal to +0.0, and Spark 4's
   * ANSI mode throws DIVIDE_BY_ZERO even for doubles, so no 1/x probe);
   * the sign survives the string cast: Double.toString(-0.0) = "-0.0". */
  private def isNegZero(x: Column): Column =
    x === 0.0 && x.cast(StringType) === "-0.0"

  /** One part of a complex rendering, matching the reference's float
   * formatting (`to_json(complex)` goldens): nan/inf lowercase,
   * negative zero keeps its sign ("-0" — Python repr), integral values
   * without a fraction (1e20 renders as its full digits, not
   * e-notation), plain decimals trimmed of zeros.
   *
   * Documented deviations from Python's shortest-repr (ryu): values with
   * |x| >= 1e38 render in Java e-notation; non-integral |x| < 1e-4
   * renders positionally where Python switches to e-notation (1e-7 ->
   * "0.0000001" here vs "1e-07"); non-zero |x| < 5e-19 collapses to "0"
   * (below decimal(38,18) resolution). */
  private def cxPart(x: Column): Column = {
    // ANSI-total casts: each decimal cast sees only values in its range
    // (guards INSIDE the cast input so codegen CSE cannot hoist an
    // overflowing cast above its branch). Non-integral doubles are
    // always < 2^53, so the (38,18) path covers them; integral values
    // beyond decimal(38,0) fall back to double rendering (e-notation —
    // documented deviation at |x| >= 1e38).
    val small = when(abs(x) < 1e18, x).otherwise(lit(0.0))
    val trimmed = regexp_replace(regexp_replace(
      small.cast(DecimalType(38, 18)).cast(StringType), "0+$", ""),
      "\\.$", "")
    val big = when(abs(x) >= 9.2e18 && abs(x) < 1e38, x).otherwise(lit(0.0))
    val bigStr = big.cast(DecimalType(38, 0)).cast(StringType)
    // |x| >= 2^53 is integral by construction (ulp >= 1) — floor() there
    // would overflow its LongType result; test it only below 2^53
    val integral = abs(x) >= 9.007199254740992e15 ||
      (when(abs(x) < 9.007199254740992e15, x).otherwise(lit(0.0)) ===
        floor(when(abs(x) < 9.007199254740992e15, x).otherwise(lit(0.0))) &&
        abs(x) < 9.007199254740992e15)
    when(isnan(x), lit("nan"))
      .when(x === Double.PositiveInfinity, lit("inf"))
      .when(x === Double.NegativeInfinity, lit("-inf"))
      .when(isNegZero(x), lit("-0"))
      .when(integral && abs(x) < 9.2e18, x.cast(LongType).cast(StringType))
      .when(integral && abs(x) < 1e38, bigStr)
      .when(integral, x.cast(StringType))
      .otherwise(trimmed)
  }

  /** complex (`struct<re,im>`) -> the reference's JSON string form
   * (goldens from `SchemaSerializer(complex_schema()).to_json`):
   * `"1+2j"`, `"2j"` when re == 0, `"1.5-2.5j"`, `"3+0j"`, `"0j"`,
   * `"inf+1j"`. Negative zeros keep their sign exactly like Python repr
   * ("1-0j", "-0+2j", "-0j"); remaining deviations are [[cxPart]]'s
   * magnitude cutoffs. */
  def complexJson(c: Column): Column = {
    val re = c.getField("re"); val im = c.getField("im")
    // Python drops the real part only for POSITIVE-zero re
    when(c.isNull, lit(null).cast(StringType))
      .when(re === 0.0 && !isNegZero(re), concat(cxPart(im), lit("j")))
      .otherwise(concat(cxPart(re),
        when(im < 0 || im === Double.NegativeInfinity || isNegZero(im),
          lit("")).otherwise(lit("+")),
        cxPart(im), lit("j")))
  }

  /** Fraction (`struct<num,den>`, reduced) -> `str(Fraction)`:
   * `"3/4"`, or just `"3"` when the denominator is 1. */
  def fractionJson(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .when(c.getField("den") === 1L,
        c.getField("num").cast(StringType))
      .otherwise(concat(c.getField("num").cast(StringType), lit("/"),
        c.getField("den").cast(StringType)))

  /** `ser_json_bytes` (`serializers/config.rs:136`): utf8 | base64 | hex
   * over a BinaryType column. */
  def bytesJson(bytes: Column, mode: String = "utf8"): Column = mode match {
    case "utf8" => bytes.cast(StringType)
    case "base64" => base64(bytes)
    case "hex" => lower(hex(bytes))
    case other => throw new IllegalArgumentException(
      s"ser_json_bytes must be utf8|base64|hex, got $other")
  }
}
