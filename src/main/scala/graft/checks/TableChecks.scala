package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-level checks — the relational generalization of pydantic's
 * per-object constraint vocabulary (SURVEY §2.3):
 *  - per-column stats  <- observed analogs of min_length/max_length/ge/le
 *  - uniqueness        <- set semantics ("sets - unique lists",
 *                         validators/mod.rs:600-601)
 *  - referential integrity <- literal/enum membership (literal.rs:28) at
 *                         dimension-table scale
 *
 * All operators here are scale-first: two-phase (partial+final) aggregation,
 * salting for skewed keys, broadcast for dimensions.
 */
object TableChecks {

  /**
   * Per-column stats in ONE pass over the table (one shuffle-free partial
   * aggregation): row count, null count/rate, HLL++ distinct
   * (approx_count_distinct — a TypedImperativeAggregate with partial merge,
   * exactly the partial+final shape a 1000-executor scan needs), min/max,
   * and length quantiles for string columns.
   *
   * Output: one row per column (long format), so downstream constraint
   * checks on stats are joins, not schema surgery.
   */
  def columnStats(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isStr = df.schema(c).dataType.typeName == "string"
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        approx_count_distinct(col(c), rsd).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max")
      ) ++ (if (isStr) Seq(
        percentile_approx(length(col(c)),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000))
          .as(s"${c}__len_q")
      ) else Seq(
        lit(null).cast("array<int>").as(s"${c}__len_q")
      ))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // long format: stack the per-column stat groups
    val stacked = cols.map { c =>
      wide.select(
        lit(c).as("column"),
        col("__rows").as("row_count"),
        col(s"${c}__nonnull").as("nonnull_count"),
        (lit(1.0) - col(s"${c}__nonnull") / col("__rows")).as("null_rate"),
        col(s"${c}__distinct").as("approx_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__len_q").getItem(0).as("len_p50"),
        col(s"${c}__len_q").getItem(1).as("len_p95"),
        col(s"${c}__len_q").getItem(2).as("len_p99"))
    }
    stacked.reduce(_.unionAll(_))
  }

  /**
   * Duplicate keys — the table-level "set" constraint. Returns one row per
   * duplicated key with its count.
   *
   * Scale: a single `groupBy(keys)` hash-aggregates map-side first (partial
   * agg), so the shuffle carries one record per distinct key per task, not
   * per input row; AQE handles residual skew. For pathologically hot keys
   * use [[duplicateKeysSalted]].
   */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /**
   * Salted two-phase variant for skewed keys (SURVEY §4.2.1): phase 1 groups
   * on (keys, salt) so a mega-key's rows spread over `saltBuckets` reducers;
   * phase 2 re-aggregates the per-salt partial counts (tiny).
   */
  def duplicateKeysSalted(df: DataFrame, keys: Seq[String],
                          saltBuckets: Int = 64): DataFrame = {
    val salted = df
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
    salted
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /**
   * Referential integrity: rows whose `fk` has no match in `dim.pk` —
   * enum/literal membership generalized to a dimension table. Broadcast
   * left-anti join: zero shuffle of the fact side.
   */
  def referentialViolations(fact: DataFrame, fk: String,
                            dim: DataFrame, pk: String): DataFrame =
    fact.filter(col(fk).isNotNull)
      .join(broadcast(dim.select(col(pk).as(fk)).distinct()), Seq(fk), "left_anti")

  /** sha256 invariant column — the per-row invariant vs a reference run
   * (north rule; `sha2(content, 256)`). */
  def sha256(c: Column): Column = sha2(c, 256)

  /**
   * Robust cross-partition anomaly detection over a per-partition metric —
   * the population generalization of drift: instead of comparing each
   * partition against one fixed reference histogram ([[Drift]]), every
   * partition's mean metric is scored against the population of partitions
   * via the modified z-score (Iglewicz & Hoaglin 1993):
   * `M = 0.6745 * |x - median| / MAD`, flagged when `M > threshold` (their
   * recommended 3.5). Catches the partition whose files are 4x longer —
   * ingestion truncation, encoding blowups, a drifted repo — without any
   * reference snapshot, which is what a first run over an unknown corpus
   * has. (pydantic has no population view at all; this is the check that
   * only exists at table scale.)
   *
   * Exact-by-construction for the oracle: the median is computed manually
   * — `row_number` ranks, the two middle ranks `floor((n+1)/2)` /
   * `floor((n+2)/2)`, midpoint as `sum/count` — rather than via engine
   * percentile interpolation, so DuckDB replays the identical arithmetic
   * bit-for-bit (both engines: long sums, one double division, one
   * multiply — no interpolation formula to diverge on).
   *
   * Scale shape: ONE map-side-combined groupBy is the only full-data pass;
   * everything downstream runs on one row per partition (1e5-1e6 rows at
   * 1e12-file scale). The unpartitioned `row_number` windows and the 1-row
   * broadcast joins are bounded by partition count, never data size.
   * `mod_z`/`anomaly` are null when MAD = 0 (over half the population
   * shares one exact mean — score undefined; `anomaly` is a nullable 1/0
   * int, not boolean, for pandas NULL round-trip parity).
   */
  def anomalyScan(df: DataFrame, partCol: Column, metric: Column,
                  threshold: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one row per (value, part) with its global rank -> the two middle
    // ranks -> midpoint. part_id tiebreak pins rank determinism; equal
    // values make the choice value-irrelevant.
    def medianOf(d: DataFrame, c: String): DataFrame = {
      val ranked = d.select(col(c), col("part_id"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col(c), col("part_id"))))
      ranked.crossJoin(broadcast(ranked.agg(max(col("rk")).as("n"))))
        .filter(col("rk") === floor((col("n") + 1) / 2) ||
                col("rk") === floor((col("n") + 2) / 2))
        .agg((sum(col(c)) / count(lit(1))).as("med"))
    }
    val stats = df
      .groupBy(partCol.as("part_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(metric.cast("long")).as("metric_sum"))
      .withColumn("metric_mean",
        col("metric_sum").cast("double") / col("n_rows").cast("double"))
    val dev = stats
      .crossJoin(broadcast(medianOf(stats, "metric_mean")))
      .withColumn("dev", abs(col("metric_mean") - col("med")))
    val mad = medianOf(dev, "dev").select(col("med").as("mad"))
    val modZ = when(col("mad") > 0,
      lit(0.6745) * col("dev") / col("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("part_id"), col("n_rows"), col("metric_mean"),
        col("med").as("pop_median"),
        modZ.as("mod_z"),
        when(modZ.isNotNull, (modZ > threshold).cast("int")).as("anomaly"))
  }

  /**
   * Per-partition freshness check — the data-SLA complement of drift:
   * each partition's newest event timestamp against the table's global
   * newest, flagged stale when the lag exceeds `maxLagSec`. The check a
   * scheduled ingest monitors ("did source X stop emitting?"); pydantic
   * has no temporal table view at all — this only exists at table scale.
   *
   * Everything stays in exact integer microseconds (`unix_micros`), so
   * the oracle replays bit-for-bit with no sub-second rendering or
   * truncation differences between engines.
   *
   * Scale shape: ONE map-side-combined groupBy (per-partition max) plus a
   * 1-row global aggregate broadcast back — two passes over counters, no
   * wide shuffle.
   */
  def freshness(df: DataFrame, partCol: Column, tsCol: Column,
                maxLagSec: Long): DataFrame = {
    // NTZ parquet timestamps cast to session-TZ timestamps first (the
    // session pins UTC, so the wall-clock micros are unchanged — matching
    // DuckDB's epoch_us over the same naive values)
    val us = unix_micros(tsCol.cast("timestamp"))
    val per = df.groupBy(partCol.as("part_id"))
      .agg(max(us).as("last_us"), count(lit(1)).as("n_rows"))
    per.crossJoin(broadcast(per.agg(max(col("last_us")).as("__gmax"))))
      .select(col("part_id"), col("n_rows"), col("last_us"),
        (col("__gmax") - col("last_us")).as("lag_us"),
        ((col("__gmax") - col("last_us")) > maxLagSec * 1000000L)
          .cast("int").as("stale"))
  }

  /**
   * Violation regression diff — CI-for-data: classify each violation key
   * (row identity + loc + type) as `new` (absent from the previous run's
   * snapshot), `fixed` (present before, gone now) or `persisting`. The
   * gate a scheduled validation run alerts on is `status = 'new'`; `fixed`
   * rows close incidents. pydantic has no run-to-run memory — this is the
   * table-scale generalization its ValidationError list needs to become a
   * monitorable signal.
   *
   * Scale shape: both sides reduce to their distinct key set first
   * (map-side combine), then ONE null-safe full-outer shuffle join on the
   * key — violations are a small fraction of rows, so the join operands
   * are orders below table size. Null-safe (`<=>`) so a NULL row-identity
   * (e.g. a missing-key violation) still pairs across runs.
   */
  def violationDiff(current: DataFrame, previous: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    val cur = current.select(keyCols.map(col): _*).distinct()
      .withColumn("__cur", lit(true))
    val prev = previous.select(keyCols.map(col): _*).distinct()
      .withColumn("__prev", lit(true))
    val cond = keyCols.map(k => cur(k) <=> prev(k)).reduce(_ && _)
    val status =
      when(coalesce(col("__cur"), lit(false)) &&
           coalesce(col("__prev"), lit(false)), lit("persisting"))
        .when(coalesce(col("__cur"), lit(false)), lit("new"))
        .otherwise(lit("fixed"))
    cur.join(prev, cond, "full_outer")
      .select(keyCols.map(k => coalesce(cur(k), prev(k)).as(k)) :+
        status.as("status"): _*)
  }

  /**
   * Exact per-group quantiles — the exact complement to `colStats`'s
   * approx_percentile, for the checks where a bound must be EXACT
   * (SLA percentiles, drift-gate cut points). Nearest-rank (type-1)
   * definition: the quantile at q = num/den is the smallest value whose
   * cumulative count reaches `ceil(q * n)`. Every step is integer
   * arithmetic (ranks as `(n*num + den - 1) div den`), so an independent
   * SQL replay matches bit-for-bit — no interpolation, no doubles.
   *
   * Scale shape: ONE map-side-combined groupBy on (group, value) shrinks
   * the data to distinct values per group BEFORE any window; the
   * cumulative window then runs over value-distinct rows only (bounded by
   * the value domain, not the row count), plus a group-sized total join.
   * approx_percentile stays the one-pass default; this is the exact tier.
   *
   * `qs`: (label, num, den) with 0 < num <= den, e.g. ("p90", 9, 10).
   * Output: one row per (group, label): `grp, q, value`.
   */
  def exactQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
                     qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, n, d) => n > 0 && n <= d })
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    // NULL values are excluded (standard quantile semantics, matching
    // approx_percentile) — counting them would also diverge from a SQL
    // replay, since Spark windows order nulls first and DuckDB last
    val counts = df.where(valueCol.isNotNull)
      .groupBy(groupCol.as("grp"), valueCol.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
    val tot = counts.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val qRows = explode(array(qs.map { case (label, num, den) =>
      struct(lit(label).as("q"), lit(num.toLong).as("num"),
        lit(den.toLong).as("den"))
    }: _*)).as("__q")
    val withQ = cum.join(tot, "grp").select(col("*"), qRows)
      .select(col("grp"), col("v"), col("cnt"), col("cum"), col("n"),
        col("__q.q").as("q"), col("__q.num").as("num"),
        col("__q.den").as("den"))
    // rank = ceil(n * num / den) in exact integer arithmetic. Column `/`
    // on longs is DOUBLE division (exact only below 2^53) — route the
    // exact multiple through DECIMAL(38,0), same discipline as
    // EventOps.floorDiv.
    val num0 = col("n") * col("num") + col("den") - 1L
    val rank = ((num0 - pmod(num0, col("den")))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / col("den"))
      .cast(LongType)
    withQ.where(rank > col("cum") - col("cnt") && rank <= col("cum"))
      .select(col("grp"), col("q"), col("v").as("value"))
  }
}
