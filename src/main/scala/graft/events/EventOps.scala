package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Event-time relational operators over a timestamped fact table.
 *
 * pydantic validates one record at a time and has no temporal view at all;
 * a table-scale validation/curation engine needs the event-time basics —
 * as-of joins (enrich each fact with the latest dimension state), gap
 * sessionization, rolling time-window aggregates, interval (range) joins
 * and ordered-funnel reach — both to validate temporal invariants
 * ("every click has a signup before it") and to build training-data
 * features. Every operator here is shuffle-minimal and skew-bounded:
 * one hash exchange on the entity key plus a per-key sort, never a
 * cross product or an unbounded window buffer.
 *
 * All timestamps are normalized to exact integer microseconds
 * (`unix_micros` after a session-TZ cast; the session pins UTC so NTZ
 * parquet values keep their wall-clock micros) — no sub-second rendering
 * or double-epoch rounding can diverge from an independent SQL replay.
 */
object EventOps {

  /** Exact integer-microsecond view of a (possibly NTZ) timestamp col. */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  // ---------------------------------------------------------------------
  // As-of join
  // ---------------------------------------------------------------------

  /** Backward as-of join: for every left row, attach the payload of the
   * LATEST right row with the same key and `rightTs <= leftTs`
   * (optionally within `toleranceUs`). Equal timestamps match (`<=`,
   * DuckDB/kdb ASOF semantics).
   *
   * Implementation is the scalable union-window form, NOT a join: tag
   * both sides, union, and run `last(right_struct, ignoreNulls)` over a
   * per-key window ordered by (ts, side) with right rows sorting before
   * left rows at equal ts. One hash exchange on the key + one per-key
   * sort — no candidate-pair blowup, no per-row right-side probe, and
   * per-key skew is bounded by that key's event count (the same bound
   * any per-entity operator has). At 10^12 rows this beats the
   * broadcast-interval or bucketed-range forms because it never
   * materializes candidate pairs at all.
   *
   * The matched right row is carried as ONE struct so as-of semantics
   * hold even when payload fields are legitimately null (a null payload
   * in the latest right row must NOT fall through to an older row).
   *
   * Right rows must be unique per (keys, rightTs) — pre-aggregate the
   * right side otherwise (both this form and SQL ASOF are
   * nondeterministic under duplicates).
   *
   * Output: every left column, then for each payload column `p` a column
   * `p` from the matched right row (null when no match / out of
   * tolerance), then `asof_lag_us` (leftTs - matched rightTs; negative
   * of the lead in forward mode).
   *
   * `forward = true` flips the direction: the EARLIEST right row with
   * `rightTs >= leftTs` (time-to-next-event); same plan shape, the
   * window order just reverses.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsCol: String, rightTsCol: String,
               payload: Seq[String],
               toleranceUs: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++ Seq(
        tsMicros(col(leftTsCol)).as("__ts"),
        lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__lrow"),
        lit(null).cast(
          right.select(struct((rightTsCol +: payload).map(col): _*))
            .schema.head.dataType).as("__r")): _*)
    val r = right
      // a null-ts right row can never be "the latest at-or-before"
      // anything (SQL ASOF matches nothing on null) — and unfiltered it
      // would sort to an end of the window order and corrupt matches
      .where(tsMicros(col(rightTsCol)).isNotNull)
      // same for null JOIN KEYS: Window.partitionBy groups nulls into one
      // partition, so an unfiltered null-key right row would enrich
      // null-key left rows — SQL ASOF/equi-join semantics never match on
      // NULL. Dropping them here leaves null-key LEFT rows unmatched
      // (their partition holds no right rows), which is the SQL answer.
      .where(keys.map(col(_).isNotNull).reduceOption(_ && _)
        .getOrElse(lit(true)))
      .select(
      keys.map(col) ++ Seq(
        tsMicros(col(rightTsCol)).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(
          left.select(struct(lCols.map(col): _*)).schema.head.dataType)
          .as("__lrow"),
        struct((rightTsCol +: payload).map(col): _*).as("__r")): _*)
    // right (side 0) sorts before left (side 1) at equal ts -> `<=`
    // (backward) / `>=` (forward) both match equal timestamps
    val ord = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w).as("__m")
    val base = l.unionByName(r).select(col("*"), matched)
      .where(col("__side") === 1)
    val mTs = tsMicros(col("__m").getField(rightTsCol))
    val lagUs = if (forward) -(mTs - col("__ts"))
                else col("__ts") - mTs
    // a null-ts LEFT row matches nothing either (its window position is
    // an artifact of null ordering, not time)
    val inTol = toleranceUs match {
      case Some(t) => col("__m").isNotNull && col("__ts").isNotNull &&
        abs(lagUs) <= t
      case None    => col("__m").isNotNull && col("__ts").isNotNull
    }
    base.select(
      lCols.map(n => col("__lrow").getField(n).as(n)) ++
        payload.map(p => when(inTol, col("__m").getField(p)).as(p)) :+
        when(inTol, lagUs).as("asof_lag_us"): _*)
  }

  // ---------------------------------------------------------------------
  // Gap sessionization
  // ---------------------------------------------------------------------

  /** Gap-based sessionization: a new session starts when the gap to the
   * previous event of the same key exceeds `gapUs` (strictly greater;
   * a gap of exactly `gapUs` stays in-session). Appends `session_seq`
   * (1-based per key, in time order) to every input row.
   *
   * One hash exchange on the key + per-key sort; `lag` + a running sum
   * over the same window, so Spark plans a single Window node (no second
   * exchange). Ties on ts break by a caller-supplied unique `tieCol`
   * (an event id) so the ordering — and therefore the session numbering —
   * is deterministic and replayable by any SQL engine.
   *
   * NULL keys form one group (SQL GROUP BY semantics — sessionization is
   * a grouping, not a join, so this is intentional; contrast [[asofJoin]],
   * which drops null-key matches per equi-join semantics).
   */
  def sessionize(df: DataFrame, keys: Seq[String], ts: String,
                 tieCol: String, gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__us"), col(tieCol))
    val prev = lag(col("__us"), 1).over(ord)
    // two steps (a window expr can't nest inside a window aggregate);
    // same partitioning + ordering, so Spark plans ONE exchange + sort
    df.withColumn("__us", tsMicros(col(ts)))
      .withColumn("__b",
        when(prev.isNull || col("__us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__b")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__us", "__b")
  }

  /** Per-session rollup over `sessionize` output: bounds, event count,
   * exact value sum (DECIMAL so the sum is order-independent — a double
   * fold would depend on shuffle order), distinct event types. */
  def sessionSummary(df: DataFrame, keys: Seq[String], ts: String,
                     tieCol: String, gapUs: Long,
                     valueCol: String, typeCol: String): DataFrame = {
    val us = tsMicros(col(ts))
    sessionize(df, keys, ts, tieCol, gapUs)
      .groupBy((keys.map(col) :+ col("session_seq")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"),
        (max(us) - min(us)).as("duration_us"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_value"),
        count_distinct(col(typeCol)).as("n_types"))
  }

  // ---------------------------------------------------------------------
  // Rolling time-window aggregates
  // ---------------------------------------------------------------------

  /** Per-event trailing-window aggregate: for each row, the count and
   * exact DECIMAL sum of `valueCol` over this key's events in
   * `[ts - windowUs, ts]` (inclusive both ends — SQL RANGE semantics).
   *
   * One window node (RANGE frame on integer micros); the frame buffer is
   * bounded by the densest key's events-per-window, not by table size.
   * The sum is DECIMAL(18,2) so it is exact and order-independent —
   * the one property that makes a rolling double sum replayable.
   */
  def rollingAgg(df: DataFrame, keys: Seq[String], ts: String,
                 valueCol: String, windowUs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__us"))
      .rangeBetween(-windowUs, 0)
    df.withColumn("__us", tsMicros(col(ts)))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum",
        sum(col(valueCol).cast(DecimalType(18, 2))).over(w))
      .drop("__us")
  }

  // ---------------------------------------------------------------------
  // Interval (range) join, bin-bucketed
  // ---------------------------------------------------------------------

  /** Range join: match point rows to interval rows of the same key with
   * `start <= point <= end`, via fixed-width time binning — the standard
   * trick that turns an inequality join into an equi-join. Each interval
   * explodes over the bins it covers (`ceil(len/binWidth)+1` rows), each
   * point maps to exactly one bin; the equi-join on (key, bin) is then
   * filtered to exact containment. With binWidthUs on the order of the
   * interval length the blowup is ~2x interval rows — a bounded,
   * shuffle-friendly plan where a naive theta-join is a per-key cross
   * product and a broadcast range join dies at 10^12 rows.
   *
   * `points` / `intervals` column lists pass through prefixed `p_` / `i_`.
   */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointTs: String,
                      startCol: String, endCol: String,
                      binWidthUs: Long,
                      pointCols: Seq[String], intervalCols: Seq[String])
  : DataFrame = {
    val p = points.select(
      keys.map(col) ++ Seq(tsMicros(col(pointTs)).as("__pus")) ++
        pointCols.map(c => col(c).as(s"p_$c")): _*)
      .withColumn("__bin", floorDiv(col("__pus"), binWidthUs))
    val i = intervals.select(
      keys.map(col) ++ Seq(
        tsMicros(col(startCol)).as("__sus"),
        tsMicros(col(endCol)).as("__eus")) ++
        intervalCols.map(c => col(c).as(s"i_$c")): _*)
      .withColumn("__bin", explode(sequence(
        floorDiv(col("__sus"), binWidthUs),
        floorDiv(col("__eus"), binWidthUs))))
    p.join(i, keys :+ "__bin")
      .where(col("__pus") >= col("__sus") && col("__pus") <= col("__eus"))
      .select(keys.map(col) ++ pointCols.map(c => col(s"p_$c")) ++
        intervalCols.map(c => col(s"i_$c")) :+
        col("__pus").as("point_us") :+ col("__sus").as("start_us"): _*)
  }

  /** Exact floor division for possibly-negative micros. Column `/` on
   * longs is DOUBLE division (rounds above 2^53 — a dirty year-9999
   * timestamp is enough); route the exact multiple through DECIMAL(38,0)
   * so the quotient is integer-exact over the full long range. */
  private[events] def floorDiv(x: Column, y: Long): Column =
    ((x - pmod(x, lit(y))).cast(org.apache.spark.sql.types.DecimalType(38, 0))
      / y).cast(LongType)

  // ---------------------------------------------------------------------
  // Cohort retention
  // ---------------------------------------------------------------------

  /** Cohort retention matrix: users bucketed by first-activity period
   * (integer `periodUs` buckets of the epoch), counted per (cohort,
   * periods-since-cohort). All-integer bucket arithmetic — exact and
   * SQL-replayable. Output: `cohort, k, n_users`.
   *
   * Scale shape: distinct (key, period) pre-agg (map-side combine), a
   * per-key min for the cohort, one equi-join back on the key, one
   * count agg — all shuffles carry (key, period)-distinct rows. */
  def retention(df: DataFrame, keys: Seq[String], ts: String,
                periodUs: Long): DataFrame = {
    val period = floorDiv(tsMicros(col(ts)), periodUs)
    val active = df.select((keys.map(col) :+
        period.as("__p")): _*).distinct()
    val cohort = active.groupBy(keys.map(col): _*)
      .agg(min(col("__p")).as("__c"))
    active.join(cohort, keys)
      .groupBy(col("__c").as("cohort"), (col("__p") - col("__c")).as("k"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ---------------------------------------------------------------------
  // Ordered funnel
  // ---------------------------------------------------------------------

  /** Ordered-funnel reach: per key, the earliest time each stage in
   * `stages` is hit STRICTLY AFTER the previous stage's earliest hit
   * (the classic product-analytics funnel — order matters, a purchase
   * before the first click does not count as stage 3).
   *
   * k-1 passes: each pass joins the stage-k event subset to the
   * aggregate-sized accumulator on the key, filters to strictly-after,
   * and re-aggregates a map-side-combined min — bounded state everywhere
   * (NO per-key event list is ever collected; a mega-user with 10^8
   * clicks costs a bigger partial-agg input, not a bigger buffer).
   * Output: one row per key that reached stage 1, with `t1..tk` micros
   * (null = stage not reached) and `stages_reached`.
   */
  def funnel(df: DataFrame, keys: Seq[String], ts: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val us = tsMicros(col(ts))
    val base = df.select(
      keys.map(col) ++ Seq(us.as("__us"), col(typeCol).as("__tp")): _*)
    var acc = base.where(col("__tp") === stages.head)
      .groupBy(keys.map(col): _*).agg(min(col("__us")).as("t1"))
    for (k <- 2 to stages.length) {
      val prevT = s"t${k - 1}"
      val nxt = base.where(col("__tp") === stages(k - 1))
        .join(acc.select((keys.map(col) :+ col(prevT).as("__pt")): _*), keys)
        .where(col("__us") > col("__pt"))
        .groupBy(keys.map(col): _*).agg(min(col("__us")).as(s"t$k"))
      acc = acc.join(nxt, keys, "left")
      // acc is referenced twice per stage, so the logical plan doubles
      // each round — harmless for the typical 3-5 stage funnel, but for
      // deep funnels truncate lineage (acc is aggregate-sized: one row
      // per stage-1 key)
      if (stages.length > 5) acc = acc.localCheckpoint()
    }
    val reached = (1 to stages.length)
      .map(k => when(col(s"t$k").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stages_reached", reached)
  }
}
