package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.events.EventOps

/** Event-time operator edge cases: as-of tie/tolerance/null-payload
 * semantics, session gap boundaries, rolling-frame inclusivity with
 * timestamp ties, range-join bin boundaries, funnel strict ordering. */
class EventOpsSpec extends SparkTestBase {

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def frame(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val evSchema = StructType(Seq(
    StructField("k", LongType), StructField("t", TimestampType),
    StructField("v", DoubleType), StructField("id", LongType)))

  private def ev(rows: (Long, Long, Double, Long)*): DataFrame =
    frame(evSchema, rows.map { case (k, u, v, id) => Row(k, ts(u), v, id) })

  // ------------------------------------------------------------- as-of

  private val rSchema = StructType(Seq(
    StructField("k", LongType), StructField("t", TimestampType),
    StructField("p", StringType)))

  private def rdim(rows: (Long, Long, String)*): DataFrame =
    frame(rSchema, rows.map { case (k, u, p) => Row(k, ts(u), p) })

  test("asofJoin: latest at-or-before wins; equal ts matches; no-match null") {
    val left = ev((1L, 100L, 0.0, 1L), (1L, 50L, 0.0, 2L), (1L, 10L, 0.0, 3L),
      (2L, 5L, 0.0, 4L))
    val right = rdim((1L, 50L, "a"), (1L, 80L, "b"), (2L, 9L, "z"))
    val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("p"))
      .select("id", "p", "asof_lag_us").collect()
      .map(r => (r.getLong(0), r.getAs[String]("p"),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, "b", 20L),   // 100 matches 80, not 50
      (2L, "a", 0L),    // equal ts matches (<=)
      (3L, null, -1L),  // nothing at-or-before 10
      (4L, null, -1L))) // key 2 has right at 9 > 5 -> no match
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val left = ev((1L, 100L, 0.0, 1L), (1L, 52L, 0.0, 2L))
    val right = rdim((1L, 50L, "a"))
    val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("p"),
        toleranceUs = Some(10L))
      .select("id", "p").collect()
      .map(r => (r.getLong(0), r.getAs[String]("p"))).toSet
    assert(out === Set((1L, null), (2L, "a"))) // lag 50 > 10 dropped
  }

  test("asofJoin: null payload in the LATEST right row does not fall " +
      "through to an older row (struct carry, not per-column last)") {
    val left = ev((1L, 100L, 0.0, 1L))
    val right = rdim((1L, 10L, "old"), (1L, 90L, null))
    val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("p"))
      .select("p", "asof_lag_us").collect().head
    assert(out.isNullAt(0) && out.getLong(1) === 10L) // matched row IS t=90
  }

  test("asofJoin forward: earliest at-or-after; equal ts matches") {
    val left = ev((1L, 10L, 0.0, 1L), (1L, 50L, 0.0, 2L), (1L, 85L, 0.0, 3L))
    val right = rdim((1L, 50L, "a"), (1L, 80L, "b"))
    val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("p"),
        forward = true)
      .select("id", "p", "asof_lag_us").collect()
      .map(r => (r.getLong(0), r.getAs[String]("p"),
        if (r.isNullAt(2)) 1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, "a", -40L), // earliest at-or-after 10 is 50, NOT 80
      (2L, "a", 0L),   // equal ts matches
      (3L, null, 1L))) // nothing at-or-after 85
  }

  test("asofJoin: null timestamps match nothing on either side") {
    val left = frame(evSchema, Seq(
      Row(1L, ts(100L), 0.0, 1L), Row(1L, null, 0.0, 2L)))
    val right = frame(rSchema, Seq(
      Row(1L, null, "junk"), Row(1L, ts(50L), "a")))
    for (fwd <- Seq(false, true)) {
      val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t",
          Seq("p"), forward = fwd)
        .select("id", "p").collect()
        .map(r => (r.getLong(0), r.getAs[String]("p"))).toMap
      // null-ts left row (id 2) matches nothing in either direction;
      // the null-ts right row ("junk") is never a match
      assert(out(2L) === null)
      assert(out(1L) === (if (fwd) null else "a"))
    }
  }

  test("asofJoin: NULL join keys never match (equi-join semantics), " +
      "in either direction") {
    val left = frame(evSchema, Seq(
      Row(null, ts(100L), 0.0, 1L), Row(1L, ts(100L), 0.0, 2L)))
    val right = frame(rSchema, Seq(
      Row(null, ts(50L), "nullmatch"), Row(1L, ts(50L), "a")))
    for (fwd <- Seq(false, true)) {
      val out = EventOps.asofJoin(left, right, Seq("k"), "t", "t",
          Seq("p"), forward = fwd)
        .select("id", "p").collect()
        .map(r => (r.getLong(0), r.getAs[String]("p"))).toMap
      // the null-key LEFT row survives (left join shape) but is never
      // enriched from the null-key right row — SQL ASOF/equi-join
      // semantics never match on NULL
      assert(out(1L) === null)
      assert(out(2L) === (if (fwd) null else "a"))
    }
  }

  test("property: asofJoin (both directions) == brute force on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 300L).map(id =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, 0.0, id))
    // right: unique (key, ts) per the operator contract
    val right = rnd.shuffle(
      (for (k <- 0L to 4L; t <- 0L to 1000L) yield (k, t)).toSeq)
      .take(400).map { case (k, t) => (k, t, s"p$k-$t") }
    val lDf = ev(left: _*)
    val rDf = rdim(right: _*)
    val rByKey = right.groupBy(_._1)
    for (fwd <- Seq(false, true)) {
      val got = EventOps.asofJoin(lDf, rDf, Seq("k"), "t", "t", Seq("p"),
          forward = fwd)
        .select("id", "p").collect()
        .map(r => r.getLong(0) -> r.getAs[String]("p")).toMap
      val want = left.map { case (k, t, _, id) =>
        val cand = rByKey.getOrElse(k, Seq.empty)
          .filter(r => if (fwd) r._2 >= t else r._2 <= t)
        id -> (if (cand.isEmpty) null
               else (if (fwd) cand.minBy(_._2) else cand.maxBy(_._2))._3)
      }.toMap
      assert(got === want, s"forward=$fwd")
    }
  }

  // ------------------------------------------------------- sessionize

  test("sessionize: gap strictly greater breaks; exactly gap stays") {
    val df = ev((1L, 0L, 0.0, 1L), (1L, 100L, 0.0, 2L), // gap 100 == gap
      (1L, 201L, 0.0, 3L),                              // gap 101 > 100
      (2L, 5L, 0.0, 4L))
    val out = EventOps.sessionize(df, Seq("k"), "t", "id", gapUs = 100L)
      .select("id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("sessionSummary: bounds, exact decimal sum, distinct types") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", TimestampType),
      StructField("v", DoubleType), StructField("id", LongType),
      StructField("tp", StringType)))
    val df = frame(schema, Seq(
      Row(1L, ts(0L), 0.1, 1L, "a"), Row(1L, ts(50L), 0.2, 2L, "b"),
      Row(1L, ts(500L), 0.3, 3L, "a")))
    val out = EventOps.sessionSummary(df, Seq("k"), "t", "id",
        gapUs = 100L, "v", "tp")
      .orderBy("session_seq")
      .select("session_seq", "n_events", "start_us", "end_us",
        "duration_us", "n_types")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out === Seq((1L, 2L, 0L, 50L, 50L, 2L), (2L, 1L, 500L, 500L, 0L, 1L)))
    // 0.1 + 0.2 as DECIMAL(18,2) is exactly 0.30 (a double fold gives
    // 0.30000000000000004)
    val sum = EventOps.sessionSummary(df, Seq("k"), "t", "id",
        gapUs = 100L, "v", "tp")
      .where(col("session_seq") === 1)
      .select(col("sum_value").cast(StringType)).collect().head.getString(0)
    assert(sum === "0.30")
  }

  // ------------------------------------------------------- rollingAgg

  test("rollingAgg: inclusive [ts-w, ts]; timestamp ties are peers") {
    val df = ev((1L, 0L, 1.0, 1L), (1L, 100L, 2.0, 2L), (1L, 100L, 4.0, 3L),
      (1L, 200L, 8.0, 4L))
    val out = EventOps.rollingAgg(df, Seq("k"), "t", "v", windowUs = 100L)
      .select(col("id"), col("roll_n"),
        col("roll_sum").cast(StringType))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set(
      (1L, 1L, "1.00"),
      (2L, 3L, "7.00"),  // peer at same ts included both ways
      (3L, 3L, "7.00"),
      (4L, 3L, "14.00"))) // [100,200] boundary-inclusive: both peers + self
  }

  // ------------------------------------------------- rangeJoinBinned

  test("rangeJoinBinned: boundary-inclusive, bin-spanning, no duplicates") {
    val pts = ev((1L, 10L, 0.0, 1L), (1L, 25L, 0.0, 2L), (1L, 26L, 0.0, 3L),
      (1L, 5L, 0.0, 4L), (2L, 12L, 0.0, 5L))
    val ivSchema = StructType(Seq(
      StructField("k", LongType), StructField("s", TimestampType),
      StructField("e", TimestampType), StructField("iid", LongType)))
    // interval [10,25] spans bins 1..3 at width 8; key 2 interval misses
    val iv = frame(ivSchema, Seq(Row(1L, ts(10L), ts(25L), 7L),
      Row(2L, ts(20L), ts(30L), 8L)))
    val out = EventOps.rangeJoinBinned(pts, iv, Seq("k"), "t", "s", "e",
        binWidthUs = 8L, Seq("id"), Seq("iid"))
      .select("p_id", "i_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out.sorted === List((1L, 7L), (2L, 7L))) // 26>25 out, 5<10 out,
    // key-2 point 12 < 20 out; and exactly once each despite 3 bins
  }

  test("property: rangeJoinBinned == brute force across bin widths") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 200L).map(id =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, 0.0, id))
    val ivSchema = StructType(Seq(
      StructField("k", LongType), StructField("s", TimestampType),
      StructField("e", TimestampType), StructField("iid", LongType)))
    val ivs = (1L to 60L).map { iid =>
      val k = rnd.nextInt(3).toLong
      val s = rnd.nextInt(500).toLong
      (k, s, s + rnd.nextInt(80).toLong, iid)
    }
    val ivDf = frame(ivSchema,
      ivs.map { case (k, s, e, iid) => Row(k, ts(s), ts(e), iid) })
    val want = (for {
      (pk, pt, _, pid) <- pts
      (ik, is, ie, iid) <- ivs
      if pk == ik && pt >= is && pt <= ie
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 7L, 80L, 512L)) { // width < len, ~len, >> len
      val got = EventOps.rangeJoinBinned(ev(pts: _*), ivDf, Seq("k"),
          "t", "s", "e", binWidthUs = w, Seq("id"), Seq("iid"))
        .select("p_id", "i_iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"dup matches at width $w")
      assert(got.toSet === want, s"width $w")
    }
  }

  // ------------------------------------------------------------ funnel

  test("funnel: strictly-after ordering; partial reach") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", TimestampType),
      StructField("tp", StringType)))
    val df = frame(schema, Seq(
      // user 1: full funnel in order
      Row(1L, ts(10L), "s"), Row(1L, ts(20L), "c"), Row(1L, ts(30L), "p"),
      // user 2: purchase BEFORE click -> stage 3 not reached
      Row(2L, ts(10L), "s"), Row(2L, ts(30L), "c"), Row(2L, ts(20L), "p"),
      // user 3: click at the SAME micro as signup -> not strictly after
      Row(3L, ts(10L), "s"), Row(3L, ts(10L), "c"),
      // user 4: no signup -> absent entirely
      Row(4L, ts(10L), "c"), Row(4L, ts(20L), "p")))
    val out = EventOps.funnel(df, Seq("k"), "t", "tp", Seq("s", "c", "p"))
      .select("k", "stages_reached").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out === Set((1L, 3), (2L, 2), (3L, 1)))
  }

  test("retention: cohort = first period; distinct users per (cohort,k)") {
    val P = 100L
    val df = ev(
      (1L, 10L, 0.0, 1L), (1L, 20L, 0.0, 2L),   // user 1: cohort 0, twice in p0
      (1L, 250L, 0.0, 3L),                      // user 1 active p2
      (2L, 150L, 0.0, 4L),                      // user 2: cohort 1
      (2L, 250L, 0.0, 5L),                      // user 2 active p2
      (3L, 30L, 0.0, 6L))                       // user 3: cohort 0 only
    val out = EventOps.retention(df, Seq("k"), "t", periodUs = P)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      (0L, 0L) -> 2L,   // users 1,3 (user 1 counted once despite 2 events)
      (0L, 2L) -> 1L,   // user 1 returns in period 2
      (1L, 0L) -> 1L,   // user 2's cohort
      (1L, 1L) -> 1L))  // user 2 returns one period later
  }

  // ----------------------------------------------------- balanceStrata

  test("balanceStrata: rarest stratum kept whole, others downsampled") {
    import graft.text.TextOps
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType)))
    val rows = (0L until 200L).map(i => Row(i, if (i < 20) "rare" else "big"))
    val df = frame(schema, rows)
    val kept = TextOps.balanceStrata(df, "id", "g")
      .groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept("rare") === 20L)           // n_min == n_s -> all kept
    assert(kept("big") < 180L && kept("big") > 0L)
  }

  test("balanceStrata: null strata pass through and never set n_min") {
    import graft.text.TextOps
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType)))
    val rows = (0L until 100L).map { i =>
      Row(i, if (i < 3) null else if (i < 53) "a" else "b")
    }
    val kept = TextOps.balanceStrata(frame(schema, rows), "id", "g")
      .groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept(null) === 3L)  // unclassifiable rows are never dropped
    // n_min = min(50, 47), NOT 3 — real strata keep ~everything
    assert(kept("a") > 40L && kept("b") > 40L)
  }
}
