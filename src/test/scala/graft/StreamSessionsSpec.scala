package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.streaming.StreamSessions

/** Streaming sessionization: gap semantics identical to the batch
 * operator (> gap breaks, == gap stays), watermark-timeout closing,
 * and batch/stream parity on an in-order feed. */
class StreamSessionsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  // (key, ts, id, cents, type) — two users, gaps around the 10-min mark
  private val feed = Seq(
    ("a", ts(0), 1L, 100L, "x"),
    ("a", ts(10), 2L, 50L, "y"),   // gap exactly 10 min -> same session
    ("a", ts(21), 3L, 25L, "x"),   // gap 11 min -> NEW session
    ("b", ts(5), 4L, 10L, "z"))

  test("streaming sessions close via watermark; gap semantics match batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long, Long, String)]
    val stream = mem.toDF().toDF("key", "t", "id", "cents", "tp")
      .withWatermark("t", "1 minute")
    val sessions = StreamSessions.closedSessions(stream, "key", "t", "id",
      "cents", "tp", gapUs = 600L * 1000000L) // 10-min gap
    val q = sessions.writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      mem.addData(feed: _*)
      q.processAllAvailable()
      // batch 1 closes a's first session (broken by the in-batch 21-min
      // event); the post-batch watermark (10:20) then fires b's timeout
      // (closes at 10:15) in the trailing no-data batch. a's second
      // session (closes at 10:31) must still be open.
      val afterFirst = spark.table("sess_sink")
        .select("key", "n_events", "sum_cents")
        .as[(String, Long, Long)].collect().toSet
      assert(afterFirst === Set(("a", 2L, 150L), ("b", 1L, 10L)))
      // advance watermark far past every last+gap -> timeouts close the rest
      mem.addData(("c", Timestamp.valueOf("2026-01-01 12:00:00"), 9L, 1L, "x"))
      q.processAllAvailable()
      mem.addData(("c", Timestamp.valueOf("2026-01-01 13:00:00"), 10L, 1L, "x"))
      q.processAllAvailable()
      val closed = spark.table("sess_sink")
        .select("key", "session_seq", "n_events", "start_us", "end_us",
          "duration_us", "sum_cents", "n_types")
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      // batch ground truth over the same four-event feed
      val batch = EventOps.sessionSummary(
          feed.toDF("key", "t", "id", "cents", "tp")
            .withColumn("v", col("cents") / 100.0),
          Seq("key"), "t", "id", gapUs = 600L * 1000000L, "v", "tp")
        .select(col("key"), col("session_seq"), col("n_events"),
          col("start_us"), col("end_us"), col("duration_us"),
          (col("sum_value") * 100).cast("long"), col("n_types"))
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(batch.subsetOf(closed)) // every batch session closed & equal
      assert(closed.filter(_._1 != "c") === batch)
    } finally q.stop()
  }

  test("cross-batch straggler older than start-gap becomes its own " +
      "out-of-band session (seq 0), never merged backwards") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long, Long, String)]
    val stream = mem.toDF().toDF("key", "t", "id", "cents", "tp")
      .withWatermark("t", "2 hours") // wide: the straggler must ARRIVE
    val sessions = StreamSessions.closedSessions(stream, "key", "t", "id",
      "cents", "tp", gapUs = 600L * 1000000L)
    val q = sessions.writeStream.format("memory").queryName("sess_sink2")
      .outputMode("append").start()
    try {
      mem.addData(("a", ts(50), 1L, 5L, "x")) // open session at 10:50
      q.processAllAvailable()
      // 10:00 straggler: 50 min before start, gap is 10 min -> can never
      // merge under batch semantics -> immediate single-event session
      mem.addData(("a", ts(0), 2L, 7L, "y"))
      q.processAllAvailable()
      val got = spark.table("sess_sink2")
        .select("key", "session_seq", "n_events", "sum_cents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === Set(("a", 0L, 1L, 7L))) // the 10:50 session stays open
    } finally q.stop()
  }

  test("multiple far-past stragglers in one batch gap-merge into chain " +
      "sessions (batch semantics), not per-event singletons") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long, Long, String)]
    val stream = mem.toDF().toDF("key", "t", "id", "cents", "tp")
      .withWatermark("t", "2 hours")
    val sessions = StreamSessions.closedSessions(stream, "key", "t", "id",
      "cents", "tp", gapUs = 600L * 1000000L)
    val q = sessions.writeStream.format("memory").queryName("sess_sink3")
      .outputMode("append").start()
    try {
      mem.addData(("a", ts(50), 1L, 5L, "x")) // open session at 10:50
      q.processAllAvailable()
      // one batch of three stragglers: 10:00 and 10:05 are within the
      // 10-min gap of each other -> ONE chain session; 10:30 is 25 min
      // past 10:05 -> its own chain session (and 20 min before the open
      // 10:50 start, so it never merges forward either)
      mem.addData(("a", ts(0), 2L, 7L, "y"), ("a", ts(5), 3L, 3L, "y"),
        ("a", ts(30), 4L, 11L, "z"))
      q.processAllAvailable()
      val got = spark.table("sess_sink3")
        .select("key", "session_seq", "n_events", "sum_cents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === Set(("a", 0L, 2L, 10L), ("a", 0L, 1L, 11L)))
    } finally q.stop()
  }

  test("straggler chain merges INTO the open session when an in-gap event " +
      "extends the session down to within a gap of the chain") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long, Long, String)]
    val stream = mem.toDF().toDF("key", "t", "id", "cents", "tp")
      .withWatermark("t", "2 hours")
    val sessions = StreamSessions.closedSessions(stream, "key", "t", "id",
      "cents", "tp", gapUs = 600L * 1000000L)
    val q = sessions.writeStream.format("memory").queryName("sess_sink4")
      .outputMode("append").start()
    try {
      mem.addData(("a", ts(50), 1L, 5L, "x")) // open session at 10:50
      q.processAllAvailable()
      // 10:35 is 15 min before start -> straggler; 10:42 is in-gap (8 min)
      // and extends the session down to 10:42, which is 7 min past 10:35 —
      // batch semantics (gaps 7, 8 <= 10) say ONE session of all three
      mem.addData(("a", ts(35), 2L, 7L, "y"), ("a", ts(42), 3L, 3L, "z"))
      q.processAllAvailable()
      assert(spark.table("sess_sink4").isEmpty) // nothing closed yet
      // advance the watermark far past last+gap -> the merged session closes
      mem.addData(("b", Timestamp.valueOf("2026-01-01 14:00:00"), 9L, 1L, "x"))
      q.processAllAvailable()
      val got = spark.table("sess_sink4").where(col("key") === "a")
        .select("key", "session_seq", "n_events", "sum_cents", "start_us",
          "n_types")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val startUs = ts(35).getTime * 1000L
      assert(got === Set(("a", 1L, 3L, 15L, startUs, 3L)))
    } finally q.stop()
  }
}
