package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.streaming.StreamAsof

/** Streaming as-of join: watermark-sealed emission equals the batch
 * union-window operator on watermark-respecting feeds. */
class StreamAsofSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  test("streaming as-of: latest at-or-before, watermark-sealed, " +
      "unmatched left, cross-batch right buffering") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, Timestamp, Long)]
    val rMem = MemoryStream[(String, Timestamp, String)]
    val lDf = lMem.toDF().toDF("k", "t", "id").withWatermark("t", "1 minute")
    val rDf = rMem.toDF().toDF("k", "t", "p").withWatermark("t", "1 minute")
    val q = StreamAsof.enrich(lDf, rDf, "k", "t", "t", "id", "p")
      .writeStream.format("memory").queryName("asof_sink")
      .outputMode("append").start()
    try {
      rMem.addData(("a", ts(0), "r1"), ("a", ts(30), "r2"))
      lMem.addData(("a", ts(15), 1L), ("b", ts(20), 9L))
      q.processAllAvailable()
      // watermark after batch 1 = 10:30 - 1min = 10:29 -> left 10:15 and
      // b's 10:20 are sealed in the next trigger's state round
      lMem.addData(("a", ts(45), 2L))
      rMem.addData(("a", ts(40), "r3"))
      q.processAllAvailable()
      val afterTwo = spark.table("asof_sink")
        .select("id", "payload", "asof_lag_us")
        .as[(Long, Option[String], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(afterTwo(1L) === ((Some("r1"), Some(15L * 60L * 1000000L))))
      assert(afterTwo(9L) === ((None, None))) // key b has no rights
      assert(!afterTwo.contains(2L))          // 10:45 not sealed yet
      // a far-future event drives the watermark past everything
      // far-future events on BOTH streams: the global watermark is the
      // MIN across inputs, so the right stream must advance too
      lMem.addData(("z", Timestamp.valueOf("2026-01-01 12:00:00"), 99L))
      rMem.addData(("z", Timestamp.valueOf("2026-01-01 12:00:00"), "rz"))
      q.processAllAvailable()
      lMem.addData(("z", Timestamp.valueOf("2026-01-01 13:00:00"), 98L))
      rMem.addData(("z", Timestamp.valueOf("2026-01-01 13:00:00"), "rz"))
      q.processAllAvailable()
      val fin = spark.table("asof_sink")
        .select("id", "payload", "asof_lag_us")
        .as[(Long, Option[String], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(fin(2L) === ((Some("r3"), Some(5L * 60L * 1000000L))))
    } finally q.stop()
  }

  test("streaming as-of tolerance nulls stale matches") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, Timestamp, Long)]
    val rMem = MemoryStream[(String, Timestamp, String)]
    val lDf = lMem.toDF().toDF("k", "t", "id").withWatermark("t", "1 minute")
    val rDf = rMem.toDF().toDF("k", "t", "p").withWatermark("t", "1 minute")
    val q = StreamAsof.enrich(lDf, rDf, "k", "t", "t", "id", "p",
        toleranceUs = Some(10L * 60L * 1000000L)) // 10 minutes
      .writeStream.format("memory").queryName("asof_sink_tol")
      .outputMode("append").start()
    try {
      rMem.addData(("a", ts(0), "r1"))
      lMem.addData(("a", ts(5), 1L), ("a", ts(25), 2L))
      rMem.addData(("z", Timestamp.valueOf("2026-01-01 12:00:00"), "rz"))
      q.processAllAvailable()
      lMem.addData(("z", Timestamp.valueOf("2026-01-01 13:00:00"), 98L))
      rMem.addData(("z", Timestamp.valueOf("2026-01-01 13:00:00"), "rz"))
      q.processAllAvailable()
      val got = spark.table("asof_sink_tol")
        .select("id", "payload").as[(Long, Option[String])].collect().toMap
      assert(got(1L) === Some("r1"))  // lag 5 min, inside tolerance
      assert(got(2L) === None)        // lag 25 min > 10 min
    } finally q.stop()
  }

  test("property: streaming as-of == batch asofJoin on a random " +
      "watermark-respecting feed") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // in-order feed (each batch's events at-or-after the previous max
    // minus the delay): emit in three time-ordered chunks
    // right timestamps unique (sec = 7i mod 60, two i per minute) — the
    // batch operator's tie-break among EQUAL-ts rights is window-order
    // arbitrary, so the parity feed avoids right-side ts ties
    val rights = (1 to 40).map(i =>
      (s"k${rnd.nextInt(4)}", ts(i / 2, (i * 7) % 60), s"p$i"))
      .sortBy(_._2.getTime)
    val lefts = (1 to 40).map(i =>
      (s"k${rnd.nextInt(4)}", ts(i / 2, rnd.nextInt(60)), i.toLong))
      .sortBy(_._2.getTime)
    val lMem = MemoryStream[(String, Timestamp, Long)]
    val rMem = MemoryStream[(String, Timestamp, String)]
    val lDf = lMem.toDF().toDF("k", "t", "id").withWatermark("t", "1 minute")
    val rDf = rMem.toDF().toDF("k", "t", "p").withWatermark("t", "1 minute")
    val q = StreamAsof.enrich(lDf, rDf, "k", "t", "t", "id", "p")
      .writeStream.format("memory").queryName("asof_sink_prop")
      .outputMode("append").start()
    try {
      for (chunk <- 0 until 3) {
        rMem.addData(rights.slice(chunk * 14, (chunk + 1) * 14): _*)
        lMem.addData(lefts.slice(chunk * 14, (chunk + 1) * 14): _*)
        q.processAllAvailable()
      }
      lMem.addData(("zz", Timestamp.valueOf("2026-01-01 14:00:00"), 999L))
      rMem.addData(("zz", Timestamp.valueOf("2026-01-01 14:00:00"), "rz"))
      q.processAllAvailable()
      lMem.addData(("zz", Timestamp.valueOf("2026-01-01 15:00:00"), 998L))
      rMem.addData(("zz", Timestamp.valueOf("2026-01-01 15:00:00"), "rz"))
      q.processAllAvailable()
      val got = spark.table("asof_sink_prop")
        .where(col("key") =!= "zz")
        .select("id", "payload", "asof_lag_us")
        .as[(Long, Option[String], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = EventOps.asofJoin(
          lefts.toDF("k", "t", "id"), rights.toDF("k", "t", "p"),
          Seq("k"), "t", "t", Seq("p"))
        .select("id", "p", "asof_lag_us")
        .as[(Long, Option[String], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet === batch.keySet)
      got.keys.foreach(k => assert(got(k) === batch(k), s"left id $k"))
    } finally q.stop()
  }
}
