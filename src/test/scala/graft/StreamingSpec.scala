package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.spec._
import graft.streaming.StreamValidator

class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  val model = ModelSpec("ev", Seq(
    FieldSpec("user", StrSpec(minLength = Some(1))),
    FieldSpec("score", IntSpec(ge = Some(0), le = Some(100)))))

  test("same compiled plan attaches to a memory stream; violations sink appends") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF().toDF("user", "score")
    val q = StreamValidator.violations(stream, model, Seq("user"))
      .writeStream.format("memory").queryName("viol_sink")
      .outputMode("append").start()
    try {
      mem.addData(("alice", 50L), ("bob", 200L), ("", 5L))
      q.processAllAvailable()
      val rows = spark.table("viol_sink")
        .select("user", "type").as[(String, String)].collect().toSet
      assert(rows == Set(("bob", "less_than_equal"), ("", "string_too_short")))
      // second microbatch: incremental append, no reprocessing
      mem.addData(("carol", -1L))
      q.processAllAvailable()
      assert(spark.table("viol_sink").count() == 3)
    } finally q.stop()
  }

  test("watermarked window aggregation bounds state and counts violations") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val stream = mem.toDF().toDF("ts", "user", "score")
    val agg = StreamValidator.violationRateByWindow(stream, model,
      "ts", "10 minutes", lateness = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_sink")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:01:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:05:00")
      val t2 = Timestamp.valueOf("2026-01-01 11:00:00") // advances watermark past w0
      mem.addData((t0, "a", 50L), (t1, "b", 999L))
      q.processAllAvailable()
      mem.addData((t2, "c", 1L))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 12:00:00"), "d", 1L))
      q.processAllAvailable()
      val first = spark.table("win_sink")
        .filter(col("window_start") === Timestamp.valueOf("2026-01-01 10:00:00"))
        .select("row_count", "invalid_rows").as[(Long, Long)].collect()
      assert(first.toSeq == Seq((2L, 1L))) // 2 rows in 10:00 window, 1 invalid
    } finally q.stop()
  }

  test("file stream: exactly-once violation sink with checkpoint resume") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckp = Files.createTempDirectory("graft-stream-ckp").toString
    val batch1 = Seq(("alice", 50L), ("bob", 200L)).toDF("user", "score")
    batch1.write.mode("append").parquet(src)
    val schema = batch1.schema
    val w = StreamValidator.runFileStream(spark, src, schema, model,
      Seq("user"), out, ckp)
    val q1 = w.start(); q1.awaitTermination(60000)
    val after1 = spark.read.parquet(out).count()
    assert(after1 == 1) // bob only
    // new files arrive; restart from checkpoint processes ONLY the delta
    Seq(("x", -5L)).toDF("user", "score").write.mode("append").parquet(src)
    val q2 = StreamValidator.runFileStream(spark, src, schema, model,
      Seq("user"), out, ckp).start()
    q2.awaitTermination(60000)
    val rows = spark.read.parquet(out)
      .select("user", "type").as[(String, String)].collect().toSet
    assert(rows == Set(("bob", "less_than_equal"), ("x", "greater_than_equal")))
  }
}
