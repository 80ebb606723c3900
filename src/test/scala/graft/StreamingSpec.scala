package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.spec._
import graft.streaming.{StreamDedup, StreamValidator}

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

  test("model-level cross-field checks run on a stream, batch-identical " +
    "(gating included)") {
    implicit val sqlCtx = spark.sqlContext
    val m = model.copy(modelChecks = Seq(
      ModelCheck("user_score",
        s => length(s.getField("user")) <= s.getField("score"),
        "user length must not exceed score")))
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF().toDF("user", "score")
    val q = StreamValidator.violations(stream, m, Seq("user"))
      .writeStream.format("memory").queryName("cross_sink")
      .outputMode("append").start()
    try {
      // alice: clean fields, len 5 > score 3 -> model row (loc = ())
      // bob: clean everywhere; carol: FIELD error gates the model check
      // off even though len 5 > score -1
      mem.addData(("alice", 3L), ("bob", 50L), ("carol", -1L))
      q.processAllAvailable()
      val rows = spark.table("cross_sink")
        .select(col("user"), col("type"), size(col("loc")).as("n"))
        .as[(String, String, Int)].collect().toSet
      assert(rows == Set(("alice", "value_error", 0),
        ("carol", "greater_than_equal", 1)))
      // batch replay of the same rows matches the stream's output exactly
      val batch = graft.compile.ModelValidator.violations(
        Seq(("alice", 3L), ("bob", 50L), ("carol", -1L))
          .toDF("user", "score"), m, Seq("user"))
        .select(col("user"), col("type"), size(col("loc")).as("n"))
        .as[(String, String, Int)].collect().toSet
      assert(batch == rows)
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

  test("allow_partial on a stream: truncated JSON payloads validate incrementally") {
    // the reference feature's habitat: validating a streamed / truncated
    // LLM JSON output (pydantic allow_partial) — here as microbatches
    implicit val sqlCtx = spark.sqlContext
    import graft.spec._
    val payloadModel = ModelSpec("p", Seq(
      FieldSpec("payload", JsonSpec("struct<a bigint, tags array<string>>",
        inner = Some(ModelSpec("inner", Seq(
          FieldSpec("a", IntSpec(ge = Some(0)))))),
        allowPartial = Some("on")))))
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF().toDF("id", "payload")
    val q = StreamValidator.violations(stream, payloadModel, Seq("id"))
      .writeStream.format("memory").queryName("partial_sink")
      .outputMode("append").start()
    try {
      mem.addData(
        ("full", """{"a": 1, "tags": ["x"]}"""),
        ("truncated", """{"a": 2, "tags": ["x", "y"""),  // recovered
        ("badval", """{"a": -5, "tags": []"""),           // recovered, a<0
        ("garbage", """<html>not json"""))
      q.processAllAvailable()
      val rows = spark.table("partial_sink")
        .select("id", "type").as[(String, String)].collect().toSet
      assert(rows == Set(("badval", "greater_than_equal"),
        ("garbage", "json_invalid")))
    } finally q.stop()
  }

  test("streaming exact dedup: first arrival survives, in- and cross-batch dups drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "id", "text")
    val out = StreamDedup.exactDedupStream(stream, "text", "ts",
      lateness = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:01:00")
      // in-batch duplicate content (ids differ — key is the content hash)
      mem.addData((t0, 1L, "same doc"), (t0, 2L, "same doc"), (t0, 3L, "other"))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon
      mem.addData((t1, 4L, "same doc"), (t1, 5L, "third"))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("id").as[Long].collect().toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1) // exactly one copy kept
      assert(!ids.contains(4L))                    // cross-batch dup dropped
      assert(ids.contains(3L) && ids.contains(5L))
      // schema passes through unchanged (helper key column dropped)
      assert(out.schema.fieldNames.toSeq == Seq("ts", "id", "text"))
    } finally q.stop()
  }

  test("streaming simhash dedup: token-permuted boilerplate collides, distinct text survives") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "id", "text")
    val q = StreamDedup.simhashDedupStream(stream, "text", "ts")
      .writeStream.format("memory").queryName("sim_dedup_sink")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      val base = (1 to 40).map(i => s"tok$i").mkString(" ")
      val permuted = (1 to 40).reverse.map(i => s"tok$i").mkString(" ")
      val distinct = (100 to 140).map(i => s"z$i").mkString(" ")
      // simhash is token-order-insensitive: base and permuted share a key
      mem.addData((t0, 1L, base), (t0, 2L, permuted), (t0, 3L, distinct))
      q.processAllAvailable()
      val ids = spark.table("sim_dedup_sink").select("id").as[Long].collect().toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1)
      assert(ids.contains(3L))
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

  test("streaming PSI drift: windowed histogram vs batch reference; matches batch psi") {
    implicit val sqlCtx = spark.sqlContext
    import graft.checks.Drift
    import graft.streaming.StreamDrift
    // reference profile: uniform lengths 0..99 (10 buckets x 10 rows)
    val ref = (0 until 100).map(i => i.toDouble).toDF("len")
    val refHist = StreamDrift.referenceHistogram(ref, col("len"), 0, 100, 10)
    assert(refHist == Seq.fill(10)(10L))

    val mem = MemoryStream[(Timestamp, Double)]
    val stream = mem.toDF().toDF("ts", "len")
    val mon = StreamDrift.psiByWindow(stream, col("len"), "ts",
      lo = 0, hi = 100, nBuckets = 10, refHist = refHist,
      windowDur = "10 minutes", watermark = "5 minutes")
    val q = mon.writeStream.format("memory").queryName("drift_sink")
      .outputMode("append").start()
    try {
      // window A: same uniform shape -> psi ~ 0
      val ta = Timestamp.valueOf("2026-01-01 10:01:00")
      mem.addData((0 until 100).map(i => (ta, i.toDouble)): _*)
      // window B: all mass in one bucket -> large psi
      val tb = Timestamp.valueOf("2026-01-01 10:11:00")
      mem.addData((0 until 100).map(_ => (tb, 5.0)): _*)
      // advance watermark to close both
      mem.addData((Timestamp.valueOf("2026-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val out = spark.table("drift_sink")
        .select("window_start", "n_rows", "psi", "drifted")
        .as[(Timestamp, Long, Double, Boolean)].collect()
        .sortBy(_._1.getTime)
      assert(out.length >= 2)
      val a = out(0); val b = out(1)
      assert(a._2 == 100L && math.abs(a._3) < 1e-9 && !a._4)
      assert(b._2 == 100L && b._3 > 0.2 && b._4)
      // window PSI == batch PSI over the same rows (shared closed form)
      val batchRows = (0 until 100).map(_ => 5.0).toDF("len")
      val hist = Drift.histogram(batchRows, lit("w"),
        Drift.bucketize(col("len"), 0, 100, 10))
      val refH = Drift.histogram(ref, lit("all"),
        Drift.bucketize(col("len"), 0, 100, 10))
        .select(col("bucket"), col("cnt").as("ref_cnt"))
      val batchPsi = Drift.psi(hist, refH)
        .select("psi").as[Double].collect().head
      assert(math.abs(batchPsi - b._3) < 1e-12)
    } finally q.stop()
  }
}
