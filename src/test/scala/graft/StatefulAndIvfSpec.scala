package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.Similarity
import graft.spec._
import graft.streaming.StatefulChecks

class StatefulAndIvfSpec extends SparkTestBase {

  import spark.implicits._

  val model = ModelSpec("m", Seq(
    FieldSpec("score", IntSpec(ge = Some(0)))))

  test("flatMapGroupsWithState: streak alert fires when k consecutive invalids arrive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF().toDF("src", "score")
    val alerts = StatefulChecks.invalidStreakAlerts(stream, model, "src",
      threshold = 3)
    val q = alerts.toDF().writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      // one row per microbatch per key -> deterministic streak order;
      // state carries ACROSS microbatches (the point of GroupState)
      mem.addData(("a", -1L), ("b", 5L)); q.processAllAvailable()
      mem.addData(("a", -1L), ("b", -1L)); q.processAllAvailable()
      assert(spark.table("alerts").count() == 0) // a-streak=2, b-streak=1
      mem.addData(("a", -1L)); q.processAllAvailable()
      val rows = spark.table("alerts")
        .select("key", "streak").as[(String, Long)].collect().toSet
      assert(rows == Set(("a", 3L)))
      // valid row resets the streak; next 3 invalids re-alert
      mem.addData(("a", 1L)); q.processAllAvailable()
      mem.addData(("a", -1L)); q.processAllAvailable()
      mem.addData(("a", -1L)); q.processAllAvailable()
      mem.addData(("a", -1L)); q.processAllAvailable()
      assert(spark.table("alerts").filter(col("key") === "a").count() == 2)
    } finally q.stop()
  }

  test("IVF: assignment picks nearest centroid; probed search finds the neighbor") {
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.95f, 0.05f)), (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0f, 1f)), (5L, Seq(0.05f, 0.95f)), (6L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val assigned = df.select(col("vec_id"),
      Similarity.ivfAssign(col("embedding"), centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(assigned == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    // nprobe=1: query 1 only probes cell 0; rank-1 neighbor is 2
    val top = Similarity.annIvf(df.filter(col("vec_id") === 1), df,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 2, dim = 2, centroids = centroids, nprobe = 1)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(top == Set((1L, 2L), (2L, 3L)))
    // nprobe=2 searches both cells: same top-2 here, but candidates include cell 1
    val top2 = Similarity.annIvf(df.filter(col("vec_id") === 1), df,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, dim = 2, centroids = centroids, nprobe = 2)
    assert(top2.count() == 5)
    // centroid sampling is deterministic and returns <= k rows
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 2)
    assert(cents.size == 2 && cents == Similarity.ivfCentroids(df, "vec_id", "embedding", 2))
  }

  test("IVF native VectorNearestCells is bit-identical to the Column-chain form") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroidsPortable(e, "vec_id", "embedding", 8)
    assert(cents.size == 8 && cents.map(_._1) == (0 until 8))
    val cmp = e.select(
      Similarity.ivfAssign(col("embedding"), cents).as("native"),
      Similarity.ivfAssignChain(col("embedding"), cents).as("chain"),
      Similarity.ivfProbes(col("embedding"), cents, 3).as("nprobes"),
      Similarity.ivfProbesChain(col("embedding"), cents, 3).as("cprobes"))
    assert(cmp.filter(col("native") =!= col("chain") ||
      col("nprobes") =!= col("cprobes")).count() == 0)
    // null vector: every chain d2 is NULL -> tie-reduce keeps cell 0 and
    // probes fall back to the first cids in order (matches the oracle's
    // ORDER BY d2, cid with all-NULL ties)
    val nullRow = e.limit(1).select(
      Similarity.ivfAssign(lit(null).cast("array<float>"), cents).as("c"),
      Similarity.ivfProbes(lit(null).cast("array<float>"), cents, 2).as("p"))
      .collect().head
    assert(nullRow.getInt(0) == 0 && nullRow.getSeq[Int](1) == Seq(0, 1))
    // short vector (chain: past-end element_at nulls every d2) -> same
    val shortRow = e.limit(1).select(
      Similarity.ivfAssign(array(lit(1.0f)), cents).as("c")).collect().head
    assert(shortRow.getInt(0) == 0)
    // NaN component: all d2 NaN tie under SQL double ordering -> probes
    // are the first cids in order, NOT a duplicated cell
    val nanVec = array((lit(Float.NaN) +: Seq.fill(63)(lit(0.0f))): _*)
    val nanRow = e.limit(1).select(
      Similarity.ivfProbes(nanVec, cents, 2).as("p")).collect().head
    assert(nanRow.getSeq[Int](0) == Seq(0, 1))
  }

  test("fail_fast list keeps only the first element violation (list.rs:21)") {
    val spec = ListSpec(IntSpec(ge = Some(0)), failFast = true)
    val got = run(spec, ArrayType(LongType), Seq(Seq(-1L, -2L, -3L)))
    assert(got.head._2 == Seq("greater_than_equal")) // one, not three
    val all = run(ListSpec(IntSpec(ge = Some(0))), ArrayType(LongType),
      Seq(Seq(-1L, -2L, -3L)))
    assert(all.head._2.size == 3)
  }
}
