package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  lazy val media = Multimodal.synthetic(spark, 300L).cache()

  test("synthetic media is deterministic; features have the fixed schema") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(Multimodal.synthetic(spark, 300L))
      .collect().sortBy(_.media_id)
    assert(f1.map(_.sha256).toSeq == f2.map(_.sha256).toSeq)
    val img = f1.find(_.kind == "image").get
    assert(img.width > 0 && img.height > 0 && img.duration_ms == -1L)
    val vid = f1.find(_.kind == "video").get
    assert(vid.frame_count > 0 && vid.duration_ms > 0)
    val aud = f1.find(_.kind == "audio").get
    assert(aud.duration_ms > 0 && aud.width == -1)
    assert(f1.forall(_.embedding.length == 8))
    assert(f1.forall(f => f.byte_size >= 64))
  }

  test("column-only metadata checks: size, sha, magic sniffing") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
    val wav = Array[Byte](0x52, 0x49, 0x46, 0x46, 9, 9, 9)
    val df = Seq((1L, "image", png), (2L, "image", wav), (3L, "audio", wav))
      .toDF("media_id", "kind", "payload")
    val sniffed = df.select(col("media_id"),
      Multimodal.sniffKind(col("payload")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(sniffed == Map(1L -> "image", 2L -> "audio", 3L -> "audio"))
    // kind mismatch: declared image but RIFF bytes
    val bad = Multimodal.kindMismatch(df)
      .select("media_id").as[Long].collect().toSeq
    assert(bad == Seq(2L))
    val sizes = df.select(Multimodal.byteSize(col("payload")))
      .as[Int].collect().toSeq
    assert(sizes == Seq(7, 7, 7))
  }

  test("frame sampling plan: pure-expression sequence+explode") {
    val feats = Multimodal.extractFeatures(media.filter(col("kind") === "video"))
    val plan = Multimodal.frameSamplePlan(feats, everyMs = 1000L, maxFrames = 5)
    val byId = plan.groupBy("media_id").count()
    assert(byId.agg(max("count")).as[Long].head() <= 5)
    val one = plan.filter(col("media_id") === 2)
      .select("frame_idx", "offset_ms").as[(Int, Long)].collect().sortBy(_._1)
    assert(one.head == (0, 0L))
    assert(one.forall { case (i, off) => off == i * 1000L })
  }
}
