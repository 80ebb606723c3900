package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{AviFrameMeans, AviMjpegStats, JpegPixelStats,
  MediaExtra, Multimodal}

/**
 * AVI/MJPEG video decode specs. The oracle query (m_video_avi) only
 * exercises the byte-aligned solid-gray JPEG shape, so this suite
 * builds AVI containers around REAL ImageIO-encoded JPEG frames
 * (compressed multi-coefficient entropy streams — the same independent
 * codec pin MediaPixelSpec uses) and checks the demux aggregates the
 * per-frame pixel moments exactly as frame-by-frame JpegPixelStats
 * does. Structural edges: interleaved audio chunks skipped, header-only
 * AVI, odd-chunk padding, truncation rejects, and the extractFeatures /
 * sniffKind wiring.
 */
class MediaVideoSpec extends SparkTestBase {

  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag.getBytes); out.write(le32(body.length)); out.write(body)
    if (body.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes ++ body)

  /** Minimal but structurally complete AVI: hdrl(avih + strl) + movi. */
  private def avi(usPerFrame: Int, totalFrames: Int, w: Int, h: Int,
      movi: Array[Byte]): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(totalFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes ++ "MJPG".getBytes ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(usPerFrame) ++
      le32(1000000) ++ le32(0) ++ le32(totalFrames) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      "MJPG".getBytes ++ Array.fill[Byte](20)(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val body = "AVI ".getBytes ++ hdrl ++ list("movi", movi)
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  private def jpegFrame(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        ((x * 11 + seed) % 256 << 16) | ((y * 17 + seed * 3) % 256 << 8) |
          ((x + y + seed * 7) % 256))
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bo)
    bo.toByteArray
  }

  test("demux of ImageIO MJPEG frames equals frame-by-frame JPEG stats") {
    val frames = Seq(jpegFrame(1, 24, 16), jpegFrame(2, 24, 16),
      jpegFrame(9, 24, 16))
    val movi = frames.map(chunk("00dc", _)).reduce(_ ++ _)
    val payload = avi(40000, frames.length, 24, 16, movi)
    val got = AviMjpegStats.scan(payload)
    assert(got != null)
    val per = frames.map(JpegPixelStats.scan)
    assert(per.forall(_ != null), "ImageIO frames must decode")
    assert(got(0) == 24 && got(1) == 16 && got(2) == 40000)
    assert(got(3) == 3 && got(4) == 3)
    assert(got(5) == per.map(_(2)).sum)   // sum_r
    assert(got(6) == per.map(_(3)).sum)   // sum_g
    assert(got(7) == per.map(_(4)).sum)   // sum_b
    assert(got(8) == per.map(_(5)).sum)   // n_px
    assert(got(9) == per.map(_(6)).min)   // min_ch
    assert(got(10) == per.map(_(7)).max)  // max_ch
    assert(got(11) == per.map(_(8)).sum)  // sq_r
    assert(got(14) == 3L * 40000 / 1000)  // duration_ms
  }

  test("interleaved audio chunks and undecodable frames are skipped") {
    val f = jpegFrame(4, 16, 16)
    val movi = chunk("01wb", Array.fill[Byte](33)(7)) ++ // audio, odd len
      chunk("00dc", f) ++
      chunk("00dc", Array[Byte](1, 2, 3, 4)) ++ // not a JPEG
      chunk("00db", f)
    val payload = avi(20000, 2, 16, 16, movi)
    val got = AviMjpegStats.scan(payload)
    assert(got != null && got(4) == 2, "two decodable frames")
    val one = JpegPixelStats.scan(f)
    assert(got(5) == 2 * one(2) && got(8) == 2 * one(5))
  }

  test("header-only AVI keeps geometry; malformed payloads reject") {
    val empty = avi(50000, 0, 320, 240, Array.empty[Byte])
    val got = AviMjpegStats.scan(empty)
    assert(got != null)
    assert(got(0) == 320 && got(1) == 240 && got(4) == 0)
    assert(got(9) == -1 && got(10) == -1, "no-frame sentinel")
    val riffWave = "RIFF".getBytes ++ le32(8) ++ "WAVE".getBytes ++
      Array.fill[Byte](60)(0)
    assert(AviMjpegStats.scan(riffWave) == null, "WAVE is not AVI")
    val f = jpegFrame(5, 16, 8)
    val ok = avi(20000, 1, 16, 8, chunk("00dc", f))
    assert(AviMjpegStats.scan(ok) != null)
    assert(AviMjpegStats.scan(ok.dropRight(3)) == null, "truncated chunk")
    assert(AviMjpegStats.scan(java.util.Arrays.copyOf(ok, 40)) == null)
  }

  test("per-frame means preserve stream order through nested rec lists") {
    val fs = (0 until 5).map(i => jpegFrame(i * 3 + 1, 16, 8))
    // frames 1+2 grouped in a nested 'rec ' list between plain chunks —
    // the per-frame walk must still emit 0,1,2,3,4 in stream order
    val movi = chunk("00dc", fs(0)) ++
      list("rec ", chunk("00dc", fs(1)) ++ chunk("00dc", fs(2))) ++
      chunk("00dc", fs(3)) ++ chunk("00dc", fs(4))
    val payload = avi(40000, 5, 16, 8, movi)
    val got = AviFrameMeans.scan(payload)
    assert(got != null && got(0) == 5)
    fs.zipWithIndex.foreach { case (f, i) =>
      val px = JpegPixelStats.scan(f)
      assert(got(1 + 4 * i) == px(2) && got(2 + 4 * i) == px(3) &&
        got(3 + 4 * i) == px(4) && got(4 + 4 * i) == px(5),
        s"frame $i out of order")
    }
    // aggregate scan agrees with the per-frame sums
    val agg = AviMjpegStats.scan(payload)
    assert(agg(5) == fs.map(f => JpegPixelStats.scan(f)(2)).sum)
    // truncation still rejects
    assert(AviFrameMeans.scan(payload.dropRight(2)) == null)
  }

  test("aviScan Column, sniffKind and extractFeatures use the real demux") {
    val f1 = jpegFrame(6, 16, 16); val f2 = jpegFrame(7, 16, 16)
    val payload = avi(40000, 2, 16, 16,
      chunk("00dc", f1) ++ chunk("00dc", f2))
    val df = Seq((1L, payload)).toDF("id", "payload")
    val arr = df.select(MediaExtra.aviScan(col("payload")))
      .head().getSeq[Long](0).toArray
    assert(arr.sameElements(AviMjpegStats.scan(payload)))
    // sniff: RIFF+AVI is video, RIFF+WAVE stays audio
    val wav = "RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes
    val sniff = Seq((1L, payload), (2L, wav)).toDF("media_id", "payload")
      .select(Multimodal.sniffKind(col("payload")))
      .as[String].collect().toSeq
    assert(sniff == Seq("video", "audio"))
    // extractFeatures: dims/duration/frames/embedding from the demux
    val rows = Seq(Multimodal.MediaRow(9L, "video", payload,
      Map.empty[String, String])).toDS()
    val feat = Multimodal.extractFeatures(rows).head()
    assert(feat.width == 16 && feat.height == 16)
    assert(feat.duration_ms == 2L * 40000 / 1000 && feat.frame_count == 2)
    val moments = Multimodal.ContentEmbed.videoMoments(payload)
    assert(moments != null)
    assert(feat.embedding.sameElements(
      Multimodal.ContentEmbed.imageEmbed(moments)),
      "video embedding must come from decoded frames, not the stub")
  }
}
