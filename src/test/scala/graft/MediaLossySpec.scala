package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{AdpcmStats, G711, G711Stats, MediaExtra, Multimodal}

/**
 * Lossy-audio decode specs. G.711 is pinned VALUE-BY-VALUE against the
 * JDK's own independent mu-law/A-law codec (javax.sound.sampled — the
 * same cross-implementation discipline as MediaPixelSpec's ImageIO JPEG
 * pin), plus the published table anchors. IMA ADPCM is exercised with an
 * independent test-side ENCODER (the published IMA quantizer) and the
 * lossy reconstruction bound, plus the clamp paths (s16 predictor, 0..88
 * index) and the WAV plumbing edges (multi-block, odd block pad, format
 * rejects).
 */
class MediaLossySpec extends SparkTestBase {

  import spark.implicits._

  // --------------------------------------------------------- G.711 maps

  /** Decode all 256 companded bytes through the JDK codec. */
  private def jdkG711(ulaw: Boolean): Array[Int] = {
    import javax.sound.sampled._
    val enc = if (ulaw) AudioFormat.Encoding.ULAW else AudioFormat.Encoding.ALAW
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false) // little-endian s16
    val bytes = Array.tabulate[Byte](256)(i => i.toByte)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), src, 256)
    val out = AudioSystem.getAudioInputStream(dst, in)
    val buf = out.readAllBytes()
    assert(buf.length == 512)
    Array.tabulate(256)(i =>
      ((buf(2 * i) & 0xFF) | (buf(2 * i + 1) << 8)).toShort.toInt)
  }

  test("ulaw expansion matches the JDK codec on all 256 bytes") {
    val jdk = jdkG711(ulaw = true)
    (0 until 256).foreach { b =>
      assert(G711.ulawToLinear(b) == jdk(b), s"byte $b")
    }
  }

  test("alaw expansion matches the JDK codec on all 256 bytes") {
    val jdk = jdkG711(ulaw = false)
    (0 until 256).foreach { b =>
      assert(G711.alawToLinear(b) == jdk(b), s"byte $b")
    }
  }

  test("published G.711 table anchors and sign symmetry") {
    assert(G711.ulawToLinear(0x00) == -32124)
    assert(G711.ulawToLinear(0x80) == 32124)
    assert(G711.ulawToLinear(0x7F) == 0)
    assert(G711.ulawToLinear(0xFF) == 0)
    assert(G711.alawToLinear(0x55) == -8)
    assert(G711.alawToLinear(0xD5) == 8)
    assert(G711.alawToLinear(0x2A) == -32256)
    assert(G711.alawToLinear(0xAA) == 32256)
    (0 until 256).foreach { b =>
      assert(G711.ulawToLinear(b) == -G711.ulawToLinear(b ^ 0x80))
      assert(G711.alawToLinear(b) == -G711.alawToLinear(b ^ 0x80))
    }
  }

  // ------------------------------------------------------ WAV builders

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def g711Wav(fmtTag: Int, ch: Int, rate: Int,
      data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(38 + data.length))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(18))
    out.write(le16(fmtTag)); out.write(le16(ch)); out.write(le32(rate))
    out.write(le32(rate * ch)); out.write(le16(ch)); out.write(le16(8))
    out.write(le16(0))
    out.write("data".getBytes); out.write(le32(data.length))
    out.write(data)
    if (data.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  private def adpcmWav(rate: Int, blockAlign: Int,
      data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val pad = data.length % 2
    out.write("RIFF".getBytes); out.write(le32(40 + data.length + pad))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(20))
    out.write(le16(0x11)); out.write(le16(1)); out.write(le32(rate))
    out.write(le32(rate)); out.write(le16(blockAlign)); out.write(le16(4))
    out.write(le16(2)); out.write(le16((blockAlign - 4) * 2 + 1))
    out.write("data".getBytes); out.write(le32(data.length))
    out.write(data)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** Reference stats over decoded samples — independent of the scans'
   * internal loops (same 9 slots). */
  private def stats(ch: Int, rate: Int, s: Array[Int]): Array[Long] = {
    var sumAbs = 0L; var peak = 0L; var clip = 0L; var sq = 0L; var zc = 0L
    val prev = Array.fill(ch)(Option.empty[Boolean])
    s.zipWithIndex.foreach { case (v, k) =>
      val a = math.abs(v).toLong
      sumAbs += a; sq += v.toLong * v
      if (a > peak) peak = a
      if (a >= 32767) clip += 1
      val c = k % ch; val neg = v < 0
      if (prev(c).exists(_ != neg)) zc += 1
      prev(c) = Some(neg)
    }
    Array(ch, rate, s.length / ch, sumAbs, peak, clip, sq, zc, 16L)
  }

  test("g711Scan: varied multi-channel streams match JDK-decoded stats") {
    val jdkU = jdkG711(ulaw = true); val jdkA = jdkG711(ulaw = false)
    for {
      (tag, map) <- Seq((7, jdkU), (6, jdkA))
      ch <- Seq(1, 2, 4)
    } {
      val n = 37 * ch // odd data length for ch=1 exercises the pad path
      val data = Array.tabulate[Byte](n)(i => ((i * 29 + 5 * tag) % 256).toByte)
      val wav = g711Wav(tag, ch, 16000, data)
      val got = G711Stats.scan(wav)
      val want = stats(ch, 16000, data.map(b => map(b & 0xFF)))
      assert(got != null && got.sameElements(want), s"tag=$tag ch=$ch")
    }
  }

  test("g711Scan rejects non-G.711 and malformed payloads") {
    val pcmLike = g711Wav(1, 1, 8000, Array.fill[Byte](10)(1))
    assert(G711Stats.scan(pcmLike) == null)          // PCM tag
    val ok = g711Wav(7, 1, 8000, Array.fill[Byte](10)(1))
    assert(G711Stats.scan(ok) != null)
    assert(G711Stats.scan(ok.dropRight(3)) == null)  // truncated chunk
    val empty = g711Wav(7, 1, 8000, Array.empty[Byte])
    assert(G711Stats.scan(empty) == null)            // empty data chunk
    val badCh = g711Wav(7, 3, 8000, Array.fill[Byte](10)(1))
    assert(G711Stats.scan(badCh) == null)            // 10 % 3 != 0
  }

  // ----------------------------------------------------------- IMA ADPCM

  /** Independent test-side IMA ADPCM ENCODER (the published quantizer:
   * nibble = sign + 3-bit magnitude of diff/step), one mono block. */
  private def imaEncode(samples: Array[Int], pred0: Int,
      idx0: Int): Array[Byte] = {
    var pred = pred0; var idx = idx0
    val nibs = samples.map { want =>
      val st = AdpcmStats.StepTable(idx)
      var diff = want - pred
      var nib = 0
      if (diff < 0) { nib = 8; diff = -diff }
      if (diff >= st) { nib |= 4; diff -= st }
      if (diff >= st / 2) { nib |= 2; diff -= st / 2 }
      if (diff >= st / 4) { nib |= 1 }
      val packed = AdpcmStats.step(nib, pred, idx)
      pred = (packed >> 8).toInt; idx = (packed & 0xFF).toInt
      nib
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(le16(pred0 & 0xFFFF)); out.write(idx0); out.write(0)
    nibs.grouped(2).foreach { g =>
      out.write(g(0) | (g.lift(1).getOrElse(0) << 4))
    }
    out.toByteArray
  }

  test("adpcmScan: encoded sine reconstructs within the adaptive bound") {
    val n = 64 // 64 nibbles -> block of 4 + 32 bytes
    val src = Array.tabulate(n)(i =>
      (12000 * math.sin(i * 0.35)).toInt)
    val block = imaEncode(src, pred0 = 0, idx0 = 20)
    assert(block.length == 36)
    val wav = adpcmWav(22050, block.length, block)
    val got = AdpcmStats.scan(wav)
    assert(got != null)
    assert(got(0) == 1 && got(1) == 22050 && got(2) == n + 1)
    // replay the decode independently to recover the sample sequence,
    // then check the codec's lossy error stays within ~1.5 steps
    var pred = 0; var idx = 20
    val decoded = Array(0) ++ (0 until n).map { k =>
      val byte = block(4 + k / 2) & 0xFF
      val nib = if (k % 2 == 0) byte & 0x0F else (byte >> 4) & 0x0F
      val packed = AdpcmStats.step(nib, pred, idx)
      pred = (packed >> 8).toInt; idx = (packed & 0xFF).toInt
      // the adaptive step needs ~15 samples to climb from idx0 to the
      // sine's slew rate; after that the reconstruction must track
      // within two steps of the CURRENT (post-update) step size
      val err = math.abs(pred - src(k))
      if (k >= 16)
        assert(err <= AdpcmStats.StepTable(idx) * 2,
          s"sample $k err=$err")
      pred
    }
    val want = stats(1, 22050, decoded)
    assert(got.sameElements(want))
  }

  test("adpcmScan: predictor clamps at s16 and index clamps at 0/88") {
    // all-nibble-7 pushes the predictor up fast from near the ceiling
    val up = new java.io.ByteArrayOutputStream()
    up.write(le16(32000)); up.write(88); up.write(0)
    (0 until 8).foreach(_ => up.write(0x77))
    val gotUp = AdpcmStats.scan(adpcmWav(8000, 12, up.toByteArray))
    assert(gotUp != null)
    assert(gotUp(4) == 32767, "peak must hit the positive clamp")
    assert(gotUp(5) > 0, "clamped samples count as clipped")
    // all-nibble-0 at index 0 decays the step while index stays clamped
    val dn = new java.io.ByteArrayOutputStream()
    dn.write(le16(0xFFFF)); dn.write(0); dn.write(0) // pred0 = -1, idx 0
    (0 until 4).foreach(_ => dn.write(0x00))
    val gotDn = AdpcmStats.scan(adpcmWav(8000, 8, dn.toByteArray))
    assert(gotDn != null && gotDn(2) == 9)
    assert(gotDn(4) <= 7, "nibble-0 walk from -1 stays near zero")
  }

  test("adpcmScan: multi-block streams concatenate and rejects hold") {
    val b1 = imaEncode(Array.tabulate(16)(i => i * 500), 0, 10)
    val b2 = imaEncode(Array.tabulate(16)(i => -i * 700), -100, 40)
    assert(b1.length == b2.length)
    val wav = adpcmWav(8000, b1.length, b1 ++ b2)
    val got = AdpcmStats.scan(wav)
    assert(got != null && got(2) == 2 * (16 + 1))
    // stereo, wrong bit depth, bad index and truncation all reject
    val mono = adpcmWav(8000, b1.length, b1)
    assert(AdpcmStats.scan(mono) != null)
    val stereo = mono.clone
    stereo(22) = 2 // nChannels
    assert(AdpcmStats.scan(stereo) == null)
    val bits = mono.clone
    bits(34) = 8 // wBitsPerSample
    assert(AdpcmStats.scan(bits) == null)
    val badIdx = mono.clone
    badIdx(50) = 120 // block step index byte (offset 48 + 2) > 88
    assert(AdpcmStats.scan(badIdx) == null)
    assert(AdpcmStats.scan(mono.dropRight(1)) == null)
  }

  // ------------------------------------------- Column + embedding wiring

  test("g711/adpcm scans run as codegen'd Columns and feed audioMoments") {
    val jdkU = jdkG711(ulaw = true)
    val data = Array.tabulate[Byte](24)(i => (i * 37 % 256).toByte)
    val wavU = g711Wav(7, 2, 8000, data)
    val block = imaEncode(Array.tabulate(10)(i => i * 1000 - 3000), 50, 15)
    val wavA = adpcmWav(16000, block.length, block)
    val df = Seq((1L, wavU), (2L, wavA)).toDF("id", "payload")
    val rows = df.select(col("id"),
        MediaExtra.g711Scan(col("payload")).as("g"),
        MediaExtra.adpcmScan(col("payload")).as("a"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Long](1).toArray
      .sameElements(stats(2, 8000, data.map(b => jdkU(b & 0xFF)))))
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(1))
    assert(rows(1).getSeq[Long](2).nonEmpty)
    // audioMoments dispatches companded WAVs to the REAL decoders, so
    // the content embedding comes from decoded samples, not the stub
    val mU = Multimodal.ContentEmbed.audioMoments(wavU)
    assert(mU != null && mU.sameElements(G711Stats.scan(wavU)))
    val mA = Multimodal.ContentEmbed.audioMoments(wavA)
    assert(mA != null && mA.sameElements(AdpcmStats.scan(wavA)))
    val emb = Multimodal.ContentEmbed.audioEmbed(mU)
    assert(emb.length == 8 && emb.forall(f => !f.isNaN))
  }
}
