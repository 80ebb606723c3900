package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{FlacPcmStats, MediaExtra}

/**
 * FLAC content-decode specs. The oracle query (m_audio_flac) only
 * exercises single-frame CONSTANT subframes (the byte-aligned shape a
 * columnar synthesizer can produce), so this suite pins the decoder's
 * real paths with an INDEPENDENT test-side encoder implementing the
 * published format (RFC 9639): rice-coded FIXED and LPC subframes,
 * VERBATIM, escape-coded partitions, multi-frame streams, and the
 * left/side + mid/side stereo decorrelations. FLAC is lossless, so
 * every round-trip must reproduce the source samples' stats EXACTLY.
 */
class MediaAudioSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------- test-side encoder

  private final class BitW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit =
      (w - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def rice(w: BitW, v: Int, param: Int): Unit = {
    val u = (v << 1) ^ (v >> 31) // zigzag
    val q = u >>> param
    (0 until q).foreach(_ => w.bit(0)); w.bit(1)
    w.bits(u & ((1L << param) - 1), param)
  }

  /** subframe kinds the encoder can emit */
  sealed trait Sub
  case object Constant extends Sub
  case object Verbatim extends Sub
  case class Fixed(order: Int, param: Int) extends Sub
  case class Lpc1(coef: Int, shift: Int, param: Int) extends Sub
  case class FixedEscape(order: Int, rawBits: Int) extends Sub

  private def writeSubframe(w: BitW, s: Array[Int], bps: Int,
      kind: Sub): Unit = {
    w.bit(0) // pad
    kind match {
      case Constant =>
        require(s.forall(_ == s(0)))
        w.bits(0, 6); w.bit(0)
        w.bits(s(0).toLong & ((1L << bps) - 1), bps)
      case Verbatim =>
        w.bits(1, 6); w.bit(0)
        s.foreach(v => w.bits(v.toLong & ((1L << bps) - 1), bps))
      case Fixed(order, param) =>
        w.bits(8 + order, 6); w.bit(0)
        (0 until order).foreach(i =>
          w.bits(s(i).toLong & ((1L << bps) - 1), bps))
        w.bits(0, 2); w.bits(0, 4) // rice 4-bit params, partition order 0
        w.bits(param, 4)
        (order until s.length).foreach { i =>
          val r = order match {
            case 0 => s(i)
            case 1 => s(i) - s(i - 1)
            case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
          }
          rice(w, r, param)
        }
      case Lpc1(coef, shift, param) =>
        w.bits(32, 6); w.bit(0) // LPC order 1
        w.bits(s(0).toLong & ((1L << bps) - 1), bps)
        w.bits(4, 4)            // precision-1 -> 5-bit coefficients
        w.bits(shift, 5)
        w.bits(coef.toLong & 31, 5)
        w.bits(1, 2); w.bits(0, 4) // rice2 5-bit params, one partition
        w.bits(param, 5)
        (1 until s.length).foreach { i =>
          val pred = ((coef.toLong * s(i - 1)) >> shift).toInt
          rice(w, s(i) - pred, param)
        }
      case FixedEscape(order, rawBits) =>
        w.bits(8 + order, 6); w.bit(0)
        (0 until order).foreach(i =>
          w.bits(s(i).toLong & ((1L << bps) - 1), bps))
        w.bits(0, 2); w.bits(0, 4)
        w.bits(15, 4) // escape: verbatim residual at rawBits width
        w.bits(rawBits, 5)
        (order until s.length).foreach { i =>
          val r = order match {
            case 0 => s(i)
            case 1 => s(i) - s(i - 1)
          }
          w.bits(r.toLong & ((1L << rawBits) - 1), rawBits)
        }
    }
  }

  /** chanAssign: 0-7 independent, 8 left/side, 9 side/right, 10 mid/side.
   * `frames` = per-frame channel sample arrays (pre-decorrelation, i.e.
   * the actual L/R audio); the encoder derives the coded channels. */
  private def flac(rate: Int, bps: Int, frames: Seq[Array[Array[Int]]],
      chanAssign: Int, kind: Sub, kindSide: Option[Sub] = None): Array[Byte] = {
    val nCh = if (chanAssign <= 7) chanAssign + 1 else 2
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'))
    val si = new BitW
    si.bits(1, 1); si.bits(0, 7); si.bits(34, 24) // last, STREAMINFO, len
    val bs0 = frames.head(0).length
    si.bits(bs0, 16); si.bits(bs0, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(rate, 20); si.bits(nCh - 1, 3); si.bits(bps - 1, 5)
    si.bits(frames.map(_(0).length).sum, 36)
    (0 until 16).foreach(_ => si.bits(0, 8)) // md5 unverified
    out.write(si.bytes)
    frames.zipWithIndex.foreach { case (chs, fno) =>
      val bs = chs(0).length
      val w = new BitW
      w.bits(0x3FFE, 14); w.bit(0); w.bit(0)   // sync, fixed strategy
      w.bits(7, 4)                              // 16-bit blocksize at end
      w.bits(13, 4)                             // 16-bit Hz at end
      w.bits(chanAssign, 4)
      w.bits(bps match { case 8 => 1; case 16 => 4; case 24 => 6 }, 3)
      w.bit(0)
      require(fno < 128); w.bits(fno, 8)        // coded frame number
      w.bits(bs - 1, 16); w.bits(rate, 16)
      w.bits(0, 8)                              // CRC-8 unverified
      val coded: Seq[(Array[Int], Int)] = chanAssign match {
        case 8 => // left/side
          Seq((chs(0), bps),
            (Array.tabulate(bs)(i => chs(0)(i) - chs(1)(i)), bps + 1))
        case 9 => // side/right
          Seq((Array.tabulate(bs)(i => chs(0)(i) - chs(1)(i)), bps + 1),
            (chs(1), bps))
        case 10 => // mid/side
          Seq((Array.tabulate(bs)(i => (chs(0)(i) + chs(1)(i)) >> 1), bps),
            (Array.tabulate(bs)(i => chs(0)(i) - chs(1)(i)), bps + 1))
        case _ => chs.map(c => (c, bps)).toSeq
      }
      coded.zipWithIndex.foreach { case ((samples, effBps), ci) =>
        writeSubframe(w, samples, effBps,
          if (ci == 1 && kindSide.isDefined) kindSide.get else kind)
      }
      w.align(); w.bits(0, 16)                  // CRC-16 unverified
      out.write(w.bytes)
    }
    out.toByteArray
  }

  private def statsOf(frames: Seq[Array[Array[Int]]], nCh: Int, rate: Int,
      bps: Int): Seq[Long] = {
    val clipAt = (1L << (bps - 1)) - 1
    val sqShift = bps - 16
    var sum = 0L; var peak = 0L; var clip = 0L; var n = 0L
    var sumSq = 0L; var zc = 0L
    frames.foreach { chs =>
      n += chs(0).length
      chs.foreach(_.foreach { v =>
        val a = math.abs(v.toLong)
        sum += a; peak = math.max(peak, a); if (a >= clipAt) clip += 1
        val s16 = if (sqShift >= 0) v >> sqShift else v << -sqShift
        sumSq += s16.toLong * s16
      })
    }
    // per-channel sign flips with prev persisting ACROSS frame boundaries
    for (c <- 0 until nCh) {
      val series = frames.flatMap(_(c))
      zc += series.iterator.sliding(2).withPartial(false)
        .count(p => (p.head < 0) != (p(1) < 0))
    }
    Seq(nCh.toLong, rate.toLong, n, sum, peak, clip, sumSq, zc, bps.toLong)
  }

  private def wave(n: Int, seed: Int, amp: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((math.sin(i * 0.11 + seed) * amp).toInt + ((i * seed) % 7) - 3)
    }

  // -------------------------------------------------------------- tests

  test("FLAC FIXED orders 0-2: rice-coded round-trip is bit-exact") {
    for (order <- 0 to 2) {
      val s = wave(96, 3 + order, 9000)
      val frames = Seq(Array(s))
      val bytes = flac(44100, 16, frames, 0, Fixed(order, 12))
      val got = FlacPcmStats.scan(bytes)
      assert(got != null, s"order $order")
      assert(got.toSeq == statsOf(frames, 1, 44100, 16), s"order $order")
    }
  }

  test("FLAC LPC order-1 with shifted quantized coefficient") {
    val s = wave(64, 9, 12000)
    val frames = Seq(Array(s))
    // coef 2, shift 1 -> predictor floor(s[i-1] * 2 / 2) = s[i-1]
    val bytes = flac(22050, 16, frames, 0, Lpc1(coef = 2, shift = 1,
      param = 13))
    val got = FlacPcmStats.scan(bytes)
    assert(got != null)
    assert(got.toSeq == statsOf(frames, 1, 22050, 16))
  }

  test("FLAC stereo decorrelation: left/side, side/right, mid/side exact") {
    val l = wave(80, 5, 15000); val r = wave(80, 11, 14000)
    val frames = Seq(Array(l, r))
    for (assign <- Seq(8, 9, 10)) {
      val bytes = flac(48000, 16, frames, assign, Fixed(2, 13),
        kindSide = Some(Fixed(1, 13)))
      val got = FlacPcmStats.scan(bytes)
      assert(got != null, s"assign $assign")
      assert(got.toSeq == statsOf(frames, 2, 48000, 16), s"assign $assign")
    }
  }

  test("FLAC multi-frame stream and escape-coded verbatim partitions") {
    val f1 = wave(48, 2, 120); val f2 = wave(48, 7, 120)
    val frames = Seq(Array(f1), Array(f2))
    val bytes = flac(8000, 16, frames, 0, FixedEscape(1, 14))
    val got = FlacPcmStats.scan(bytes)
    assert(got != null)
    assert(got.toSeq == statsOf(frames, 1, 8000, 16))
    // VERBATIM subframes across two independent channels
    val st = Seq(Array(wave(32, 1, 200), wave(32, 4, 200)))
    val vb = flac(16000, 16, st, 1, Verbatim)
    assert(FlacPcmStats.scan(vb).toSeq == statsOf(st, 2, 16000, 16))
  }

  test("FLAC clipping accounting at full scale") {
    val s = Array.fill(16)(32767) ++ Array.fill(16)(-32768)
    val frames = Seq(Array(s))
    val bytes = flac(44100, 16, frames, 0, Verbatim)
    val got = FlacPcmStats.scan(bytes)
    assert(got != null)
    assert(got(3) == 16L * 32767 + 16L * 32768)
    assert(got(4) == 32768L && got(5) == 32L)
  }

  test("FLAC rejects: truncation, bad sync, reserved subframe type") {
    val good = flac(44100, 16, Seq(Array(wave(32, 3, 5000))), 0, Fixed(1, 12))
    assert(FlacPcmStats.scan(good) != null)
    assert(FlacPcmStats.scan(good.dropRight(3)) == null)
    assert(FlacPcmStats.scan("not flac at all, truly".getBytes) == null)
    val badSync = good.clone()
    val fStart = 4 + 4 + 34 // magic + block header + STREAMINFO
    badSync(fStart) = 0x12
    assert(FlacPcmStats.scan(badSync) == null)
    // corrupt the subframe type field to a reserved value (2..7 range)
    val badSub = good.clone()
    // frame header here = 2 sync/flag bytes + 1 + 1 + 1 frame# + 2 bs +
    // 2 rate + 1 crc8 = 10 bytes; subframe header is next
    badSub(fStart + 10) = (2 << 1).toByte // pad=0, type=2 (reserved)
    assert(FlacPcmStats.scan(badSub) == null)
  }

  test("FLAC expression: eval and codegen agree through a DataFrame") {
    val bytes = flac(44100, 16, Seq(Array(wave(40, 6, 7000))), 0,
      Fixed(2, 12))
    val expect = statsOf(Seq(Array(wave(40, 6, 7000))), 1, 44100, 16)
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3, 4)))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        MediaExtra.flacPcmScan(col("payload")).as("f"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == expect)
    assert(out(1).isNullAt(1))
  }

  // --------------------------------------------------------------- OGG

  private def oggPage(headerType: Int, granule: Long, serial: Int,
      seq: Int, packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'g', 'g', 'S', 0, headerType.toByte))
    (0 to 7).foreach(i => out.write(((granule >> (8 * i)) & 0xFF).toInt))
    (0 to 3).foreach(i => out.write((serial >> (8 * i)) & 0xFF))
    (0 to 3).foreach(i => out.write((seq >> (8 * i)) & 0xFF))
    (0 to 3).foreach(_ => out.write(0)) // CRC unverified
    out.write(1); out.write(packet.length)
    out.write(packet)
    out.toByteArray
  }

  private def opusHead(ch: Int, rate: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes ++ Array[Byte](1, ch.toByte,
      (preSkip & 0xFF).toByte, ((preSkip >> 8) & 0xFF).toByte) ++
      (0 to 3).map(i => ((rate >> (8 * i)) & 0xFF).toByte) ++
      Array[Byte](0, 0, 0)

  test("OGG duration: last-page granule position, Opus pre-skip applied") {
    import graft.multimodal.OggDuration
    // opus: 3 pages; interior page granulepos -1 must be ignored
    val opus = oggPage(2, 0, 7, 0, opusHead(2, 16000, 312)) ++
      oggPage(0, -1L, 7, 1, Array[Byte](1, 2, 3)) ++
      oggPage(4, 312 + 96000, 7, 2, Array[Byte](9))
    val got = OggDuration.scan(opus)
    assert(got != null)
    assert(got.toSeq == Seq(0L, 16000L, 312L + 96000L, 2000L))
    // vorbis: granules are PCM samples at the stream rate
    val vorbId = Array[Byte](1) ++ "vorbis".getBytes ++
      Array.fill[Byte](4)(0) ++ Array[Byte](2) ++
      (0 to 3).map(i => ((44100 >> (8 * i)) & 0xFF).toByte).toArray ++
      Array.fill[Byte](13)(0) ++ Array[Byte](1)
    val vorb = oggPage(2, 0, 9, 0, vorbId) ++
      oggPage(4, 22050, 9, 1, Array[Byte](5))
    val gv = graft.multimodal.OggDuration.scan(vorb)
    assert(gv != null && gv.toSeq == Seq(1L, 44100L, 22050L, 500L))
    // malformed page chain (trailing garbage) and all-unset granules
    assert(OggDuration.scan(opus ++ Array[Byte](1, 2)) == null)
    val unset = oggPage(2, -1L, 7, 0, opusHead(2, 16000, 312))
    assert(OggDuration.scan(unset) == null)
  }

  // --------------------------------------------------------------- MP3

  test("MP3 VBR duration: Xing, Info, and VBRI frame counts") {
    import graft.multimodal.Mp3Info
    def be32(v: Long) = (3 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte)
    // MPEG1 Layer III 128kbps 44100 mono -> side info 17, tag at 21
    val hdr = Array(0xFF, 0xFB, 0x90, 0xC0).map(_.toByte)
    def xing(tag: String, frames: Long) =
      hdr ++ Array.fill[Byte](17)(0) ++ tag.getBytes ++ be32(1) ++
        be32(frames) ++ Array.fill[Byte](64)(0)
    val x = Mp3Info.scan(xing("Xing", 3000))
    assert(x != null && x(3) == 3000L * 1152 * 1000 / 44100)
    val i = Mp3Info.scan(xing("Info", 77))
    assert(i != null && i(3) == 77L * 1152 * 1000 / 44100)
    // VBRI sits at the fixed offset 36; frames at +14 within the tag
    val vbri = hdr ++ Array.fill[Byte](32)(0) ++ "VBRI".getBytes ++
      Array.fill[Byte](10)(0) ++ be32(555) ++ Array.fill[Byte](8)(0)
    val v = Mp3Info.scan(vbri)
    assert(v != null && v(3) == 555L * 1152 * 1000 / 44100)
    // no tag -> CBR estimate from payload bytes at the header bitrate
    val cbr = hdr ++ Array.fill[Byte](60)(0)
    val c = Mp3Info.scan(cbr)
    assert(c != null && c(3) == 64L * 8 / 128)
    // Xing present but the frames flag bit unset -> CBR fallback
    val noflag = hdr ++ Array.fill[Byte](17)(0) ++ "Xing".getBytes ++
      be32(0) ++ be32(999)
    val nf = Mp3Info.scan(noflag)
    assert(nf != null && nf(3) == (noflag.length.toLong * 8) / 128)
  }
}
