package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaExtra, PngPixelStats, WavPcmStats}

/**
 * Content-decode specs for the PNG, GIF, WAV PCM, and baseline-JPEG
 * walkers. The oracle query (m_pixel_stats) only exercises byte-aligned
 * synthesizable streams (stored-deflate PNG, clear-before-literal GIF,
 * DC-only JPEG), so this suite pins the paths a columnar synthesizer
 * can't produce: REAL deflate compression (java.util.zip.Deflater),
 * all five scanline filters, RGBA alpha exclusion, multi-IDAT streams,
 * greedy-LZW-compressed GIF code streams, JDK-ImageIO-encoded JPEGs
 * (full Huffman/AC coefficients, 4:2:0 subsampling, partial MCUs), and
 * the reject cases (interlace, depth, palette, SOF2, truncation).
 */
class MediaPixelSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------- PNG builders

  private def be32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] =
    be32(body.length) ++ tag.getBytes("UTF-8") ++ body ++ be32(0) // CRC unchecked

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater() // zlib-wrapped, real Adler-32
    d.setInput(raw); d.finish()
    val out = new Array[Byte](raw.length + 64)
    val n = d.deflate(out); d.end()
    out.take(n)
  }

  /** Independent filter ENCODER (the inverse of the scan's decoder):
   * raw = orig - pred mod 256, per RFC 2083. */
  private def filterRows(pixels: Array[Array[Int]], w: Int, h: Int,
                         bpp: Int, filters: Array[Int]): Array[Byte] = {
    val stride = w * bpp
    val out = new Array[Byte](h * (stride + 1))
    def orig(row: Int, x: Int): Int =
      if (row < 0 || x < 0) 0 else pixels(row)(x)
    for (row <- 0 until h) {
      val f = filters(row)
      out(row * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val a = if (x >= bpp) orig(row, x - bpp) else 0
        val up = orig(row - 1, x)
        val c = if (x >= bpp) orig(row - 1, x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        out(row * (stride + 1) + 1 + x) = ((orig(row, x) - pred) & 0xFF).toByte
      }
    }
    out
  }

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def ihdr(w: Int, h: Int, colorType: Int, depth: Int = 8,
                   interlace: Int = 0): Array[Byte] =
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array(depth.toByte, colorType.toByte, 0.toByte, 0.toByte,
        interlace.toByte))

  private def png(w: Int, h: Int, colorType: Int,
                  pixels: Array[Array[Int]], filters: Array[Int],
                  idatSplit: Int = 0): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 4
    val z = deflate(filterRows(pixels, w, h, bpp, filters))
    val idats =
      if (idatSplit > 0 && idatSplit < z.length)
        Seq(z.take(idatSplit), z.drop(idatSplit))
      else Seq(z)
    pngSig ++ ihdr(w, h, colorType) ++
      idats.flatMap(chunk("IDAT", _)) ++ chunk("IEND", Array.empty)
  }

  private def statsOf(pixels: Array[Array[Int]], w: Int, h: Int,
                      bpp: Int): Array[Long] = {
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    for (row <- pixels; px <- 0 until w) {
      val r = row(px * bpp); val g = row(px * bpp + 1); val b = row(px * bpp + 2)
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
    }
    Array(w.toLong, h.toLong, sr, sg, sb, w.toLong * h, mn, mx, qr, qg, qb)
  }

  test("PNG: real deflate + every filter type reconstructs exact pixels") {
    val w = 5; val h = 5
    // deterministic non-solid pixels so each filter's prediction differs
    val pixels = Array.tabulate(h, w * 3)((r, x) => (r * 41 + x * 7) % 256)
      .map(_.toArray)
    val filters = Array(0, 1, 2, 3, 4) // one row per filter type
    val bytes = png(w, h, 2, pixels, filters)
    assert(PngPixelStats.scan(bytes).toSeq == statsOf(pixels, w, h, 3).toSeq)
  }

  test("PNG: RGBA alpha bytes are excluded from channel stats") {
    val w = 3; val h = 2
    // alpha channel set to extreme values that would corrupt min/max
    val pixels = Array.tabulate(h, w * 4) { (r, x) =>
      if (x % 4 == 3) (if (r == 0) 0 else 255) else 100 + r * 10 + (x % 4)
    }.map(_.toArray)
    val bytes = png(w, h, 6, pixels, Array(4, 1))
    val out = PngPixelStats.scan(bytes)
    assert(out(6) == 100L && out(7) == 112L) // min/max from RGB only
    assert(out.toSeq == statsOf(pixels, w, h, 4).toSeq)
  }

  test("PNG: multi-IDAT stream concatenates before inflate") {
    val w = 4; val h = 3
    val pixels = Array.tabulate(h, w * 3)((r, x) => (r * 90 + x * 13) % 256)
      .map(_.toArray)
    val whole = png(w, h, 2, pixels, Array(0, 2, 4))
    val split = png(w, h, 2, pixels, Array(0, 2, 4), idatSplit = 7)
    assert(PngPixelStats.scan(split).toSeq == PngPixelStats.scan(whole).toSeq)
  }

  test("PNG rejects: interlace, 16-bit, palette, truncated IDAT, bad filter") {
    val w = 2; val h = 2
    val pixels = Array.tabulate(h, w * 3)((r, x) => (r + x) % 256)
      .map(_.toArray)
    val ok = png(w, h, 2, pixels, Array(0, 0))
    assert(PngPixelStats.scan(ok) != null)
    def mutIhdr(off: Int, v: Byte): Array[Byte] = {
      val b = ok.clone(); b(8 + 8 + off) = v; b
    }
    assert(PngPixelStats.scan(mutIhdr(12, 1)) == null) // interlace=1
    assert(PngPixelStats.scan(mutIhdr(8, 16)) == null) // depth=16
    assert(PngPixelStats.scan(mutIhdr(9, 3)) == null)  // palette
    assert(PngPixelStats.scan(ok.dropRight(20)) == null) // truncated
    // filter byte 5 inside a stored-deflate stream
    val raw = filterRows(pixels, w, h, 3, Array(0, 0))
    raw(0) = 5
    val stored = Array[Byte](0x78, 0x01, 0x01,
      (raw.length & 0xFF).toByte, ((raw.length >> 8) & 0xFF).toByte,
      (~raw.length & 0xFF).toByte, ((~raw.length >> 8) & 0xFF).toByte) ++
      raw ++ Array[Byte](0, 0, 0, 0)
    val badFilter = pngSig ++ ihdr(w, h, 2) ++ chunk("IDAT", stored) ++
      chunk("IEND", Array.empty)
    assert(PngPixelStats.scan(badFilter) == null)
  }

  test("PNG expression: eval and codegen agree through a DataFrame") {
    val w = 3; val h = 4
    val pixels = Array.tabulate(h, w * 3)((r, x) => (r * 17 + x * 29) % 256)
      .map(_.toArray)
    val bytes = png(w, h, 2, pixels, Array(1, 2, 3, 4))
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        MediaExtra.pngScan(col("payload")).as("p"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == statsOf(pixels, w, h, 3).toSeq)
    assert(out(1).isNullAt(1))
  }

  // --------------------------------------------------------------- GIF

  /** Independent greedy LZW ENCODER (the published GIF algorithm):
   * variable code width, dictionary to 4096, emits CLEAR at dictionary
   * overflow — exercises the decoder's chain-walk, width bumps, and the
   * KwKwK case with genuinely compressed multi-code streams. */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    var width = minCode + 1
    val dict = scala.collection.mutable.HashMap[(Int, Int), Int]()
    var next = eoi + 1
    val bits = scala.collection.mutable.ArrayBuffer[Byte]()
    var acc = 0L; var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bits += (acc & 0xFF).toByte; acc >>= 8; nAcc -= 8 }
    }
    emit(clear)
    var prev = indices(0)
    for (k <- 1 until indices.length) {
      val c = indices(k)
      dict.get((prev, c)) match {
        case Some(code) => prev = code
        case None =>
          emit(prev)
          if (next < 4096) {
            dict((prev, c)) = next
            next += 1
            // GIF encoders bump width when next EXCEEDS the code range
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else {
            emit(clear)
            dict.clear(); next = eoi + 1; width = minCode + 1
          }
          prev = c
      }
    }
    emit(prev); emit(eoi)
    if (nAcc > 0) bits += (acc & 0xFF).toByte
    bits.toArray
  }

  private def gif(w: Int, h: Int, palette: Array[(Int, Int, Int)],
                  indices: Array[Int], minCode: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val ctBits = (math.ceil(math.log(palette.length) / math.log(2)).toInt
      max 1) - 1
    val gct = palette.flatMap { case (r, g, b) =>
      Array(r.toByte, g.toByte, b.toByte) }
    val z = lzwEncode(indices, minCode)
    val subBlocks = z.grouped(255)
      .flatMap(g => g.length.toByte +: g).toArray
    "GIF89a".getBytes("UTF-8") ++ le16(w) ++ le16(h) ++
      Array((0x80 | (7 << 4) | ctBits).toByte, 0.toByte, 0.toByte) ++ gct ++
      Array(0x2C.toByte) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
      Array(0.toByte, minCode.toByte) ++ subBlocks ++
      Array(0.toByte, 0x3B.toByte)
  }

  test("GIF: greedy-LZW-compressed stream round-trips exact pixel stats") {
    val w = 16; val h = 8
    // repetitive pattern so the encoder genuinely builds dictionary
    // entries (and the decoder hits the KwKwK case)
    val indices = Array.tabulate(w * h)(k => (k / 3) % 4)
    val palette = Array.tabulate(4)(i => (i * 50, 255 - i * 60, i * 10))
    val bytes = gif(w, h, palette, indices, minCode = 2)
    assert(bytes.length < 6 + 7 + 12 + 10 + 2 + w * h + 4,
      "stream should actually be compressed")
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    for (i <- indices) {
      val (r, g, b) = palette(i)
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
    }
    assert(graft.multimodal.GifPixelStats.scan(bytes).toSeq ==
      Seq(w.toLong, h.toLong, sr, sg, sb, (w * h).toLong, mn, mx,
        qr, qg, qb))
  }

  test("GIF: width bumps past 2^w and a dictionary-overflow CLEAR decode") {
    // 300 distinct-ish runs force the dictionary past 512 entries (width
    // 9 -> 10) with an 8-bit color table
    val rnd = new scala.util.Random(7)
    val indices = Array.fill(6000)(rnd.nextInt(256))
    val palette = Array.tabulate(256)(i => (i, (i * 7) % 256, (i * 13) % 256))
    val bytes = gif(40, 150, palette, indices, minCode = 8)
    val out = graft.multimodal.GifPixelStats.scan(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (i <- indices) { sr += palette(i)._1; sg += palette(i)._2; sb += palette(i)._3 }
    assert(out.toSeq.slice(2, 6) == Seq(sr, sg, sb, 6000L))
  }

  test("GIF: extension blocks are skipped; rejects truncated and non-GIF") {
    val palette = Array.tabulate(4)(i => (i, i, i))
    val indices = Array.tabulate(8)(_ % 4)
    val ok = gif(4, 2, palette, indices, minCode = 2)
    // splice a graphic-control extension between LSD+GCT and the image
    val lsdEnd = 6 + 7 + palette.length * 3
    val ext = Array(0x21, 0xF9, 4, 0, 0, 0, 0, 0).map(_.toByte)
    val withExt = ok.take(lsdEnd) ++ ext ++ ok.drop(lsdEnd)
    assert(graft.multimodal.GifPixelStats.scan(withExt).toSeq ==
      graft.multimodal.GifPixelStats.scan(ok).toSeq)
    assert(graft.multimodal.GifPixelStats.scan(ok.dropRight(6)) == null)
    assert(graft.multimodal.GifPixelStats.scan(
      "GIF88a12345678".getBytes("UTF-8")) == null)
  }

  // --------------------------------------------------------------- WAV

  private def wav(ch: Int, rate: Int, samples: Array[Int],
                  extraChunk: Boolean = false): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)
    val data = samples.flatMap(s => le16(s & 0xFFFF))
    // odd-sized LIST chunk before data exercises the even-padding rule
    val extra = if (extraChunk)
      "LIST".getBytes("UTF-8") ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    else Array.empty[Byte]
    val body = "WAVE".getBytes("UTF-8") ++
      "fmt ".getBytes("UTF-8") ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(rate) ++ le32(rate * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
      extra ++ "data".getBytes("UTF-8") ++ le32(data.length) ++ data
    "RIFF".getBytes("UTF-8") ++ le32(body.length) ++ body
  }

  test("WAV PCM: exact sum/peak/clip over signed samples, -32768 included") {
    val samples = Array(1000, -2000, 32767, -32768, 0, 5)
    val out = WavPcmStats.scan(wav(2, 44100, samples))
    // interleaved ch0 = [1000, 32767, 0] (no sign flip), ch1 =
    // [-2000, -32768, 5] (one flip); squares exact longs
    assert(out.toSeq == Seq(2L, 44100L, 3L,
      1000L + 2000L + 32767L + 32768L + 0L + 5L, 32768L, 2L,
      1000L * 1000 + 2000L * 2000 + 32767L * 32767 + 32768L * 32768 + 25L,
      1L, 16L))
  }

  test("WAV PCM: odd-sized chunk before data is padded to even") {
    val samples = Array(-1, 1, -1, 1)
    val out = WavPcmStats.scan(wav(1, 8000, samples, extraChunk = true))
    assert(out.toSeq == Seq(1L, 8000L, 4L, 4L, 1L, 0L, 4L, 3L, 16L))
  }

  test("WAV PCM rejects: non-PCM format, 8-bit, ragged data length") {
    val ok = wav(2, 16000, Array(1, 2, 3, 4))
    assert(WavPcmStats.scan(ok) != null)
    val nonPcm = ok.clone(); nonPcm(20) = 3 // IEEE float
    assert(WavPcmStats.scan(nonPcm) == null)
    val eightBit = ok.clone(); eightBit(34) = 8
    assert(WavPcmStats.scan(eightBit) == null)
    // stereo with an odd sample count: data not a multiple of the frame
    assert(WavPcmStats.scan(wav(2, 16000, Array(1, 2, 3))) == null)
    // structurally-valid EMPTY data chunk: no samples -> null (keeps the
    // content embedding's n > 0 invariant, mirrors FLAC's zero-sample case)
    assert(WavPcmStats.scan(wav(2, 16000, Array.empty[Int])) == null)
  }

  test("WAV expression: eval and codegen agree through a DataFrame") {
    val bytes = wav(1, 22050, Array(100, -100, 32767))
    val df = Seq((1L, bytes), (2L, "RIFFjunk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        MediaExtra.wavPcmScan(col("payload")).as("p"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 22050L, 3L, 32967L, 32767L, 1L,
      100L * 100 * 2 + 32767L * 32767, 2L, 16L))
    assert(out(1).isNullAt(1))
  }

  // -------------------------------------------------------------- JPEG

  /** DC-only baseline grayscale JPEG, the m_pixel_stats synthesis shape:
   * custom DHT pair making every MCU byte-aligned; flat gray 128+dc. */
  private def jpegGray(w: Int, h: Int, dc: Int,
      restartEvery: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && dc >= -127 && dc <= 127 &&
      math.abs(dc) >= 64)
    val out = new java.io.ByteArrayOutputStream()
    def wr(hexStr: String): Unit =
      out.write(hexStr.replaceAll(" ", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
    wr("FFD8")
    wr("FFDB004300" + "08" * 64)
    wr(f"FFC0000B08$h%04X$w%04X01011100")
    wr("FFC4001500" + "00000101" + "00" * 12 + "0007")
    wr("FFC4001410" + "0000000001" + "00" * 11 + "00")
    if (restartEvery > 0) wr(f"FFDD0004$restartEvery%04X")
    wr("FFDA0008010100003F00")
    val vbits = if (dc >= 0) dc else dc + 127 // EXTEND-inverse, 7 bits
    def firstMcu(): Unit =
      wr(f"${0x20 | (vbits >> 3)}%02X${(vbits & 7) << 5}%02X")
    val nB = (w / 8) * (h / 8)
    val period = if (restartEvery > 0) restartEvery else nB + 1
    var b = 0
    while (b < nB) {
      if (b % period == 0) {
        if (b > 0) wr(f"FF${0xD0 + (b / period - 1) % 8}%02X")
        firstMcu() // DC predictor reset: re-code the absolute level
      } else wr("00")
      b += 1
    }
    wr("FFD9")
    out.toByteArray
  }

  test("JPEG DC-only: hand-built stream decodes to the exact flat gray") {
    import graft.multimodal.JpegPixelStats
    for ((w, h, dc) <- Seq((8, 8, 64), (8, 8, 127), (8, 8, -64),
        (32, 24, 100), (16, 8, -127))) {
      val g = 128 + dc
      val s = JpegPixelStats.scan(jpegGray(w, h, dc))
      assert(s != null, s"$w x $h dc=$dc")
      assert(s.toSeq == Seq[Long](w, h, g.toLong * w * h, g.toLong * w * h,
        g.toLong * w * h, w.toLong * h, g, g,
        g.toLong * g * w * h, g.toLong * g * w * h, g.toLong * g * w * h),
        s"dc=$dc")
    }
  }

  test("JPEG restart intervals: RSTn consumed, DC predictors reset") {
    import graft.multimodal.JpegPixelStats
    val s = JpegPixelStats.scan(jpegGray(48, 16, 90, restartEvery = 3))
    assert(s != null)
    val g = 218L
    assert(s.toSeq == Seq[Long](48, 16, g * 768, g * 768, g * 768, 768, g, g,
      g * g * 768, g * g * 768, g * g * 768))
    // a missing RST where one is declared must fail loudly, not misparse
    val noDri = jpegGray(48, 16, 90)
    val withDriOnly = {
      val b = jpegGray(48, 16, 90, restartEvery = 3)
      // strip the RST markers but keep DRI: decoder must return null
      val hx = b.map(x => f"${x & 0xFF}%02X").mkString
      val stripped = hx.replaceAll("FFD[0-7]", "")
      stripped.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    assert(JpegPixelStats.scan(noDri) != null)
    assert(JpegPixelStats.scan(withDriOnly) == null)
  }

  /** DC-only 4:4:4 THREE-component JPEG (flat YCbCr), one shared quant
   * and Huffman table set; every MCU is 3 byte-aligned blocks. */
  private def jpegColor(w: Int, h: Int, dcY: Int, dcCb: Int,
      dcCr: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0)
    val out = new java.io.ByteArrayOutputStream()
    def wr(hexStr: String): Unit =
      out.write(hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    wr("FFD8")
    wr("FFDB004300" + "08" * 64)
    wr(f"FFC0001108$h%04X$w%04X03" + "011100" + "021100" + "031100")
    wr("FFC4001500" + "00000101" + "00" * 12 + "0007")
    wr("FFC4001410" + "0000000001" + "00" * 11 + "00")
    wr("FFDA000C03010002000300003F00")
    def block(dc: Int, first: Boolean): String =
      if (first) {
        val vbits = if (dc >= 0) dc else dc + 127
        f"${0x20 | (vbits >> 3)}%02X${(vbits & 7) << 5}%02X"
      } else "00"
    val nB = (w / 8) * (h / 8)
    var b = 0
    while (b < nB) {
      wr(block(dcY, b == 0) + block(dcCb, b == 0) + block(dcCr, b == 0))
      b += 1
    }
    wr("FFD9")
    out.toByteArray
  }

  test("JPEG 4:4:4 color: YCbCr conversion matches the JDK codec to 1 ulp") {
    import graft.multimodal.JpegPixelStats
    for ((dy, dcb, dcr) <- Seq((100, -70, 64), (-64, 64, -100),
        (127, -127, 127))) {
      val bytes = jpegColor(16, 8, dy, dcb, dcr)
      val s = JpegPixelStats.scan(bytes)
      assert(s != null, s"($dy,$dcb,$dcr)")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 16 && img.getHeight == 8)
      // flat image: compare the per-pixel channel values (all equal)
      val rgb = img.getRGB(3, 3)
      val (er, eg, eb) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
      val n = 128L
      val (ar, ag, ab) = (s(2) / n, s(3) / n, s(4) / n)
      assert(s(2) % n == 0 && s(3) % n == 0 && s(4) % n == 0,
        "flat image must have uniform channels")
      assert(math.abs(ar - er) <= 1 && math.abs(ag - eg) <= 1 &&
        math.abs(ab - eb) <= 1,
        s"engine ($ar,$ag,$ab) vs ImageIO ($er,$eg,$eb)")
    }
  }

  test("JPEG vs ImageIO: grayscale round-trip exact to IDCT rounding") {
    import graft.multimodal.JpegPixelStats
    // smooth-ish gradient + texture; odd dims exercise partial MCUs
    for ((w, h) <- Seq((24, 16), (17, 13), (8, 8), (40, 25))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255 / math.max(w - 1, 1) + y * 7 + (x * y) % 13) % 256
        img.getRaster.setSample(x, y, 0, v)
      }
      val bo = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bo))
      val bytes = bo.toByteArray
      val s = JpegPixelStats.scan(bytes)
      assert(s != null, s"$w x $h")
      assert(s(0) == w && s(1) == h && s(5) == w.toLong * h)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var sum = 0L; var mn = 255; var mx = 0
      for (y <- 0 until h; x <- 0 until w) {
        val v = ref.getRaster.getSample(x, y, 0)
        sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
      }
      // both decoders see the same coefficients; they differ only in
      // IDCT arithmetic (exact double here, fixed-point in the JDK) —
      // bound the drift at 1/pixel and 2 at the extremes
      assert(math.abs(s(2) - sum) <= w.toLong * h,
        s"graySum ${s(2)} vs ImageIO $sum at $w x $h")
      assert(s(2) == s(3) && s(3) == s(4))
      assert(math.abs(s(6) - mn) <= 2 && math.abs(s(7) - mx) <= 2)
    }
  }

  test("JPEG vs ImageIO: 4:2:0 RGB round-trip within upsampling tolerance") {
    import graft.multimodal.JpegPixelStats
    val w = 32; val h = 20
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 255 / (w - 1)
      val g = y * 255 / (h - 1)
      val b = ((x + y) * 5) % 160 + 40
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bo))
    val bytes = bo.toByteArray
    val s = JpegPixelStats.scan(bytes)
    assert(s != null)
    assert(s(0) == w && s(1) == h && s(5) == w.toLong * h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
    }
    // the JDK uses triangle (fancy) chroma upsampling, this decoder uses
    // box: per-channel MEANS stay within a few levels on smooth data
    val n = w.toLong * h
    assert(math.abs(s(2) - sr) <= 3 * n, s"R mean ${s(2) / n} vs ${sr / n}")
    assert(math.abs(s(3) - sg) <= 3 * n, s"G mean ${s(3) / n} vs ${sg / n}")
    assert(math.abs(s(4) - sb) <= 3 * n, s"B mean ${s(4) / n} vs ${sb / n}")
  }

  test("JPEG rejects: progressive, truncated entropy, non-JPEG, bad DHT") {
    import graft.multimodal.JpegPixelStats
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wtr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bo = new java.io.ByteArrayOutputStream()
    wtr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bo))
    wtr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wtr.dispose()
    val prog = bo.toByteArray
    assert(prog.sliding(2).exists(a =>
      (a(0) & 0xFF) == 0xFF && (a(1) & 0xFF) == 0xC2), "fixture is SOF2")
    assert(JpegPixelStats.scan(prog) == null)
    val good = jpegGray(16, 8, 80)
    assert(JpegPixelStats.scan(good.dropRight(4)) == null) // truncated
    assert(JpegPixelStats.scan("not a jpeg".getBytes) == null)
    // over-subscribed Huffman table: three codes of length 1
    val bad = good.clone()
    val dhtAt = good.indexOfSlice(Array(0xFF.toByte, 0xC4.toByte))
    bad(dhtAt + 5) = 3
    assert(JpegPixelStats.scan(bad) == null)
  }

  test("JPEG expression: eval and codegen agree through a DataFrame") {
    val df = Seq((1L, jpegGray(16, 8, 72)), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        MediaExtra.jpegScan(col("payload")).as("j"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) ==
      Seq[Long](16, 8, 200L * 128, 200L * 128, 200L * 128, 128, 200, 200,
        200L * 200 * 128, 200L * 200 * 128, 200L * 200 * 128))
    assert(out(1).isNullAt(1))
  }
}
