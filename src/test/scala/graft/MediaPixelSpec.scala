package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaExtra, PngPixelStats, WavPcmStats}

/**
 * Content-decode specs for the PNG and WAV PCM walkers. The oracle query
 * (m_pixel_stats) only exercises stored-deflate blocks with filter 0, so
 * this suite pins the paths a columnar synthesizer can't produce: REAL
 * deflate compression (java.util.zip.Deflater, test-side only), all five
 * scanline filters, RGBA alpha exclusion, multi-IDAT streams, and the
 * reject cases (interlace, depth, palette, truncation).
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
    for (row <- pixels; px <- 0 until w) {
      val r = row(px * bpp); val g = row(px * bpp + 1); val b = row(px * bpp + 2)
      sr += r; sg += g; sb += b
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
    }
    Array(w.toLong, h.toLong, sr, sg, sb, w.toLong * h, mn, mx)
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
    for (i <- indices) {
      val (r, g, b) = palette(i)
      sr += r; sg += g; sb += b
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
    }
    assert(graft.multimodal.GifPixelStats.scan(bytes).toSeq ==
      Seq(w.toLong, h.toLong, sr, sg, sb, (w * h).toLong, mn, mx))
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
    assert(out.toSeq == Seq(2L, 44100L, 3L,
      1000L + 2000L + 32767L + 32768L + 0L + 5L, 32768L, 2L))
  }

  test("WAV PCM: odd-sized chunk before data is padded to even") {
    val samples = Array(-1, 1, -1, 1)
    val out = WavPcmStats.scan(wav(1, 8000, samples, extraChunk = true))
    assert(out.toSeq == Seq(1L, 8000L, 4L, 4L, 1L, 0L))
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
  }

  test("WAV expression: eval and codegen agree through a DataFrame") {
    val bytes = wav(1, 22050, Array(100, -100, 32767))
    val df = Seq((1L, bytes), (2L, "RIFFjunk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        MediaExtra.wavPcmScan(col("payload")).as("p"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 22050L, 3L, 32967L, 32767L, 1L))
    assert(out(1).isNullAt(1))
  }
}
