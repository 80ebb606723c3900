package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Round-5 native media parsers, shrinking the codec stub to genuinely
 * codec-requiring decode only: BMP/PPM/PNG/GIF and baseline-JPEG PIXEL
 * decode (real per-pixel channel sums/min/max — actual content decode,
 * not just header dims; JPEG runs a full native Huffman + dequant +
 * IDCT pipeline), TIFF/ICO dimensions, ID3v1/v2
 * tags, and OGG Opus/Vorbis identification headers. Same discipline as
 * [[MediaHeaders]]: each parser is either pure Column arithmetic or a
 * codegen'd unary expression funneling BOTH eval and doGenCode through
 * one static `scan` method so interpreter and codegen cannot diverge.
 *
 * Reference anchor: the pydantic ecosystem treats media as opaque bytes
 * with typed metadata models; these parsers supply that metadata at
 * 100-TB scan scale without any codec library.
 */
object MediaExtra {

  private def u8(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast(IntegerType)

  private def le16(bin: Column, pos: Int): Column =
    (u8(bin, pos) + u8(bin, pos + 1) * 256).cast(IntegerType)

  // ------------------------------------------------------------- BMP/PPM

  /** Raw scan arrays, one per format. STAGE-ONCE DISCIPLINE: a caller
   * unpacking the 8 stat slots references the array 8+ times, so the scan
   * must be materialized as its OWN projection first (the q_complex /
   * `Similarity.withNormalized` shape) — CollapseProject then refuses to
   * inline it and each raster walks ONCE per row. Handing `bmpScan(bin)`
   * straight to a multi-field unpack instead duplicates the walk (and the
   * whole `bin` synthesis tree) per field: the original single-Column
   * packing measured 15s for 500 rows; the staged shape is sub-second.
   *
   * Slots (longs): 1=width, 2=height, 3=sum_r, 4=sum_g, 5=sum_b, 6=n_px,
   * 7=min_ch, 8=max_ch, 9=sumsq_r, 10=sumsq_g, 11=sumsq_b (the
   * second-moment slots feed the real color-moment content embedding —
   * Stricker & Orengo 1995 mean/sigma per channel; exact longs, bounded:
   * 255^2 * 2^26 px < 2^42). BMP: uncompressed 24-bit, BGR rows
   * bottom-up, 4-byte row padding skipped. PPM: binary P6, maxval <=
   * 255, `#` header comments. Null for anything else. */
  def bmpScan(bin: Column): Column =
    ColumnShim.column(BmpPixelStats(ColumnShim.expression(bin)))

  def ppmScan(bin: Column): Column =
    ColumnShim.column(PpmInfo(ColumnShim.expression(bin)))

  /** Same slots — REAL PNG decode: zlib inflate (JDK Inflater) + RFC 2083
   * scanline unfiltering; see [[PngPixelStats.scan]]. */
  def pngScan(bin: Column): Column =
    ColumnShim.column(PngPixelStats(ColumnShim.expression(bin)))

  /** Same slots — REAL GIF decode: full variable-width LZW decompressor
   * + color-table mapping; see [[GifPixelStats.scan]]. */
  def gifScan(bin: Column): Column =
    ColumnShim.column(GifPixelStats(ColumnShim.expression(bin)))

  /** Same slots — REAL baseline JPEG decode: marker parse, canonical
   * Huffman entropy decode, dequantization, exact 2-D IDCT, chroma
   * upsampling and YCbCr->RGB; see [[JpegPixelStats.scan]]. */
  def jpegScan(bin: Column): Column =
    ColumnShim.column(JpegPixelStats(ColumnShim.expression(bin)))

  /** array(channels, sample_rate, n_frames, sum_abs, peak_abs, n_clipped,
   * sum_sq, zero_crossings, bps)
   * — REAL WAV PCM s16 sample decode; see [[WavPcmStats.scan]]. */
  def wavPcmScan(bin: Column): Column =
    ColumnShim.column(WavPcmStats(ColumnShim.expression(bin)))

  /** Same slots — REAL FLAC audio decode: full subframe set (CONSTANT/
   * VERBATIM/FIXED/LPC), rice residuals, stereo decorrelation; see
   * [[FlacPcmStats.scan]]. */
  def flacPcmScan(bin: Column): Column =
    ColumnShim.column(FlacPcmStats(ColumnShim.expression(bin)))

  /** Same slots — REAL G.711 mu-law/A-law LOSSY decode (WAVE formats
   * 6/7, ITU-T logarithmic companding); see [[G711Stats.scan]]. */
  def g711Scan(bin: Column): Column =
    ColumnShim.column(G711Stats(ColumnShim.expression(bin)))

  /** Same slots — REAL IMA ADPCM LOSSY decode (WAVE format 0x11,
   * 4-bit adaptive deltas); see [[AdpcmStats.scan]]. */
  def adpcmScan(bin: Column): Column =
    ColumnShim.column(AdpcmStats(ColumnShim.expression(bin)))

  /** array(width, height, us_per_frame, total_frames, n_frames_decoded,
   * sum_r, sum_g, sum_b, n_px, min_ch, max_ch, sq_r, sq_g, sq_b,
   * duration_ms) — REAL AVI/MJPEG video decode: RIFF demux + the full
   * native baseline-JPEG pipeline per frame; see
   * [[AviMjpegStats.scan]]. */
  def aviScan(bin: Column): Column =
    ColumnShim.column(AviMjpegStats(ColumnShim.expression(bin)))

  /** array(n_frames, then per frame: sum_r, sum_g, sum_b, n_px) —
   * PER-FRAME channel sums in stream order, for temporal operators
   * (shot-boundary detection, frame near-dup); see
   * [[AviFrameMeans.scan]]. */
  def aviFrameScan(bin: Column): Column =
    ColumnShim.column(AviFrameMeans(ColumnShim.expression(bin)))

  // ---------------------------------------------------------- TIFF / ICO

  /** array(width, height) from TIFF IFD0 tags 256/257 (both byte orders,
   * SHORT and LONG entry types); null otherwise. Stage-once: see
   * [[bmpScan]]. */
  def tiffScan(bin: Column): Column =
    ColumnShim.column(TiffDims(ColumnShim.expression(bin)))

  def isIco(bin: Column): Column =
    octet_length(bin) >= 22 && hex(substring(bin, 1, 4)) === "00000100" &&
      le16(bin, 5) >= 1

  /** struct(width, height) of an ICO's FIRST directory entry (byte
   * dimensions, 0 meaning 256 per the format); null for non-ICO bytes. */
  def icoDims(bin: Column): Column =
    when(isIco(bin), struct(
      when(u8(bin, 7) === 0, 256).otherwise(u8(bin, 7)).as("width"),
      when(u8(bin, 8) === 0, 256).otherwise(u8(bin, 8)).as("height")))
      .otherwise(lit(null).cast("struct<width:int,height:int>"))

  // ---------------------------------------------------------------- ID3

  /** struct(title, artist) from a trailing 128-byte ID3v1 block (fixed
   * 30-byte fields, NUL/space padded, ISO-8859-1); null when absent. */
  def id3v1Tags(bin: Column): Column = {
    val n = octet_length(bin)
    val block = bin.substr(n - 127, lit(128))
    def f(pos: Int, len: Int) = regexp_replace(
      decode(substring(block, pos, len), "ISO-8859-1"), "[\\x00 ]+$", "")
    when(n >= 128 && hex(substring(block, 1, 3)) === "544147", // "TAG"
      struct(f(4, 30).as("title"), f(34, 30).as("artist")))
      .otherwise(lit(null).cast("struct<title:string,artist:string>"))
  }

  /** array(version, title, artist) from an ID3v2.2-2.4 header's TIT2 /
   * TPE1 frames (ISO-8859-1 and UTF-8 text encodings; v2.4 syncsafe and
   * v2.3 plain frame sizes); null for non-ID3v2 payloads, elements null
   * when the frame is absent. Stage-once: see [[bmpScan]]. */
  def id3v2Scan(bin: Column): Column =
    ColumnShim.column(Id3v2Tags(ColumnShim.expression(bin)))

  // ---------------------------------------------------------------- OGG

  /** array(codec_id, channels, sample_rate) from the first OGG page's
   * identification header — codec_id 0 = OpusHead (the 48kHz-internal
   * input rate field), 1 = Vorbis; null for non-OGG bytes. Stage-once:
   * see [[bmpScan]]. */
  def oggScan(bin: Column): Column =
    ColumnShim.column(OggInfo(ColumnShim.expression(bin)))

  /** array(codec, sample_rate, last_granulepos, duration_ms) — REAL OGG
   * page walk to the last granule position; see [[OggDuration.scan]]. */
  def oggDurationScan(bin: Column): Column =
    ColumnShim.column(OggDuration(ColumnShim.expression(bin)))

  /** Header-only dimension parse for the formats MediaHeaders.parseDims
   * does not cover (BMP, PPM, TIFF, ICO) — the extractFeatures fallback
   * chain, so the deterministic stub only fires for genuinely unknown
   * bytes. Cheap: no pixel walk, just the fixed-offset header reads. */
  def parseMoreDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 6) return None
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def le32i(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32i(18); val h = math.abs(le32i(22))
      if (w > 0 && h > 0) return Some((w, h))
    }
    if (b(0) == 'P' && b(1) == '6') {
      val ppm = PpmInfo.scan(b) // [width, height, ...] or null
      if (ppm != null) return Some((ppm(0).toInt, ppm(1).toInt))
    }
    val tiff = TiffDims.scan(b)
    if (tiff != null) return Some((tiff(0).toInt, tiff(1).toInt))
    if (b.length >= 22 && u8(0) == 0 && u8(1) == 0 && u8(2) == 1 &&
      u8(3) == 0 && (u8(4) | (u8(5) << 8)) >= 1) {
      val w = if (u8(6) == 0) 256 else u8(6)
      val h = if (u8(7) == 0) 256 else u8(7)
      return Some((w, h))
    }
    None
  }
}

/** Shared shape for the long-array media scan expressions. */
private[multimodal] trait MediaScanExpr
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }
  /** Fully-qualified static scan, e.g. `graft.multimodal.TiffDims.scan`. */
  protected def staticScan: String
  protected def scanImpl(b: Array[Byte]): Array[Long]
  override def nullSafeEval(input: Any): Any = {
    val out = scanImpl(input.asInstanceOf[Array[Byte]])
    if (out == null) null else new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = $staticScan($b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
}

/** Uncompressed 24-bit BMP pixel decode (see [[BmpPixelStats.scan]]). */
case class BmpPixelStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "bmp_pixel_stats"
  override protected def staticScan: String =
    "graft.multimodal.BmpPixelStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    BmpPixelStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): BmpPixelStats =
    copy(child = newChild)
}

object BmpPixelStats {
  /** [width, height, sumR, sumG, sumB, nPx, minCh, maxCh] for a
   * BITMAPINFOHEADER BMP with bpp=24 and BI_RGB (no compression); rows
   * are BGR bottom-up with 4-byte padding, which the walk SKIPS (the
   * pad bytes must not contaminate sums or min/max). Null otherwise. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    val dataOff = le32(10)
    val w = le32(18).toInt
    val h = math.abs(le32(22).toInt) // negative height = top-down rows
    val bpp = le16(28)
    val comp = le32(30)
    // bound dims BEFORE any Int stride arithmetic: a forged 2^30-wide
    // header would overflow w*3 and slip past a naive length check
    if (w <= 0 || h == 0 || bpp != 24 || comp != 0L ||
      w.toLong * h > (1L << 26)) return null
    val stride = ((w.toLong * 3 + 3) & ~3L).toInt
    if (dataOff < 54 || dataOff + stride.toLong * h > b.length) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var row = 0
    while (row < h) {
      var p = dataOff.toInt + row * stride
      var x = 0
      while (x < w) {
        val bb = u8(p); val gg = u8(p + 1); val rr = u8(p + 2)
        sb += bb; sg += gg; sr += rr
        qb += bb.toLong * bb; qg += gg.toLong * gg; qr += rr.toLong * rr
        val lo = math.min(bb, math.min(gg, rr))
        val hi = math.max(bb, math.max(gg, rr))
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
        p += 3; x += 1
      }
      row += 1
    }
    Array(w.toLong, h.toLong, sr, sg, sb, w.toLong * h, mn, mx, qr, qg, qb)
  }
}

case class PpmInfo(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "ppm_info"
  override protected def staticScan: String = "graft.multimodal.PpmInfo.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    PpmInfo.scan(b)
  override protected def withNewChildInternal(newChild: Expression): PpmInfo =
    copy(child = newChild)
}

object PpmInfo {
  /** [width, height, sumR, sumG, sumB, nPx, minCh, maxCh] for binary
   * PPM (P6, maxval <= 255): ASCII header with `#` comments, ONE
   * whitespace after maxval, then raw RGB triplets. Null otherwise. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 9 || b(0) != 'P' || b(1) != '6') return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t'
    var i = 2
    def nextInt(): Long = {
      var run = true
      while (run && i < b.length) {
        if (isWs(u8(i))) i += 1
        else if (u8(i) == '#') { while (i < b.length && u8(i) != '\n') i += 1 }
        else run = false
      }
      if (i >= b.length || u8(i) < '0' || u8(i) > '9') return -1L
      var v = 0L
      while (i < b.length && u8(i) >= '0' && u8(i) <= '9') {
        v = v * 10 + (u8(i) - '0')
        if (v > (1L << 30)) return -1L
        i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return null
    if (i >= b.length || !isWs(u8(i))) return null
    i += 1 // exactly one whitespace before the raster
    val n = w * h
    if (i + n * 3 > b.length) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var k = 0L
    var p = i
    while (k < n) {
      val rr = u8(p); val gg = u8(p + 1); val bb = u8(p + 2)
      sr += rr; sg += gg; sb += bb
      qr += rr.toLong * rr; qg += gg.toLong * gg; qb += bb.toLong * bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      p += 3; k += 1
    }
    Array(w, h, sr, sg, sb, n, mn, mx, qr, qg, qb)
  }
}

case class TiffDims(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "tiff_dims"
  override protected def staticScan: String = "graft.multimodal.TiffDims.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    TiffDims.scan(b)
  override protected def withNewChildInternal(newChild: Expression): TiffDims =
    copy(child = newChild)
}

object TiffDims {
  /** [width, height] from IFD0 tags 256/257 (SHORT=3 or LONG=4 entry
   * types, value left-justified in the 4-byte field per the spec), both
   * II and MM byte orders. Null for non-TIFF or truncated IFDs. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 8) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    val le =
      b(0) == 'I' && b(1) == 'I' && u8(2) == 42 && u8(3) == 0
    val be =
      b(0) == 'M' && b(1) == 'M' && u8(2) == 0 && u8(3) == 42
    if (!le && !be) return null
    @inline def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    @inline def u32(i: Int): Long =
      if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = u16(ifd.toInt)
    var w = -1L; var h = -1L
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + k * 12
      if (e + 12 > b.length) return null
      val tag = u16(e); val typ = u16(e + 2)
      val v: Long =
        if (typ == 3) u16(e + 8).toLong // SHORT, left-justified
        else if (typ == 4) u32(e + 8)   // LONG
        else -1L
      if (tag == 256) w = v
      else if (tag == 257) h = v
      k += 1
    }
    if (w > 0 && h > 0) Array(w, h) else null
  }
}

/** ID3v2 TIT2/TPE1 extraction — string-array result, so it carries its
 * own expression shape rather than [[MediaScanExpr]]. */
case class Id3v2Tags(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "id3v2_tags"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val out = Id3v2Tags.scan(input.asInstanceOf[Array[Byte]])
    if (out == null) null else new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val arr = ctx.freshName("arr")
      s"""
         |Object[] $arr = graft.multimodal.Id3v2Tags.scan($b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Id3v2Tags =
    copy(child = newChild)
}

object Id3v2Tags {
  /** [version, title, artist] as UTF8Strings (title/artist null when the
   * frame is absent); null for non-ID3v2 payloads. Handles v2.3 (plain
   * u32 frame sizes) and v2.4 (syncsafe); text encodings 0 (ISO-8859-1)
   * and 3 (UTF-8); stops at the first padding byte. */
  def scan(b: Array[Byte]): Array[AnyRef] = {
    if (b == null || b.length < 10 ||
      b(0) != 'I' || b(1) != 'D' || b(2) != '3') return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    val vmaj = u8(3)
    if (vmaj < 2 || vmaj > 4) return null
    @inline def ss32(i: Int): Int =
      ((u8(i) & 0x7F) << 21) | ((u8(i + 1) & 0x7F) << 14) |
        ((u8(i + 2) & 0x7F) << 7) | (u8(i + 3) & 0x7F)
    @inline def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val end = math.min(10L + ss32(6), b.length.toLong).toInt
    var title: UTF8String = null
    var artist: UTF8String = null
    var i = 10
    var run = true
    while (run && i + 10 <= end) {
      if (u8(i) == 0) run = false // padding region
      else {
        val fsz = (if (vmaj == 4) ss32(i + 4).toLong else u32(i + 4)).toInt
        if (fsz <= 0 || i + 10 + fsz > end) run = false
        else {
          val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (id == "TIT2" || id == "TPE1") {
            val enc = u8(i + 10)
            val cs =
              if (enc == 0) java.nio.charset.StandardCharsets.ISO_8859_1
              else if (enc == 3) java.nio.charset.StandardCharsets.UTF_8
              else null
            if (cs != null && fsz > 1) {
              var len = fsz - 1
              while (len > 0 && b(i + 10 + len) == 0) len -= 1 // NUL term
              val s = UTF8String.fromString(
                new String(b, i + 11, len, cs))
              if (id == "TIT2") title = s else artist = s
            }
          }
          i += 10 + fsz
        }
      }
    }
    Array[AnyRef](UTF8String.fromString("2." + vmaj), title, artist)
  }
}

case class OggInfo(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "ogg_info"
  override protected def staticScan: String = "graft.multimodal.OggInfo.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    OggInfo.scan(b)
  override protected def withNewChildInternal(newChild: Expression): OggInfo =
    copy(child = newChild)
}

object OggInfo {
  /** [codec (0=opus, 1=vorbis), channels, sample_rate] from the first
   * OGG page's identification packet — the packet starts right after
   * the segment table (27 + n_segments bytes in). Opus rate is the
   * OpusHead input-sample-rate field; Vorbis the u32 at offset 12.
   * Null for non-OGG bytes or other codecs. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 28 ||
      b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S') return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    if (u8(4) != 0) return null // stream structure version
    val nsegs = u8(26)
    val p = 27 + nsegs
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    @inline def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length &&
        s.indices.forall(k => u8(i + k) == s.charAt(k))
    if (tag(p, "OpusHead") && p + 19 <= b.length)
      Array(0L, u8(p + 9).toLong, le32(p + 12))
    else if (p + 16 <= b.length && u8(p) == 1 && tag(p + 1, "vorbis"))
      Array(1L, u8(p + 11).toLong, le32(p + 12))
    else null
  }
}

/** OGG stream duration from the last page's granule position (see
 * [[OggDuration.scan]]). */
case class OggDuration(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "ogg_duration"
  override protected def staticScan: String =
    "graft.multimodal.OggDuration.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    OggDuration.scan(b)
  override protected def withNewChildInternal(newChild: Expression): OggDuration =
    copy(child = newChild)
}

object OggDuration {
  /** [codec, sample_rate, last_granulepos, duration_ms] — REAL OGG page
   * walk: the identification header gives codec + rate (+ the Opus
   * pre-skip), and the duration comes from the LAST page's granule
   * position — Vorbis granules are PCM samples at the stream rate,
   * Opus granules are 48 kHz samples with pre-skip subtracted
   * (RFC 7845). Pages advance by the 27 + n_segs + sum(lacing)
   * arithmetic; page CRCs are unverified (the PNG/JPEG stance). Null
   * for non-OGG bytes, unknown codecs, a malformed page chain, or a
   * stream whose every granule position is unset (-1). */
  def scan(b: Array[Byte]): Array[Long] = {
    val id = OggInfo.scan(b) // [codec, channels, rate] from the id page
    if (id == null) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le64(i: Int): Long = {
      var v = 0L; var k = 7
      while (k >= 0) { v = (v << 8) | u8(i + k); k -= 1 }
      v
    }
    val codec = id(0)
    val idPkt = 27 + u8(26)
    val preSkip = if (codec == 0L) le16(idPkt + 10) else 0
    var pos = 0
    var lastGp = -1L
    while (pos + 27 <= b.length && u8(pos) == 'O' && u8(pos + 1) == 'g' &&
        u8(pos + 2) == 'g' && u8(pos + 3) == 'S') {
      val gp = le64(pos + 6)
      if (gp != -1L) lastGp = gp
      val nsegs = u8(pos + 26)
      if (pos + 27 + nsegs > b.length) return null
      var sz = 0; var k = 0
      while (k < nsegs) { sz += u8(pos + 27 + k); k += 1 }
      pos += 27 + nsegs + sz
      if (pos > b.length) return null
    }
    if (pos != b.length || lastGp < 0) return null
    val samples = if (codec == 0L) math.max(0L, lastGp - preSkip) else lastGp
    val rate = if (codec == 0L) 48000L else id(2)
    if (rate <= 0) return null
    Array(codec, id(2), lastGp, samples * 1000L / rate)
  }
}

/** Full PNG pixel decode (see [[PngPixelStats.scan]]). */
case class PngPixelStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "png_pixel_stats"
  override protected def staticScan: String =
    "graft.multimodal.PngPixelStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    PngPixelStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}

object PngPixelStats {
  private final val MaxPixels = 1L << 26 // 64 Mpx decode bound per payload

  /** [width, height, sumR, sumG, sumB, nPx, minCh, maxCh] — REAL PNG
   * decode, no codec library: chunk walk, multi-IDAT zlib inflate via the
   * JDK's `java.util.zip.Inflater` (raw-deflate mode after validating the
   * 2-byte zlib header, so the Adler-32 trailer is not required), and
   * full scanline unfiltering (None/Sub/Up/Average/Paeth, RFC 2083 §6).
   * Scope: 8-bit depth, color types 2 (RGB) and 6 (RGBA, alpha excluded
   * from stats), no interlace. Chunk CRCs are NOT verified (the common
   * fast-path choice, e.g. libpng's PNG_CRC_QUIET_USE); anything else —
   * truncated stream, bad filter byte, short inflate — returns null. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 45) return null
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    var k = 0
    while (k < 8) { if ((b(k) & 0xFF) != sig(k)) return null; k += 1 }
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    @inline def isTag(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    // pass 1: IHDR fields + total IDAT payload size
    var w = -1L; var h = -1L; var bpp = 0
    var idatLen = 0L
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(i)
      if (len < 0 || len > Int.MaxValue - 12 ||
        i + 12 + len > b.length) return null
      if (isTag(i + 4, "IHDR")) {
        if (len != 13) return null
        w = be32(i + 8); h = be32(i + 12)
        val depth = u8(i + 16); val ct = u8(i + 17)
        val comp = u8(i + 18); val filt = u8(i + 19); val il = u8(i + 20)
        if (depth != 8 || (ct != 2 && ct != 6) || comp != 0 || filt != 0 ||
          il != 0) return null
        bpp = if (ct == 2) 3 else 4
      } else if (isTag(i + 4, "IDAT")) idatLen += len
      else if (isTag(i + 4, "IEND")) sawEnd = true
      i += 12 + len.toInt
    }
    if (w <= 0 || h <= 0 || w * h > MaxPixels || idatLen < 3) return null
    // pass 2: concatenate IDAT payloads
    val z = new Array[Byte](idatLen.toInt)
    var zp = 0
    i = 8
    while (i + 8 <= b.length) {
      val len = be32(i).toInt
      if (isTag(i + 4, "IDAT")) {
        System.arraycopy(b, i + 8, z, zp, len); zp += len
      }
      i += 12 + len
    }
    // zlib header: deflate method, window bits; inflate RAW past it so a
    // missing/garbage Adler-32 trailer cannot fail a full decode
    if ((z(0) & 0x0F) != 8) return null
    val stride = (w * bpp).toInt
    val raw = new Array[Byte](((stride + 1).toLong * h).toInt)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(z, 2, z.length - 2)
      var got = 0
      while (got < raw.length && !inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsDictionary()) return null
        got += n
      }
      if (got < raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // unfilter in place per RFC 2083; prior = reconstructed previous row
    val recon = new Array[Byte](stride * h.toInt)
    var row = 0
    while (row < h) {
      val f = raw(row * (stride + 1)) & 0xFF
      if (f > 4) return null
      val src = row * (stride + 1) + 1
      val dst = row * stride
      var x = 0
      while (x < stride) {
        val rv = raw(src + x) & 0xFF
        val a = if (x >= bpp) recon(dst + x - bpp) & 0xFF else 0
        val up = if (row > 0) recon(dst + x - stride) & 0xFF else 0
        val c = if (row > 0 && x >= bpp) recon(dst + x - stride - bpp) & 0xFF
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case _ => // Paeth
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        recon(dst + x) = ((rv + pred) & 0xFF).toByte
        x += 1
      }
      row += 1
    }
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var p = 0
    val n = w * h
    var px = 0L
    while (px < n) {
      val rr = recon(p) & 0xFF; val gg = recon(p + 1) & 0xFF
      val bb = recon(p + 2) & 0xFF
      sr += rr; sg += gg; sb += bb
      qr += rr.toLong * rr; qg += gg.toLong * gg; qb += bb.toLong * bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      p += bpp; px += 1
    }
    Array(w, h, sr, sg, sb, n, mn, mx, qr, qg, qb)
  }
}

/** WAV PCM sample decode (see [[WavPcmStats.scan]]). */
case class WavPcmStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "wav_pcm_stats"
  override protected def staticScan: String =
    "graft.multimodal.WavPcmStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    WavPcmStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

object WavPcmStats {
  /** [channels, sample_rate, n_frames, sum_abs, peak_abs, n_clipped,
   * sum_sq, zero_crossings, bps] — REAL audio content decode of
   * RIFF/WAVE PCM (format 1, 16-bit): the data chunk is walked as signed
   * little-endian samples. `sum_abs` and `peak_abs` are over ALL samples
   * (channels interleaved); a sample counts as clipped when
   * |s| >= 32767 (covering -32768). `sum_sq` is the exact integer sum of
   * squared samples (bounded: 2^30 per sample) and `zero_crossings`
   * counts PER-CHANNEL consecutive-sample sign flips (negative vs
   * non-negative, zero counting as non-negative), summed over channels —
   * the two waveform-statistics slots the real audio content embedding
   * reads (RMS + ZCR, cf. Wold et al. 1996). `bps` is the sample depth
   * (always 16 here; FLAC's scan reports its native depth). Chunk walk
   * honors the RIFF even-byte padding rule. Null for non-WAV, non-PCM,
   * non-16-bit, or truncated payloads. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 44) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def tag(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    var ch = -1; var rate = -1L
    var dataOff = -1; var dataLen = -1L
    var i = 12
    while (i + 8 <= b.length && (ch < 0 || dataOff < 0)) {
      val len = le32(i + 4) // chunk = [tag 4][len 4][body]
      if (len < 0 || i + 8 + len > b.length) return null
      if (tag(i, "fmt ") && len >= 16) {
        if (le16(i + 8) != 1 || le16(i + 22) != 16) return null // PCM s16
        ch = le16(i + 10); rate = le32(i + 12)
      } else if (tag(i, "data")) { dataOff = i + 8; dataLen = len }
      i += 8 + len.toInt + (len.toInt & 1) // RIFF chunks pad to even
    }
    // dataLen == 0 (a structurally-valid empty data chunk) is rejected
    // like FLAC's zero-sample case: no decodable samples means no stats,
    // and it keeps the content embedding's n > 0 invariant (no NaN)
    if (ch <= 0 || ch > 8 || rate <= 0 || dataOff < 0 || dataLen == 0 ||
      dataLen % (2L * ch) != 0) return null
    val nSamp = (dataLen / 2).toInt
    var sumAbs = 0L; var peak = 0L; var clipped = 0L
    var sumSq = 0L; var zc = 0L
    // per-channel previous-sample sign for ZCR (interleaved stream);
    // prevNeg bit i = channel i's last sample was negative
    val prevNeg = new Array[Boolean](ch)
    val seen = new Array[Boolean](ch)
    var p = dataOff
    var k = 0
    while (k < nSamp) {
      val s = (u8(p) | (u8(p + 1) << 8)).toShort.toInt
      val a = math.abs(s).toLong
      sumAbs += a
      sumSq += s.toLong * s
      if (a > peak) peak = a
      if (a >= 32767) clipped += 1
      val c = k % ch
      val neg = s < 0
      if (seen(c) && neg != prevNeg(c)) zc += 1
      prevNeg(c) = neg; seen(c) = true
      p += 2; k += 1
    }
    Array(ch.toLong, rate, nSamp / ch, sumAbs, peak, clipped,
      sumSq, zc, 16L)
  }
}

/** GIF pixel decode with a real LZW decompressor (see
 * [[GifPixelStats.scan]]). */
case class GifPixelStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "gif_pixel_stats"
  override protected def staticScan: String =
    "graft.multimodal.GifPixelStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    GifPixelStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): GifPixelStats =
    copy(child = newChild)
}

object GifPixelStats {
  private final val MaxPixels = 1L << 26

  /** [width, height, sumR, sumG, sumB, nPx, minCh, maxCh] — REAL GIF
   * decode, no codec library: logical-screen + color-table parse, block
   * walk (extensions skipped sub-block-correctly), and a full variable-
   * width LZW decompressor (clear/EOI codes, the KwKwK self-reference
   * case, 4096-entry dictionary, width bumps at 2^w) over the FIRST
   * image's index stream, mapped through the active (local-over-global)
   * color table. Interlace is accepted: row order does not change
   * channel sums or min/max. Null for non-GIF, truncated, or
   * malformed-LZW payloads. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 14) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
      (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val packed = u8(10)
    var i = 13
    var gctOff = -1; var gctSize = 0
    if ((packed & 0x80) != 0) {
      gctSize = 2 << (packed & 7); gctOff = i
      i += gctSize * 3
    }
    // block walk to the first image descriptor
    while (i < b.length && u8(i) != 0x2C) {
      u8(i) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x3B => return null // trailer before any image
        case _ => return null
      }
    }
    if (i + 10 > b.length) return null
    val w = le16(i + 5); val h = le16(i + 7)
    val iflags = u8(i + 9)
    i += 10
    var ctOff = gctOff; var ctSize = gctSize
    if ((iflags & 0x80) != 0) { // local color table wins
      ctSize = 2 << (iflags & 7); ctOff = i; i += ctSize * 3
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels || ctOff < 0 ||
      ctOff + ctSize * 3 > b.length || i >= b.length) return null
    val minCode = u8(i); i += 1
    if (minCode < 2 || minCode > 8) return null
    // concatenate the image's data sub-blocks
    var total = 0
    var j = i
    while (j < b.length && u8(j) != 0) { total += u8(j); j += 1 + u8(j) }
    if (j >= b.length) return null
    val z = new Array[Byte](total)
    var zp = 0; j = i
    while (u8(j) != 0) {
      val len = u8(j)
      if (j + 1 + len > b.length) return null
      System.arraycopy(b, j + 1, z, zp, len); zp += len; j += 1 + len
    }
    // LZW decode into the index raster
    val n = w * h
    val out = new Array[Byte](n)
    var op = 0
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var width = minCode + 1; var next = eoi + 1
    var bitPos = 0
    var prev = -1
    var prevFirst: Byte = 0 // first index of prev's decoded string
    @inline def readCode(): Int = {
      if (bitPos + width > z.length * 8) return -1
      var v = 0; var k = 0
      while (k < width) {
        val bit = bitPos + k
        if ((z(bit >> 3) & (1 << (bit & 7))) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }
    val stack = new Array[Byte](4096)
    var done = false
    while (!done && op < n) {
      val code = readCode()
      if (code < 0) return null
      if (code == clear) {
        width = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        var sp = 0
        var cur = code
        if (code >= next) {
          // KwKwK: code not yet in dict — must be prev + first(prev)
          if (prev < 0 || code != next) return null
          stack(sp) = prevFirst; sp += 1
          cur = prev
        }
        while (cur >= clear + 2) { // walk dictionary chain
          if (sp >= stack.length) return null
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        if (cur >= ctSize) return null // literal outside color table
        val first = cur.toByte
        if (op + sp + 1 > n) return null
        out(op) = first; op += 1
        while (sp > 0) { sp -= 1; out(op) = stack(sp); op += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prevFirst = first
        prev = code
      }
    }
    if (op != n) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var k = 0
    while (k < n) {
      val idx = out(k) & 0xFF
      val p = ctOff + idx * 3
      val rr = u8(p); val gg = u8(p + 1); val bb = u8(p + 2)
      sr += rr; sg += gg; sb += bb
      qr += rr.toLong * rr; qg += gg.toLong * gg; qb += bb.toLong * bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      k += 1
    }
    Array(w.toLong, h.toLong, sr, sg, sb, n.toLong, mn, mx, qr, qg, qb)
  }
}

/** Full baseline JPEG pixel decode (see [[JpegPixelStats.scan]]). */
case class JpegPixelStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "jpeg_pixel_stats"
  override protected def staticScan: String =
    "graft.multimodal.JpegPixelStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    JpegPixelStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): JpegPixelStats =
    copy(child = newChild)
}

object JpegPixelStats {
  private final val MaxPixels = 1L << 26 // 64 Mpx decode bound per payload

  /** IDCT basis: basis(u)(x) = C(u) cos((2x+1) u pi / 16), C(0)=1/sqrt2
   * (ITU T.81 A.3.3). A DC-only block therefore reconstructs to exactly
   * round(DC*Q/8)+128 in double precision — the property the oracled
   * solid-gray synthesis leans on. */
  private val basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** zigzag index -> natural (row-major) index, T.81 figure A.6. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the T.81 F.2.2.3 DECODE shape:
   * per-length mincode/maxcode/valptr over the DHT value list. */
  private final class Huff(val minCode: Array[Int], val maxCode: Array[Int],
      val valPtr: Array[Int], val vals: Array[Int])

  private def buildHuff(counts: Array[Int], vals: Array[Int]): Huff = {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      if (counts(l) > 0) {
        valPtr(l) = k; minCode(l) = code
        code += counts(l); k += counts(l)
        maxCode(l) = code - 1
      }
      if (code > (1 << l)) return null // over-subscribed table
      code <<= 1
      l += 1
    }
    new Huff(minCode, maxCode, valPtr, vals)
  }

  /** Entropy-segment bit reader: 0xFF00 destuffing; any other marker
   * byte ends the readable stream (restart consumption is explicit). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) return -1
          if ((b(pos) & 0xFF) == 0x00) pos += 1 // stuffed data 0xFF
          else { pos -= 1; return -1 }          // a real marker: stop
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    /** Byte-align and consume one RSTn marker (T.81 F.2.1.3.1). */
    def restart(): Boolean = {
      cnt = 0
      if (pos + 2 > b.length || (b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
    def decode(t: Huff): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val bit = nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        if (code <= t.maxCode(l))
          return t.vals(t.valPtr(l) + code - t.minCode(l))
        l += 1
      }
      -1
    }
    /** n raw bits, MSB first; Int.MinValue on truncation. */
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
  }

  /** T.81 F.12 EXTEND: map an n-bit magnitude to its signed value. */
  @inline private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** Exact separable 2-D IDCT (double precision) + level shift + clamp. */
  private def idct(coef: Array[Int], tmp: Array[Double],
      out: Array[Int]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += basis(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += basis(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val p = math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** [width, height, sumR, sumG, sumB, nPx, minCh, maxCh] — REAL baseline
   * JPEG decode, no codec library (ITU T.81 baseline sequential DCT):
   * marker segment walk (DQT 8/16-bit, DHT, SOF0/SOF1, DRI, APPn/COM
   * skipped), canonical Huffman entropy decode with 0xFF00 destuffing and
   * RSTn restart-interval handling, dequantization through the zigzag
   * map, an exact double-precision 2-D IDCT per 8x8 block, box chroma
   * upsampling for subsampled scans (4:4:4/4:2:2/4:2:0), and JFIF
   * YCbCr->RGB with per-channel rounding and clamping. Scope: 8-bit
   * precision, 1 or 3 components, sampling factors 1-2, single
   * interleaved scan in SOF component order. Progressive (SOF2),
   * arithmetic-coded, hierarchical, 12-bit, and >2 sampling payloads
   * return null, as does any truncated or malformed stream. Pinned in
   * MediaPixelSpec against the JDK ImageIO codec on random images (gray
   * exact-to-rounding, RGB within upsampling tolerance) and against
   * hand-built DC-only streams where the decode is bit-exact. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 16) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xFF || u8(1) != 0xD8) return null
    val quant = Array.ofDim[Int](4, 64) // natural order after zigzag map
    val quantSeen = new Array[Boolean](4)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var w = 0; var h = 0; var nc = 0
    val compId = new Array[Int](3); val compH = new Array[Int](3)
    val compV = new Array[Int](3); val compTq = new Array[Int](3)
    val compTd = new Array[Int](3); val compTa = new Array[Int](3)
    var restartInterval = 0
    var sosAt = -1
    var i = 2
    while (sosAt < 0) {
      if (i + 2 > b.length) return null
      if (u8(i) != 0xFF) return null
      var m = u8(i + 1)
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(i + 1) } // fill
      i += 2
      if (m == 0xD9) return null                 // EOI before any scan
      else if ((m >= 0xD0 && m <= 0xD7) || m == 0x01) () // standalone
      else {
        if (i + 2 > b.length) return null
        val len = be16(i)
        if (len < 2 || i + len > b.length) return null
        m match {
          case 0xDB => // DQT: one or more tables, 8- or 16-bit entries
            var p = i + 2
            while (p < i + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 15
              val sz = if (pq == 0) 64 else 128
              if (pq > 1 || tq > 3 || p + 1 + sz > i + len) return null
              var k = 0
              while (k < 64) {
                quant(tq)(zigzag(k)) =
                  if (pq == 0) u8(p + 1 + k)
                  else (u8(p + 1 + 2 * k) << 8) | u8(p + 2 + 2 * k)
                k += 1
              }
              quantSeen(tq) = true
              p += 1 + sz
            }
          case 0xC4 => // DHT: one or more tables
            var p = i + 2
            while (p < i + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 15
              if (tc > 1 || th > 3 || p + 17 > i + len) return null
              val counts = new Array[Int](17)
              var total = 0; var l = 1
              while (l <= 16) { counts(l) = u8(p + l); total += counts(l); l += 1 }
              if (total > 256 || p + 17 + total > i + len) return null
              val vals = new Array[Int](total)
              var j = 0
              while (j < total) { vals(j) = u8(p + 17 + j); j += 1 }
              val tbl = buildHuff(counts, vals)
              if (tbl == null) return null
              if (tc == 0) huffDc(th) = tbl else huffAc(th) = tbl
              p += 17 + total
            }
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (len < 8) return null
            val prec = u8(i + 2)
            h = be16(i + 3); w = be16(i + 5); nc = u8(i + 7)
            if (prec != 8 || (nc != 1 && nc != 3) || len != 8 + 3 * nc)
              return null
            var c = 0
            while (c < nc) {
              compId(c) = u8(i + 8 + 3 * c)
              val hv = u8(i + 9 + 3 * c)
              compH(c) = hv >> 4; compV(c) = hv & 15
              compTq(c) = u8(i + 10 + 3 * c)
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 ||
                compV(c) > 2 || compTq(c) > 3) return null
              c += 1
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
              0xCD | 0xCE | 0xCF =>
            return null // progressive / lossless / arithmetic: not baseline
          case 0xDD => // DRI
            if (len != 4) return null
            restartInterval = be16(i + 2)
          case 0xDA => // SOS: require the interleaved scan in SOF order
            if (w <= 0) return null
            val ns = u8(i + 2)
            if (ns != nc || len != 6 + 2 * ns) return null
            var c = 0
            while (c < ns) {
              if (u8(i + 3 + 2 * c) != compId(c)) return null
              compTd(c) = u8(i + 4 + 2 * c) >> 4
              compTa(c) = u8(i + 4 + 2 * c) & 15
              if (compTd(c) > 3 || compTa(c) > 3) return null
              c += 1
            }
            sosAt = i + len
          case _ => () // APPn / COM / DNL etc.: skip by length
        }
        i += len
      }
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    // single-component scans are never interleaved: MCU = one block
    if (nc == 1) { compH(0) = 1; compV(0) = 1 }
    var hMax = 1; var vMax = 1
    var c = 0
    while (c < nc) {
      if (!quantSeen(compTq(c)) || huffDc(compTd(c)) == null ||
        huffAc(compTa(c)) == null) return null
      if (compH(c) > hMax) hMax = compH(c)
      if (compV(c) > vMax) vMax = compV(c)
      c += 1
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = new Array[Int](nc)
    val planes = new Array[Array[Byte]](nc)
    c = 0
    while (c < nc) {
      planeW(c) = mcusX * compH(c) * 8
      planes(c) = new Array[Byte](planeW(c) * (mcusY * compV(c) * 8))
      c += 1
    }
    val dcPred = new Array[Int](3)
    val br = new BitReader(b, sosAt)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    val nMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return null
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      c = 0
      while (c < nc) {
        val q = quant(compTq(c))
        val dcT = huffDc(compTd(c)); val acT = huffAc(compTa(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val s = br.decode(dcT)
            if (s < 0 || s > 11) return null
            val diffBits = br.receive(s)
            if (diffBits == Int.MinValue) return null
            dcPred(c) += extend(diffBits, s)
            coef(0) = dcPred(c) * q(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = br.decode(acT)
              if (rs < 0) return null
              val run = rs >> 4; val sz = rs & 15
              if (sz == 0) {
                if (run == 15) k += 16 else open = false // ZRL / EOB
              } else {
                if (sz > 10) return null
                k += run
                if (k > 63) return null
                val vb = br.receive(sz)
                if (vb == Int.MinValue) return null
                coef(zigzag(k)) = extend(vb, sz) * q(zigzag(k))
                k += 1
              }
            }
            idct(coef, tmp, blk)
            val px0 = (mx * compH(c) + bx) * 8
            val py0 = (my * compV(c) + by) * 8
            val pw = planeW(c); val pl = planes(c)
            var yy = 0
            while (yy < 8) {
              val off = (py0 + yy) * pw + px0
              var xx = 0
              while (xx < 8) { pl(off + xx) = blk(yy * 8 + xx).toByte; xx += 1 }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // color conversion + stats over the visible w x h window
    var sr = 0L; var sg = 0L; var sb = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var mn = 255L; var mx2 = 0L
    val y0 = planes(0); val pw0 = planeW(0)
    if (nc == 1) {
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val v = y0(yy * pw0 + xx) & 0xFF
          sr += v
          qr += v.toLong * v
          if (v < mn) mn = v
          if (v > mx2) mx2 = v
          xx += 1
        }
        yy += 1
      }
      sg = sr; sb = sr; qg = qr; qb = qr
    } else {
      val cbP = planes(1); val crP = planes(2)
      val pw1 = planeW(1); val pw2 = planeW(2)
      val h0 = compH(0); val v0 = compV(0)
      val h1 = compH(1); val v1 = compV(1)
      val h2c = compH(2); val v2 = compV(2)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val yv = (y0((yy * v0 / vMax) * pw0 + (xx * h0 / hMax)) & 0xFF)
            .toDouble
          val cb = (cbP((yy * v1 / vMax) * pw1 + (xx * h1 / hMax)) & 0xFF) -
            128.0
          val cr = (crP((yy * v2 / vMax) * pw2 + (xx * h2c / hMax)) & 0xFF) -
            128.0
          @inline def cl(d: Double): Int = {
            val p = math.round(d).toInt
            if (p < 0) 0 else if (p > 255) 255 else p
          }
          val rr = cl(yv + 1.402 * cr)
          val gg = cl(yv - 0.344136 * cb - 0.714136 * cr)
          val bb = cl(yv + 1.772 * cb)
          sr += rr; sg += gg; sb += bb
          qr += rr.toLong * rr; qg += gg.toLong * gg; qb += bb.toLong * bb
          val lo = math.min(rr, math.min(gg, bb))
          val hi = math.max(rr, math.max(gg, bb))
          if (lo < mn) mn = lo
          if (hi > mx2) mx2 = hi
          xx += 1
        }
        yy += 1
      }
    }
    Array(w.toLong, h.toLong, sr, sg, sb, w.toLong * h, mn, mx2, qr, qg, qb)
  }
}

/** Full FLAC frame decode to PCM samples (see [[FlacPcmStats.scan]]). */
case class FlacPcmStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "flac_pcm_stats"
  override protected def staticScan: String =
    "graft.multimodal.FlacPcmStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    FlacPcmStats.scan(b)
  override protected def withNewChildInternal(newChild: Expression): FlacPcmStats =
    copy(child = newChild)
}

object FlacPcmStats {
  private final val MaxSamples = 1L << 26

  /** Control-flow sentinel for malformed streams (no stack trace). */
  private object Bad extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** MSB-first bit reader over the whole payload. */
  private final class Bits(b: Array[Byte]) {
    var pos = 0 // absolute bit position
    private val end = b.length.toLong * 8
    @inline def need(n: Long): Unit = if (pos + n > end) throw Bad
    def bit(): Int = {
      need(1)
      val r = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      r
    }
    /** up to 57 bits, unsigned. */
    def bits(n: Int): Long = {
      need(n)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** n-bit two's-complement signed, n in 1..32. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    /** zero-run unary (count 0s, consume the terminating 1). */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) throw Bad }
      q
    }
    def align(): Unit = pos = (pos + 7) & ~7
    def atEnd: Boolean = pos == end
  }

  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)
  private val BpsTable = Array(-1, 8, 12, -1, 16, 20, 24, 32)

  /** Rice/rice2-coded residual into `out[from until blockSize]`. */
  private def residual(r: Bits, out: Array[Int], order: Int,
      blockSize: Int): Unit = {
    val method = r.bits(2).toInt
    if (method > 1) throw Bad
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.bits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) throw Bad
    val perPart = blockSize >> po
    if (perPart <= order && parts == 1) throw Bad
    var p = 0
    var k = order
    while (p < parts) {
      val n = if (p == 0) perPart - order else perPart
      if (n < 0) throw Bad
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt // verbatim residual width, 0 = all zero
        var i = 0
        while (i < n) { out(k) = if (raw == 0) 0 else r.sbits(raw); k += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.unary()
          val v = (q.toLong << param) | r.bits(param)
          out(k) = ((v >>> 1) ^ -(v & 1)).toInt // zigzag
          k += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** One subframe into `out` (blockSize samples at effective bps). */
  private def subframe(r: Bits, out: Array[Int], blockSize: Int,
      bps: Int): Unit = {
    if (r.bit() != 0) throw Bad // mandatory zero pad bit
    val ty = r.bits(6).toInt
    var wasted = 0
    if (r.bit() == 1) wasted = r.unary() + 1
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) throw Bad
    ty match {
      case 0 => // CONSTANT
        val v = r.sbits(eff)
        java.util.Arrays.fill(out, 0, blockSize, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(i) = r.sbits(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED, order 0..4
        val order = t - 8
        if (order > blockSize) throw Bad
        var i = 0
        while (i < order) { out(i) = r.sbits(eff); i += 1 }
        residual(r, out, order, blockSize)
        var k = order
        order match {
          case 0 => ()
          case 1 => while (k < blockSize) { out(k) += out(k - 1); k += 1 }
          case 2 => while (k < blockSize) {
            out(k) += 2 * out(k - 1) - out(k - 2); k += 1 }
          case 3 => while (k < blockSize) {
            out(k) += 3 * out(k - 1) - 3 * out(k - 2) + out(k - 3); k += 1 }
          case _ => while (k < blockSize) {
            out(k) += 4 * out(k - 1) - 6 * out(k - 2) + 4 * out(k - 3) -
              out(k - 4); k += 1 }
        }
      case t if t >= 32 => // LPC, order 1..32
        val order = t - 31
        if (order > blockSize) throw Bad
        var i = 0
        while (i < order) { out(i) = r.sbits(eff); i += 1 }
        val prec = r.bits(4).toInt + 1
        if (prec == 16) throw Bad // 0b1111 is invalid
        val shift = r.sbits(5)
        if (shift < 0) throw Bad
        val coef = new Array[Int](order)
        i = 0
        while (i < order) { coef(i) = r.sbits(prec); i += 1 }
        residual(r, out, order, blockSize)
        var k = order
        while (k < blockSize) {
          var acc = 0L; var j = 0
          while (j < order) { acc += coef(j).toLong * out(k - 1 - j); j += 1 }
          out(k) += (acc >> shift).toInt
          k += 1
        }
      case _ => throw Bad // reserved subframe types
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
  }

  /** [channels, sample_rate, n_frames, sum_abs, peak_abs, n_clipped,
   * sum_sq, zero_crossings, bps] —
   * REAL FLAC audio decode, no codec library (the format is public and
   * lossless, RFC 9639): STREAMINFO + metadata-block walk, frame-header
   * parse (coded blocksize/rate/channel-assignment/bps + UTF-8-style
   * frame number), then per channel the full subframe set — CONSTANT,
   * VERBATIM, FIXED orders 0-4, and LPC to order 32 with quantized
   * coefficients — with rice/rice2 residual partitions (escape-coded
   * verbatim partitions included), wasted-bits shift, and left/side,
   * right/side, mid/side stereo decorrelation. Slot semantics match
   * [[WavPcmStats]]: `n_frames` = samples per channel, `sum_abs`/`peak`
   * over all channels, clipped = |s| >= fullScale-1 for the stream's
   * bit depth. `sum_sq` is summed over samples arithmetic-shifted to
   * 16-bit scale (s >> (bps-16), or << for shallower streams; identity
   * at bps=16) so the exact-long accumulator cannot overflow on deep
   * 24/32-bit content; `zero_crossings` counts per-channel sign flips
   * at native depth (shift-invariant), summed over channels; `bps` is
   * the STREAMINFO depth — together the waveform-statistics slots the
   * real audio content embedding reads. Frame CRC-8/CRC-16 and the
   * STREAMINFO MD5 are not verified (the PNG/JPEG stance); any
   * structural violation returns null. Pinned in MediaAudioSpec against
   * an independent test-side FLAC encoder — lossless round-trip, so
   * stats match bit-exactly. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 42 || b.length > (Int.MaxValue >> 3))
      return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    // metadata walk; STREAMINFO must be first (type 0, 34 bytes)
    if ((u8(4) & 0x7F) != 0 || ((u8(5) << 16) | (u8(6) << 8) | u8(7)) != 34)
      return null
    var last = (u8(4) & 0x80) != 0
    // STREAMINFO body starts at 8: blocksizes 8-11, framesizes 12-17,
    // then rate(20)|ch-1(3)|bps-1(5)|total(36) packed from byte 18
    val rate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
    val nCh = ((u8(20) >> 1) & 7) + 1
    val bps = (((u8(20) & 1) << 4) | (u8(21) >> 4)) + 1
    if (rate <= 0 || nCh > 8 || bps < 4 || bps > 32) return null
    var off = 8 + 34
    while (!last) {
      if (off + 4 > b.length) return null
      last = (u8(off) & 0x80) != 0
      val len = (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
      off += 4 + len
      if (off > b.length) return null
    }
    try {
      val r = new Bits(b)
      r.pos = off * 8
      var sumAbs = 0L; var peak = 0L; var clipped = 0L
      var sumSq = 0L; var zc = 0L
      val prevNeg = new Array[Boolean](nCh)
      val seen = new Array[Boolean](nCh)
      // 16-bit normalization shift for the sum_sq accumulator (exact,
      // overflow-safe at any depth); identity for 16-bit streams
      val sqShift = bps - 16
      var totalPerCh = 0L
      val clipAt = (1L << (bps - 1)) - 1
      var chans: Array[Array[Int]] = null
      while (!r.atEnd) {
        // ---- frame header
        if (r.bits(14) != 0x3FFE) throw Bad
        if (r.bit() != 0) throw Bad
        r.bit() // blocking strategy
        val bsCode = r.bits(4).toInt
        val srCode = r.bits(4).toInt
        val chCode = r.bits(4).toInt
        val ssCode = r.bits(3).toInt
        if (r.bit() != 0) throw Bad
        // coded number (UTF-8 shape, up to 7 bytes): parse and discard
        val first = r.bits(8).toInt
        var cont = 0
        if ((first & 0x80) != 0) {
          var m = first
          while ((m & 0x40) != 0) { cont += 1; m <<= 1 }
          if (cont == 0 || cont > 6) throw Bad
          var j = 0
          while (j < cont) {
            if ((r.bits(8).toInt & 0xC0) != 0x80) throw Bad
            j += 1
          }
        }
        val blockSize = bsCode match {
          case 0 => throw Bad
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.bits(8).toInt + 1
          case 7 => r.bits(16).toInt + 1
          case c => 256 << (c - 8)
        }
        val frameRate = srCode match {
          case 0 => rate
          case c if c <= 11 => RateTable(c)
          case 12 => r.bits(8).toInt * 1000
          case 13 => r.bits(16).toInt
          case 14 => r.bits(16).toInt * 10
          case _ => throw Bad
        }
        if (frameRate <= 0) throw Bad
        val frameBps = if (ssCode == 0) bps else BpsTable(ssCode)
        if (frameBps <= 0) throw Bad
        val frameCh = if (chCode <= 7) chCode + 1 else 2
        if (chCode > 10 || frameCh != nCh) throw Bad
        r.bits(8) // CRC-8 (unverified)
        totalPerCh += blockSize
        if (totalPerCh * nCh > MaxSamples) throw Bad
        // ---- subframes
        if (chans == null || chans(0).length < blockSize)
          chans = Array.fill(nCh)(new Array[Int](blockSize))
        var c = 0
        while (c < nCh) {
          // side channel carries one extra bit of depth
          val sideBit = chCode match {
            case 8 => if (c == 1) 1 else 0  // left/side
            case 9 => if (c == 0) 1 else 0  // side/right
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _ => 0
          }
          subframe(r, chans(c), blockSize, frameBps + sideBit)
          c += 1
        }
        // ---- stereo decorrelation in place
        chCode match {
          case 8 => // left/side: right = left - side
            var i = 0
            while (i < blockSize) {
              chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
          case 9 => // side/right: left = right + side
            var i = 0
            while (i < blockSize) {
              chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val s = chans(1)(i)
              val m2 = (chans(0)(i) << 1) | (s & 1)
              chans(0)(i) = (m2 + s) >> 1
              chans(1)(i) = (m2 - s) >> 1
              i += 1
            }
          case _ => ()
        }
        r.align()
        r.bits(16) // frame CRC-16 (unverified)
        // ---- stats
        var i = 0
        while (i < blockSize) {
          var c2 = 0
          while (c2 < nCh) {
            val s = chans(c2)(i)
            val a = math.abs(s.toLong)
            sumAbs += a
            if (a > peak) peak = a
            if (a >= clipAt) clipped += 1
            val s16 = if (sqShift >= 0) s >> sqShift else s << -sqShift
            sumSq += s16.toLong * s16
            val neg = s < 0
            if (seen(c2) && neg != prevNeg(c2)) zc += 1
            prevNeg(c2) = neg; seen(c2) = true
            c2 += 1
          }
          i += 1
        }
      }
      if (totalPerCh == 0) return null
      Array(nCh.toLong, rate.toLong, totalPerCh, sumAbs, peak, clipped,
        sumSq, zc, bps.toLong)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }
}
