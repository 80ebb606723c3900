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
 * codec-requiring decode only: uncompressed-BMP and PPM-P6 PIXEL decode
 * (real per-pixel channel sums/min/max — the engine's first actual
 * content decode, not just header dims), TIFF/ICO dimensions, ID3v1/v2
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
   * 7=min_ch, 8=max_ch. BMP: uncompressed 24-bit, BGR rows bottom-up,
   * 4-byte row padding skipped. PPM: binary P6, maxval <= 255, `#`
   * header comments. Null for anything else. */
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

  /** array(channels, sample_rate, n_frames, sum_abs, peak_abs, n_clipped)
   * — REAL WAV PCM s16 sample decode; see [[WavPcmStats.scan]]. */
  def wavPcmScan(bin: Column): Column =
    ColumnShim.column(WavPcmStats(ColumnShim.expression(bin)))

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
    if (w <= 0 || h == 0 || bpp != 24 || comp != 0L) return null
    val stride = (w * 3 + 3) & ~3
    if (dataOff < 54 || dataOff + stride.toLong * h > b.length) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255L; var mx = 0L
    var row = 0
    while (row < h) {
      var p = dataOff.toInt + row * stride
      var x = 0
      while (x < w) {
        val bb = u8(p); val gg = u8(p + 1); val rr = u8(p + 2)
        sb += bb; sg += gg; sr += rr
        val lo = math.min(bb, math.min(gg, rr))
        val hi = math.max(bb, math.max(gg, rr))
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
        p += 3; x += 1
      }
      row += 1
    }
    Array(w.toLong, h.toLong, sr, sg, sb, w.toLong * h, mn, mx)
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
    var k = 0L
    var p = i
    while (k < n) {
      val rr = u8(p); val gg = u8(p + 1); val bb = u8(p + 2)
      sr += rr; sg += gg; sb += bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      p += 3; k += 1
    }
    Array(w, h, sr, sg, sb, n, mn, mx)
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
    var p = 0
    val n = w * h
    var px = 0L
    while (px < n) {
      val rr = recon(p) & 0xFF; val gg = recon(p + 1) & 0xFF
      val bb = recon(p + 2) & 0xFF
      sr += rr; sg += gg; sb += bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      p += bpp; px += 1
    }
    Array(w, h, sr, sg, sb, n, mn, mx)
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
  /** [channels, sample_rate, n_frames, sum_abs, peak_abs, n_clipped] —
   * REAL audio content decode of RIFF/WAVE PCM (format 1, 16-bit): the
   * data chunk is walked as signed little-endian samples. `sum_abs` and
   * `peak_abs` are over ALL samples (channels interleaved); a sample
   * counts as clipped when |s| >= 32767 (covering -32768). Chunk walk
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
    if (ch <= 0 || ch > 8 || rate <= 0 || dataOff < 0 ||
      dataLen % (2L * ch) != 0) return null
    val nSamp = (dataLen / 2).toInt
    var sumAbs = 0L; var peak = 0L; var clipped = 0L
    var p = dataOff
    var k = 0
    while (k < nSamp) {
      val s = (u8(p) | (u8(p + 1) << 8)).toShort.toInt
      val a = math.abs(s).toLong
      sumAbs += a
      if (a > peak) peak = a
      if (a >= 32767) clipped += 1
      p += 2; k += 1
    }
    Array(ch.toLong, rate, nSamp / ch, sumAbs, peak, clipped)
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
    var k = 0
    while (k < n) {
      val idx = out(k) & 0xFF
      val p = ctOff + idx * 3
      val rr = u8(p); val gg = u8(p + 1); val bb = u8(p + 2)
      sr += rr; sg += gg; sb += bb
      val lo = math.min(rr, math.min(gg, bb))
      val hi = math.max(rr, math.max(gg, bb))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      k += 1
    }
    Array(w.toLong, h.toLong, sr, sg, sb, n.toLong, mn, mx)
  }
}
