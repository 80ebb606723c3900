package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.ColumnShim

/**
 * REAL image-header decoding — the one part of the multimodal surface
 * that needs no codec library, so it is not stubbed: width/height from
 * the fixed-offset headers of PNG (IHDR: 8-byte signature, 4-byte
 * length, "IHDR", then two big-endian u32) and GIF (6-byte signature
 * then two little-endian u16), and from JPEG's SOF segment found by a
 * marker-segment scan.
 *
 * PNG/GIF are pure Column expressions (hex + conv arithmetic — fully
 * codegen'd, zero UDF). JPEG needs a variable-length scan, so it is a
 * native Catalyst expression ([[JpegDims]]) with a primitive-loop
 * `doGenCode` — the same pattern as
 * [[graft.functions.VectorNearestCells]].
 */
object MediaHeaders {

  private def be(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast(IntegerType)

  /** One little-endian u16 at 1-based byte offset `pos`. */
  private def le16(bin: Column, pos: Int): Column =
    (be(bin, pos, 1) + be(bin, pos + 1, 1) * 256).cast(IntegerType)

  def isPng(bin: Column): Column =
    octet_length(bin) >= 24 &&
      hex(substring(bin, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(bin, 13, 4)) === "49484452" // "IHDR"

  /** struct(width, height) of a PNG payload (null when not a PNG). */
  def pngDims(bin: Column): Column =
    when(isPng(bin),
      struct(be(bin, 17, 4).as("width"), be(bin, 21, 4).as("height")))
      .otherwise(lit(null).cast("struct<width:int,height:int>"))

  def isGif(bin: Column): Column =
    octet_length(bin) >= 10 &&
      (hex(substring(bin, 1, 6)) === "474946383761" || // GIF87a
        hex(substring(bin, 1, 6)) === "474946383961")  // GIF89a

  /** struct(width, height) of a GIF payload's logical screen descriptor. */
  def gifDims(bin: Column): Column =
    when(isGif(bin),
      struct(le16(bin, 7).as("width"), le16(bin, 9).as("height")))
      .otherwise(lit(null).cast("struct<width:int,height:int>"))

  def isJpeg(bin: Column): Column =
    octet_length(bin) >= 4 && hex(substring(bin, 1, 3)) === "FFD8FF"

  /** [width, height] from the first SOF segment, or null. */
  def jpegDims(bin: Column): Column =
    ColumnShim.column(JpegDims(ColumnShim.expression(bin)))

  /** Dispatch on magic bytes: struct(format, width, height), null for
   * payloads that are none of PNG/JPEG/GIF. */
  def imageDims(bin: Column): Column = {
    val jd = jpegDims(bin)
    when(isPng(bin), struct(lit("png").as("format"),
      be(bin, 17, 4).as("width"), be(bin, 21, 4).as("height")))
      .when(isJpeg(bin) && jd.isNotNull, struct(lit("jpeg").as("format"),
        element_at(jd, 1).as("width"), element_at(jd, 2).as("height")))
      .when(isGif(bin), struct(lit("gif").as("format"),
        le16(bin, 7).as("width"), le16(bin, 9).as("height")))
      .otherwise(lit(null).cast("struct<format:string,width:int,height:int>"))
  }

  /** One little-endian u32 at 1-based byte offset `pos`, as a long. */
  private def le32(bin: Column, pos: Int): Column =
    (be(bin, pos, 1).cast(LongType) +
      be(bin, pos + 1, 1).cast(LongType) * 256L +
      be(bin, pos + 2, 1).cast(LongType) * 65536L +
      be(bin, pos + 3, 1).cast(LongType) * 16777216L)

  /** Canonical-layout WAV: RIFF/WAVE signature with the fmt chunk at
   * offset 12 and the data chunk immediately after (offset 36) — the
   * layout nearly every encoder writes. Non-canonical chunk orders
   * (LIST/INFO before data) return null; documented. */
  def isWav(bin: Column): Column =
    octet_length(bin) >= 44 &&
      hex(substring(bin, 1, 4)) === "52494646" &&   // "RIFF"
      hex(substring(bin, 9, 4)) === "57415645" &&   // "WAVE"
      hex(substring(bin, 13, 4)) === "666D7420" &&  // "fmt "
      hex(substring(bin, 37, 4)) === "64617461"     // "data"

  /** struct(sample_rate, channels, byte_rate, duration_ms) of a
   * canonical WAV payload — REAL audio metadata from pure hex/conv
   * arithmetic; duration = data-chunk bytes · 1000 / byte-rate. */
  def wavInfo(bin: Column): Column = {
    val channels = le16(bin, 23)
    val sampleRate = le32(bin, 25).cast(IntegerType)
    val byteRate = le32(bin, 29)
    val dataSize = le32(bin, 41)
    val ms = dataSize * 1000L
    val durationMs = ((ms - ms % byteRate) / byteRate).cast(LongType)
    when(isWav(bin) && byteRate > 0,
      struct(sampleRate.as("sample_rate"), channels.as("channels"),
        byteRate.cast(IntegerType).as("byte_rate"),
        durationMs.as("duration_ms")))
      .otherwise(lit(null).cast(
        "struct<sample_rate:int,channels:int,byte_rate:int,duration_ms:bigint>"))
  }

  /** Scala twin of [[wavInfo]]: Some((sampleRate, channels, durationMs)). */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Long)] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def le32i(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (ch, j) => u8(i + j) == ch.toInt }
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE") ||
        !tag(12, "fmt ") || !tag(36, "data")) return None
    val channels = u8(22) | (u8(23) << 8)
    val sampleRate = le32i(24)
    val byteRate = le32i(28)
    val dataSize = le32i(40)
    if (byteRate <= 0) None
    else Some((sampleRate.toInt, channels, dataSize * 1000L / byteRate))
  }

  /** struct(sample_rate, channels, bits_per_sample, total_samples,
   * duration_ms) from a FLAC STREAMINFO block ([[FlacInfo]]); null for
   * non-FLAC bytes. */
  def flacInfo(bin: Column): Column = {
    val arr = ColumnShim.column(FlacInfo(ColumnShim.expression(bin)))
    when(arr.isNotNull, struct(
      element_at(arr, 1).cast(IntegerType).as("sample_rate"),
      element_at(arr, 2).cast(IntegerType).as("channels"),
      element_at(arr, 3).cast(IntegerType).as("bits_per_sample"),
      element_at(arr, 4).as("total_samples"),
      element_at(arr, 5).as("duration_ms")))
      .otherwise(lit(null).cast(
        "struct<sample_rate:int,channels:int,bits_per_sample:int," +
          "total_samples:bigint,duration_ms:bigint>"))
  }

  /** struct(version_x10, bitrate_kbps, sample_rate, duration_ms) from
   * the first MPEG Layer-III frame header ([[Mp3Info]]; CBR duration
   * estimate over the remaining payload bytes); null for non-MP3
   * bytes or non-Layer-III frames. */
  def mp3Info(bin: Column): Column = {
    val arr = ColumnShim.column(Mp3Info(ColumnShim.expression(bin)))
    when(arr.isNotNull, struct(
      element_at(arr, 1).cast(IntegerType).as("version_x10"),
      element_at(arr, 2).cast(IntegerType).as("bitrate_kbps"),
      element_at(arr, 3).cast(IntegerType).as("sample_rate"),
      element_at(arr, 4).as("duration_ms")))
      .otherwise(lit(null).cast(
        "struct<version_x10:int,bitrate_kbps:int,sample_rate:int," +
          "duration_ms:bigint>"))
  }

  def isMp4(bin: Column): Column =
    octet_length(bin) >= 12 && hex(substring(bin, 5, 4)) === "66747970"

  /** struct(timescale, duration, duration_ms, n_frames) from an MP4
   * moov/mvhd box plus the first video trak's stts sample-count sum
   * (ISO BMFF box walk — [[Mp4Info]]); struct null for non-MP4 bytes or
   * files whose moov lies beyond the scanned payload; n_frames null when
   * the scanned bytes carry no video stts (audio-only, header-only). */
  def mp4Info(bin: Column): Column = {
    val arr = ColumnShim.column(Mp4Info(ColumnShim.expression(bin)))
    when(arr.isNotNull, struct(
      element_at(arr, 1).cast(IntegerType).as("timescale"),
      element_at(arr, 2).as("duration"),
      element_at(arr, 3).as("duration_ms"),
      when(element_at(arr, 4) >= 0, element_at(arr, 4)).as("n_frames")))
      .otherwise(lit(null).cast(
        "struct<timescale:int,duration:bigint,duration_ms:bigint," +
          "n_frames:bigint>"))
  }

  /** Scala-side twin of [[imageDims]] for the `mapPartitions` decode path
   * ([[Multimodal.extractFeatures]]): Some((format, width, height)) when
   * the payload is a recognizable PNG/JPEG/GIF. Same offsets, same scan. */
  def parseDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' &&
        u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
      Some(("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8 && u8(2) == 0xFF)
      JpegDims.scan(b).map { case (w, h) => ("jpeg", w, h) }
    else None
  }
}

/**
 * JPEG frame-header scan as one native expression over a BinaryType
 * column: walk the marker segments from SOI, skipping fill bytes and
 * standalone markers (RSTn/SOI/EOI/TEM), until a SOF marker (C0-CF
 * except the non-frame C4 DHT / C8 JPG / CC DAC), whose segment carries
 * precision(1), height(2 BE), width(2 BE) after the length. Returns
 * array<int> [width, height]; null for non-JPEG bytes, truncated input,
 * or corrupt segment structure. Stops at SOS/EOI — dimensions always
 * precede entropy-coded data, so the scan touches only header bytes
 * regardless of payload size.
 */
case class JpegDims(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "jpeg_dims"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegDims.scan(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h)) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(w, h))
      case None => null
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("marker")
      val len = ctx.freshName("len")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val done = ctx.freshName("done")
      s"""
         |int $w = -1; int $h = -1;
         |if ($b.length < 4 || ($b[0] & 0xFF) != 0xFF ||
         |    ($b[1] & 0xFF) != 0xD8) { ${ev.isNull} = true; }
         |else {
         |  int $i = 2; boolean $done = false;
         |  while (!$done && $i + 3 < $b.length) {
         |    if (($b[$i] & 0xFF) != 0xFF) { $done = true; break; }
         |    int $m = $b[$i + 1] & 0xFF;
         |    if ($m == 0xFF) { $i++; continue; }           // fill byte
         |    if ($m == 0x01 || ($m >= 0xD0 && $m <= 0xD9)) { $i += 2; continue; }
         |    int $len = (($b[$i + 2] & 0xFF) << 8) | ($b[$i + 3] & 0xFF);
         |    if ($len < 2) { $done = true; break; }
         |    if ($m >= 0xC0 && $m <= 0xCF && $m != 0xC4 && $m != 0xC8 &&
         |        $m != 0xCC) {
         |      if ($i + 8 < $b.length) {
         |        $h = (($b[$i + 5] & 0xFF) << 8) | ($b[$i + 6] & 0xFF);
         |        $w = (($b[$i + 7] & 0xFF) << 8) | ($b[$i + 8] & 0xFF);
         |      }
         |      $done = true; break;
         |    }
         |    if ($m == 0xDA) { $done = true; break; }      // SOS: give up
         |    $i += 2 + $len;
         |  }
         |  if ($w < 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      new int[] { $w, $h }); }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

/**
 * MP4 (ISO BMFF) movie-header scan as one native expression over a
 * BinaryType column: walk the top-level boxes ([u32 size][4cc type],
 * size 1 = 64-bit extended, size 0 = to-EOF) to `moov`, then its
 * children to `mvhd`, and read (timescale, duration) — version 0's
 * u32 pair or version 1's u32/u64. Returns array<long>
 * [timescale, duration, duration_ms]; null when the payload is not MP4
 * or `moov` is not within the scanned bytes (mdat-first files whose
 * moov trails the payload window — callers that need those fetch the
 * tail). One static method backs both eval and the generated code.
 */
case class Mp4Info(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "mp4_info"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = Mp4Info.scan(input.asInstanceOf[Array[Byte]])
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.multimodal.Mp4Info.scan($b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4Info =
    copy(child = newChild)
}

object Mp4Info {
  /** Returns [timescale, duration, duration_ms, n_frames] — n_frames is
   * the sample-count sum of the FIRST video track's `stts` box
   * (moov → trak → mdia → {hdlr=='vide', minf → stbl → stts}), or -1
   * when the payload carries no video stts within the scanned bytes
   * (audio-only MP4s, header-only payload windows). A malformed trak
   * degrades to n_frames=-1 rather than nulling the mvhd fields. */
  def scan(b: Array[Byte]): Array[Long] = {
    @inline def u8(i: Long): Int = b(i.toInt) & 0xFF
    @inline def u32(i: Long): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    @inline def cc(i: Long, t: String): Boolean =
      u8(i) == t.charAt(0) && u8(i + 1) == t.charAt(1) &&
        u8(i + 2) == t.charAt(2) && u8(i + 3) == t.charAt(3)
    @inline def typeIs(i: Long, t: String): Boolean = cc(i + 4, t)
    val len = b.length.toLong
    if (len < 12 || !typeIs(0, "ftyp")) return null

    // (size, headerLen) of the box at i; null-marker (-1) on corruption
    def boxAt(i: Long): (Long, Long) = {
      val sz0 = u32(i)
      if (sz0 == 1) {
        if (i + 16 > len) return (-1L, 0L)
        (u64(i + 8), 16L)
      } else if (sz0 == 0) (len - i, 8L)
      else (sz0, 8L)
    }

    // first child box of type `t` in [start, end); -1 if absent/corrupt
    def findBox(start: Long, end: Long, t: String): Long = {
      var k = start
      while (k + 8 <= end) {
        val (s2, h2) = boxAt(k)
        if (s2 < h2) return -1L
        if (typeIs(k, t)) return k
        k += s2
      }
      -1L
    }

    // sample-count sum from a video trak, or -1
    def trakFrames(trak: Long, trakEnd: Long): Long = {
      val (tsz, th) = boxAt(trak)
      if (tsz < th) return -1L
      val mdia = findBox(trak + th, trakEnd, "mdia")
      if (mdia < 0) return -1L
      val (msz, mh) = boxAt(mdia)
      val mEnd = math.min(mdia + msz, len)
      // hdlr payload: version/flags(4) + pre_defined(4) + handler_type(4)
      val hdlr = findBox(mdia + mh, mEnd, "hdlr")
      if (hdlr < 0) return -1L
      val (_, hh) = boxAt(hdlr)
      if (hdlr + hh + 12 > len || !cc(hdlr + hh + 8, "vide")) return -1L
      val minf = findBox(mdia + mh, mEnd, "minf")
      if (minf < 0) return -1L
      val (nsz, nh) = boxAt(minf)
      val stbl = findBox(minf + nh, math.min(minf + nsz, len), "stbl")
      if (stbl < 0) return -1L
      val (ssz, sh) = boxAt(stbl)
      val stts = findBox(stbl + sh, math.min(stbl + ssz, len), "stts")
      if (stts < 0) return -1L
      val (xsz, xh) = boxAt(stts)
      val p = stts + xh // version/flags(4) + entry_count(4) + entries(8 ea)
      if (p + 8 > len) return -1L
      val entries = u32(p + 4)
      if (p + 8 + entries * 8 > math.min(stts + xsz, len)) return -1L
      var total = 0L
      var k = 0L
      while (k < entries) { total += u32(p + 8 + k * 8); k += 1 }
      total
    }

    var i = 0L
    while (i + 8 <= len) {
      val (sz, hdr) = boxAt(i)
      if (sz < hdr) return null
      if (typeIs(i, "moov")) {
        var j = i + hdr
        val end = math.min(i + sz, len)
        var mvhd: Array[Long] = null
        var frames = -1L
        while (j + 8 <= end) {
          val (csz, chdr) = boxAt(j)
          if (csz < chdr) return null
          if (typeIs(j, "mvhd") && mvhd == null) {
            val p = j + chdr
            if (p + 20 > len) return null
            val ver = u8(p)
            val (ts, dur) =
              if (ver == 1) {
                if (p + 32 > len) return null
                (u32(p + 20), u64(p + 24))
              } else (u32(p + 12), u32(p + 16))
            if (ts <= 0) return null
            mvhd = Array(ts, dur, dur * 1000L / ts)
          }
          if (typeIs(j, "trak") && frames < 0)
            frames = trakFrames(j, math.min(j + csz, len))
          j += csz
        }
        return if (mvhd == null) null
        else Array(mvhd(0), mvhd(1), mvhd(2), frames)
      }
      i += sz
    }
    null
  }
}

object JpegDims {
  /** The interpreter-mode scan; semantics identical to the generated code. */
  def scan(b: Array[Byte]): Option[(Int, Int)] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(i) != 0xFF) return None
      val m = u8(i + 1)
      if (m == 0xFF) { i += 1 }                         // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) { i += 2 }
      else {
        val len = (u8(i + 2) << 8) | u8(i + 3)
        if (len < 2) return None
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          return if (i + 8 < b.length)
            Some(((u8(i + 7) << 8) | u8(i + 8), (u8(i + 5) << 8) | u8(i + 6)))
          else None
        }
        if (m == 0xDA) return None                      // SOS before SOF
        i += 2 + len
      }
    }
    None
  }
}

/**
 * FLAC STREAMINFO scan as one native expression over BinaryType: "fLaC"
 * magic, then metadata blocks ([1B last-flag(1)+type(7)][3B length]);
 * STREAMINFO (type 0) carries min/max blocksize (2B each), min/max
 * framesize (3B each), then 8 packed bytes: sample rate (20 bits),
 * channels-1 (3), bits-per-sample-1 (5), total samples (36).
 * Returns array<long> [sample_rate, channels, bits_per_sample,
 * total_samples, duration_ms]; null for non-FLAC or truncated bytes.
 * One static method backs both eval and the generated code.
 */
case class FlacInfo(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "flac_info"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = FlacInfo.scan(input.asInstanceOf[Array[Byte]])
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.multimodal.FlacInfo.scan($b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacInfo =
    copy(child = newChild)
}

object FlacInfo {
  def scan(b: Array[Byte]): Array[Long] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    if (b.length < 8 || u8(0) != 'f' || u8(1) != 'L' || u8(2) != 'a' ||
        u8(3) != 'C') return null
    var i = 4
    while (i + 4 <= b.length) {
      val blockType = u8(i) & 0x7F
      val last = (u8(i) & 0x80) != 0
      val len = (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      if (blockType == 0) { // STREAMINFO
        val p = i + 4
        if (len < 34 || p + 18 > b.length) return null
        // packed 8 bytes start at p+10: rate(20) ch-1(3) bps-1(5) total(36)
        val rate = (u8(p + 10).toLong << 12) | (u8(p + 11) << 4) |
          (u8(p + 12) >> 4)
        val ch = ((u8(p + 12) >> 1) & 0x7) + 1L
        val bps = (((u8(p + 12) & 0x1) << 4) | (u8(p + 13) >> 4)) + 1L
        val total = ((u8(p + 13) & 0xFL) << 32) | (u8(p + 14).toLong << 24) |
          (u8(p + 15).toLong << 16) | (u8(p + 16).toLong << 8) | u8(p + 17)
        if (rate <= 0) return null
        return Array(rate, ch, bps, total, total * 1000L / rate)
      }
      if (last) return null
      i += 4 + len
    }
    null
  }
}

/**
 * First MPEG Layer-III frame header over BinaryType (ID3v2 tags skipped
 * via their syncsafe size): 11-bit sync, version (2 bits: MPEG 1 / 2 /
 * 2.5), layer (2 bits — only Layer III decoded, the dominant real-world
 * case; I/II return null, documented), bitrate index and sample-rate
 * index from the published tables. Duration is the CBR estimate over
 * the payload bytes after the tag: bytes*8/bitrate. Returns array<long>
 * [version_x10 (10|20|25), bitrate_kbps, sample_rate, duration_ms].
 */
case class Mp3Info(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "mp3_info"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = Mp3Info.scan(input.asInstanceOf[Array[Byte]])
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = graft.multimodal.Mp3Info.scan($b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp3Info =
    copy(child = newChild)
}

object Mp3Info {
  // Layer III bitrate tables (kbps), index 1..14; 0 = free, 15 = bad
  private val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320)
  private val brV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 144, 160)
  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  def scan(b: Array[Byte]): Array[Long] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    if (b.length < 4) return null
    var off = 0
    // ID3v2: "ID3" + version(2) + flags(1) + 4-byte syncsafe size
    if (b.length >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3') {
      val sz = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      off = 10 + sz
    }
    if (off + 4 > b.length) return null
    val h0 = u8(off); val h1 = u8(off + 1)
    if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) return null
    val verBits = (h1 >> 3) & 0x3   // 0=2.5, 2=2, 3=1 (1 reserved)
    val layerBits = (h1 >> 1) & 0x3 // 1 = Layer III
    if (verBits == 1 || layerBits != 1) return null
    val brIdx = (u8(off + 2) >> 4) & 0xF
    val srIdx = (u8(off + 2) >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val (ver, br, sr) = verBits match {
      case 3 => (10L, brV1(brIdx), srV1(srIdx))
      case 2 => (20L, brV2(brIdx), srV2(srIdx))
      case _ => (25L, brV2(brIdx), srV25(srIdx))
    }
    // VBR duration beats the CBR estimate when a frame count is present:
    // Xing/Info sits after the first frame's side info (MPEG1: 32/17
    // bytes stereo/mono; MPEG2/2.5: 17/9), VBRI at the fixed offset 36
    // (Fraunhofer). frames * samples-per-frame / rate is the real
    // length; the first-frame-bitrate estimate can be off by 2x+ on
    // VBR files.
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    @inline def tag(i: Int, t: String): Boolean =
      i + t.length <= b.length &&
        t.indices.forall(k => u8(i + k) == t.charAt(k))
    val mono = ((u8(off + 3) >> 6) & 3) == 3
    val side = verBits match {
      case 3 => if (mono) 17 else 32
      case _ => if (mono) 9 else 17
    }
    val samplesPerFrame = if (verBits == 3) 1152L else 576L
    val xo = off + 4 + side
    var vbrFrames = -1L
    if ((tag(xo, "Xing") || tag(xo, "Info")) && xo + 8 <= b.length &&
      (be32(xo + 4) & 1L) != 0 && xo + 12 <= b.length)
      vbrFrames = be32(xo + 8)
    val vo = off + 36
    if (vbrFrames < 0 && tag(vo, "VBRI") && vo + 18 <= b.length)
      vbrFrames = be32(vo + 14)
    val payloadBytes = (b.length - off).toLong
    val durMs =
      if (vbrFrames >= 0) vbrFrames * samplesPerFrame * 1000L / sr
      else payloadBytes * 8L / br
    Array(ver, br.toLong, sr.toLong, durMs)
  }
}
