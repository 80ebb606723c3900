package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * REAL video sample-data decode — AVI (RIFF) container demux + MJPEG
 * frame decode. MJPEG is a genuine video codec (every frame is an
 * independent baseline JPEG — the format DV cameras, webcams, and
 * capture cards emit), and AVI is its canonical container, so this is
 * the video path that IS decodable from published specifications alone
 * (the transform codecs H.264/VP9/AV1 genuinely need codec libraries
 * and stay stubbed): the scan walks the RIFF chunk tree (`LIST hdrl` /
 * `avih` for stream geometry and timing, `LIST movi` for the sample
 * data), runs the full native baseline-JPEG pipeline
 * ([[JpegPixelStats]]: Huffman + dequant + exact IDCT) over every
 * `##dc`/`##db` video chunk, and aggregates per-frame pixel moments —
 * actual decoded video CONTENT, not just header metadata.
 *
 * Reference anchor: pydantic models media as opaque bytes + typed
 * metadata; this supplies decoded per-payload video statistics at
 * 100-TB scan scale. Same discipline as every media scan: one static
 * `scan` feeds both eval and codegen.
 */
case class AviMjpegStats(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "avi_mjpeg_stats"
  override protected def staticScan: String =
    "graft.multimodal.AviMjpegStats.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    AviMjpegStats.scan(b)
  override protected def withNewChildInternal(
      newChild: Expression): AviMjpegStats = copy(child = newChild)
}

/** Per-frame AVI/MJPEG means (see [[AviFrameMeans.scan]]). */
case class AviFrameMeans(child: Expression) extends MediaScanExpr {
  override def prettyName: String = "avi_frame_means"
  override protected def staticScan: String =
    "graft.multimodal.AviFrameMeans.scan"
  override protected def scanImpl(b: Array[Byte]): Array[Long] =
    AviFrameMeans.scan(b)
  override protected def withNewChildInternal(
      newChild: Expression): AviFrameMeans = copy(child = newChild)
}

object AviFrameMeans {
  private final val MaxFrames = 4096 // per-payload frame bound

  /** [n_frames, then per decoded frame in stream order:
   * sum_r, sum_g, sum_b, n_px] — the PER-FRAME channel sums the
   * temporal operators (shot-boundary detection, frame near-dup)
   * consume, from the same RIFF demux + native JPEG pipeline as
   * [[AviMjpegStats.scan]]. Non-JPEG sample chunks are skipped;
   * payloads with more than 4096 decodable frames, non-AVI bytes, or
   * truncated chunk structure return null (the bound keeps the array
   * row-sized — at real scale, longer streams go through the
   * frame-sample planner first). */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 64) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def tag(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return null
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
    var bad = false
    // ordered recursive descent: per-frame output must preserve STREAM
    // order even when frames sit inside nested `rec ` grouping lists
    // (the aggregate scan's LIFO stack walk would reorder them); real
    // RIFF nests <= 3 deep, the bound guards hostile bytes
    def walk(s0: Int, e0: Int, depth: Int): Unit = {
      if (depth > 8) { bad = true; return }
      var i = s0
      while (!bad && i + 8 <= e0) {
        val len = le32(i + 4)
        if (len < 0 || i + 8 + len > e0) { bad = true; return }
        val body = i + 8
        if (tag(i, "LIST")) {
          if (len >= 4) walk(body + 4, body + len.toInt, depth + 1)
        } else if (len >= 2 && u8(i) >= '0' && u8(i) <= '9' &&
          u8(i + 1) >= '0' && u8(i + 1) <= '9' &&
          (tag(i + 2, "dc") || tag(i + 2, "db"))) {
          if (u8(body) == 0xFF && u8(body + 1) == 0xD8) {
            val fb = java.util.Arrays.copyOfRange(b, body, body + len.toInt)
            val px = JpegPixelStats.scan(fb)
            if (px != null) {
              if (acc.length >= 4L * MaxFrames) { bad = true; return }
              acc += px(2); acc += px(3); acc += px(4); acc += px(5)
            }
          }
        }
        i = body + len.toInt + (len.toInt & 1)
      }
    }
    walk(12, b.length, 0)
    if (bad) null else Array(acc.length / 4L) ++ acc
  }
}

object AviMjpegStats {
  private final val MaxFrames = 1 << 16 // demux bound per payload

  /** [width, height, us_per_frame, total_frames_hdr, n_frames_decoded,
   * sum_r, sum_g, sum_b, n_px, min_ch, max_ch, sq_r, sq_g, sq_b,
   * duration_ms] — REAL AVI/MJPEG decode. width/height/us_per_frame/
   * total_frames come from the `avih` main header; every video sample
   * chunk (`##dc`/`##db`) whose payload is a baseline JPEG is decoded
   * by the full native pipeline and its channel sums/min/max/second
   * moments accumulate across frames (n_px = total decoded pixels over
   * all frames). Non-JPEG sample chunks are skipped (counted neither
   * decoded nor fatal — a real MJPEG stream may interleave audio
   * `##wb` chunks). min_ch/max_ch are -1 when no frame decoded.
   * duration_ms = total_frames * us_per_frame / 1000 (integer floor).
   * Null for non-AVI payloads, truncated chunk structure, or a missing
   * avih header. */
  def scan(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 64) return null
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def tag(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return null
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    var usPerFrame = -1L; var totalFrames = -1L
    var width = -1L; var height = -1L
    var nDec = 0L; var sumR = 0L; var sumG = 0L; var sumB = 0L
    var nPx = 0L; var minCh = 256L; var maxCh = -1L
    var sqR = 0L; var sqG = 0L; var sqB = 0L
    var frames = 0
    // iterative chunk walk with an explicit stack (LIST bodies nest);
    // each entry is (start, end) of a chunk sequence to walk
    var stack = List((12, b.length))
    while (stack.nonEmpty) {
      val (s0, e0) = stack.head
      stack = stack.tail
      var i = s0
      var ok = true
      while (ok && i + 8 <= e0) {
        val len = le32(i + 4)
        if (len < 0 || i + 8 + len > e0) return null // truncated chunk
        val body = i + 8
        if (tag(i, "LIST")) {
          if (len >= 4) stack = (body + 4, body + len.toInt) :: stack
        } else if (tag(i, "avih") && len >= 40) {
          usPerFrame = le32(body); totalFrames = le32(body + 16)
          width = le32(body + 32); height = le32(body + 36)
        } else if (len >= 2 && u8(i) >= '0' && u8(i) <= '9' &&
          u8(i + 1) >= '0' && u8(i + 1) <= '9' &&
          (tag(i + 2, "dc") || tag(i + 2, "db"))) {
          frames += 1
          if (frames > MaxFrames) return null
          if (len >= 2 && u8(body) == 0xFF && u8(body + 1) == 0xD8) {
            val fb = java.util.Arrays.copyOfRange(b, body, body + len.toInt)
            val px = JpegPixelStats.scan(fb)
            if (px != null) {
              nDec += 1
              sumR += px(2); sumG += px(3); sumB += px(4); nPx += px(5)
              if (px(6) < minCh) minCh = px(6)
              if (px(7) > maxCh) maxCh = px(7)
              sqR += px(8); sqG += px(9); sqB += px(10)
            }
          }
        }
        i = body + len.toInt + (len.toInt & 1) // RIFF even-byte padding
      }
    }
    if (usPerFrame < 0 || width <= 0 || height <= 0) return null
    val durMs =
      if (usPerFrame > 0 && totalFrames > 0) totalFrames * usPerFrame / 1000L
      else 0L
    Array(width, height, usPerFrame, totalFrames, nDec, sumR, sumG, sumB,
      nPx, if (nDec > 0) minCh else -1L, if (nDec > 0) maxCh else -1L,
      sqR, sqG, sqB, durMs)
  }
}
