package graft.data

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.Dataset

/**
 * WARC (Web ARChive, ISO 28500) record ingest — the format web-scale
 * training corpora actually arrive in (Common Crawl ships ~100 TB/crawl
 * of `.warc.gz`). A shard payload is either plain concatenated WARC
 * records or concatenated per-record gzip members (the Common Crawl
 * layout); [[Warc.parse]] inflates (JDK Inflater via GZIPInputStream —
 * multi-member streams are handled natively), walks records by their
 * `Content-Length`, and for `response` records parses the enclosed HTTP
 * message (status line, Content-Type, body) — emitting one typed row
 * per record with the body's sha256 (the repo-wide content invariant).
 *
 * Scale design: shards parse independently inside `mapPartitions` (the
 * [[records]] operator) — no shared state, no shuffle; a 100-TB crawl
 * is embarrassingly parallel over shard files. Malformed bytes stop the
 * shard's walk at the last well-formed record (partial shards surface
 * as short counts, never exceptions — ingest must not die on one bad
 * shard).
 *
 * Reference anchor: pydantic's typed-model view of untrusted wire data
 * (networks/HTTP types); here the "model" is the WARC+HTTP envelope
 * validated structurally at ingest.
 */
object Warc {

  /** One parsed WARC record (http_* fields are -1/null for non-response
   * records; body_sha256 covers the HTTP payload for responses, the raw
   * record block otherwise). */
  final case class WarcRecord(
      shard_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      http_status: Int,
      content_type: String,
      body_len: Long,
      body_sha256: String,
      compressed: Boolean)

  /** A response record WITH its decoded (UTF-8) HTTP payload — the
   * shape the page pipeline consumes (w_pipeline: WARC -> HTML text ->
   * dedup). Non-response records never carry bodies downstream. */
  final case class WarcPage(
      shard_id: Long,
      rec_idx: Int,
      target_uri: String,
      http_status: Int,
      content_type: String,
      body: String)

  private final val MaxRecords = 1 << 20 // per-shard walk bound

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 8192)
    val out = new ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      // a truncated/corrupt tail member keeps everything inflated so far
      case _: EOFException | _: java.util.zip.ZipException =>
    }
    out.toByteArray
  }

  /** ASCII line starting at `p` up to CRLF; returns (line, nextPos) or
   * null when no CRLF is found in bounds. */
  private def line(b: Array[Byte], p: Int): (String, Int) = {
    var i = p
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) null
    else (new String(b, p, i - p, java.nio.charset.StandardCharsets.ISO_8859_1),
      i + 2)
  }

  /** Parse one shard's bytes into records (see class doc). */
  def parse(shardId: Long, payload: Array[Byte]): Seq[WarcRecord] =
    walk(shardId, payload, null)

  /** Parse one shard's bytes into response pages, HTTP payloads decoded
   * as UTF-8 (see [[WarcPage]]). */
  def parsePages(shardId: Long, payload: Array[Byte]): Seq[WarcPage] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[WarcPage]
    walk(shardId, payload, pages)
    pages.toSeq
  }

  /** The single record walk backing [[parse]] and [[parsePages]]; when
   * `pages` is non-null, response records also append there with their
   * decoded payload. */
  private def walk(shardId: Long, payload: Array[Byte],
      pages: scala.collection.mutable.ArrayBuffer[WarcPage])
  : Seq[WarcRecord] = {
    if (payload == null || payload.length < 4) return Nil
    val compressed = (payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B
    val b = if (compressed) gunzip(payload) else payload
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    var p = 0
    var idx = 0
    while (p < b.length && idx < MaxRecords) {
      val v = line(b, p)
      if (v == null || !v._1.startsWith("WARC/")) return out.toSeq
      p = v._2
      // WARC named fields until the empty line
      var warcType: String = null; var uri: String = null
      var clen = -1L
      var l = line(b, p)
      while (l != null && l._1.nonEmpty) {
        val s = l._1; val c = s.indexOf(':')
        if (c > 0) {
          val k = s.substring(0, c).trim.toLowerCase
          val value = s.substring(c + 1).trim
          k match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              clen = try value.toLong catch { case _: Exception => -1L }
            case _ =>
          }
        }
        p = l._2; l = line(b, p)
      }
      if (l == null || clen < 0 || p + 2 + clen > b.length) return out.toSeq
      p = l._2 // past the empty line
      val bodyStart = p
      val bodyEnd = p + clen.toInt
      // HTTP message inside response records
      var status = -1; var ctype: String = null
      var payloadStart = bodyStart; var payloadEnd = bodyEnd
      if (warcType == "response" && clen >= 12 &&
        new String(b, bodyStart, 5,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "HTTP/") {
        val st = line(b, bodyStart)
        if (st != null && st._2 <= bodyEnd) {
          val parts = st._1.split(" ", 3)
          if (parts.length >= 2)
            status = try parts(1).toInt catch { case _: Exception => -1 }
          var q = st._2
          var hl = line(b, q)
          while (hl != null && hl._1.nonEmpty && hl._2 <= bodyEnd) {
            val s = hl._1; val c = s.indexOf(':')
            if (c > 0 && s.substring(0, c).trim.equalsIgnoreCase(
              "content-type")) ctype = s.substring(c + 1).trim
            q = hl._2; hl = line(b, q)
          }
          if (hl != null && hl._1.isEmpty && hl._2 <= bodyEnd)
            payloadStart = hl._2
        }
      }
      sha.reset()
      sha.update(b, payloadStart, payloadEnd - payloadStart)
      val digest = sha.digest().map("%02x".format(_)).mkString
      out += WarcRecord(shardId, idx, warcType, uri, clen, status, ctype,
        (payloadEnd - payloadStart).toLong, digest, compressed)
      if (pages != null && warcType == "response")
        pages += WarcPage(shardId, idx, uri, status, ctype,
          new String(b, payloadStart, payloadEnd - payloadStart,
            java.nio.charset.StandardCharsets.UTF_8))
      idx += 1
      // records are delimited by two CRLFs after the block
      p = bodyEnd
      if (p + 4 <= b.length && b(p) == '\r' && b(p + 1) == '\n' &&
        b(p + 2) == '\r' && b(p + 3) == '\n') p += 4
      else if (p != b.length) return out.toSeq
    }
    out.toSeq
  }

  /** Distributed shard → record explosion: one independent parse per
   * shard row inside mapPartitions, no shuffle. */
  def records(ds: Dataset[(Long, Array[Byte])]): Dataset[WarcRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) => parse(id, bytes) })
  }

  /** Distributed shard → response-page explosion with decoded payloads
   * (the w_pipeline front): same zero-shuffle mapPartitions shape. */
  def pages(ds: Dataset[(Long, Array[Byte])]): Dataset[WarcPage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) => parsePages(id, bytes) })
  }
}
