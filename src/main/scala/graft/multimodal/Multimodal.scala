package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video as opaque `binary` columns with
 * typed metadata, processed in partition-sized batches.
 *
 * No reference analog (pydantic validates no media); this is the
 * training-data-pipeline extension from the build brief. The Spark-side
 * plumbing — schema, batch shape, partition processing, metadata extraction
 * — is real and tested; the actual codec calls are STUBBED behind
 * [[Codecs]] with deterministic fakes (no image/audio libraries in this
 * container). On a real cluster, swap the Codecs implementation; nothing
 * else changes.
 *
 * Scale design: decode/feature-extract are per-partition batch loops
 * (`mapPartitions` over a typed Dataset — the Scala analog of Python's
 * `mapInPandas`), so codec state is initialized once per partition, not
 * per row. Metadata checks that don't need decoding (magic bytes, sizes)
 * are pure Column expressions and stay in whole-stage codegen.
 */
object Multimodal {

  /** A media row: opaque payload + declared kind + source metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      meta: Map[String, String])

  /** Decoded features, fixed schema regardless of modality. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_size: Long,
      sha256: String,
      width: Int,              // image/video; -1 otherwise
      height: Int,
      duration_ms: Long,       // audio/video; -1 otherwise
      frame_count: Int,        // video; -1 otherwise
      embedding: Array[Float]) // modality-agnostic feature vector

  /**
   * Codec boundary — the ONLY stubbed layer. Deterministic fakes derive
   * every "decoded" property from the payload bytes, so tests are stable
   * and the pipeline shape is exercised end-to-end.
   */
  object Codecs {
    private def h(payload: Array[Byte], salt: Int): Long = {
      // FNV-1a over payload + salt: deterministic, cheap, no deps
      var x = 0xcbf29ce484222325L ^ salt.toLong
      var i = 0
      while (i < payload.length) { x = (x ^ payload(i)) * 0x100000001b3L; i += 1 }
      x
    }

    /** STUB: real impl = javax.imageio / ffmpeg bindings. */
    def decodeImage(payload: Array[Byte]): (Int, Int) = {
      val a = h(payload, 1)
      (64 + (Math.floorMod(a, 1024L)).toInt,
        64 + (Math.floorMod(a >> 10, 1024L)).toInt)
    }

    /** STUB: real impl = audio codec; returns duration ms. */
    def decodeAudio(payload: Array[Byte]): Long =
      1000L + Math.floorMod(h(payload, 2), 600000L)

    /** STUB: real impl = container demuxer; (durationMs, frameCount). */
    def decodeVideo(payload: Array[Byte]): (Long, Int) = {
      val d = 1000L + Math.floorMod(h(payload, 3), 3600000L)
      (d, (d / 40L).toInt) // ~25 fps
    }

    /** STUB feature extractor: 8-dim deterministic pseudo-embedding. */
    def embed(payload: Array[Byte]): Array[Float] =
      (0 until 8).map { i =>
        (Math.floorMod(h(payload, 16 + i), 2001L) - 1000L).toFloat / 1000f
      }.toArray
  }

  /** Cheap metadata checks as pure Column expressions (no decode, stays in
   * codegen): payload size, sha256, magic-byte sniffing. */
  def byteSize(payload: Column): Column = octet_length(payload)
  def payloadSha(payload: Column): Column = sha2(payload, 256)

  /** Magic-byte kind sniff: first bytes vs known signatures (PNG/JPEG/RIFF
   * here; extend freely). Pure expression — hex(substring(bin)). */
  def sniffKind(payload: Column): Column = {
    val magic8 = upper(hex(substring(payload, 1, 4)))
    when(magic8.startsWith("89504E47"), "image")      // PNG
      .when(magic8.startsWith("FFD8FF"), "image")     // JPEG
      .when(magic8.startsWith("47494638"), "image")   // GIF8?a
      .when(magic8.startsWith("424D"), "image")       // BMP
      .when(magic8.startsWith("5036") ||
        magic8.startsWith("5035"), "image")           // PPM P6 / PGM P5
      .when(magic8.startsWith("49492A00") ||
        magic8 === "4D4D002A", "image")               // TIFF II/MM
      .when(magic8 === "00000100", "image")           // ICO
      .when(magic8.startsWith("52494646"), "audio")   // RIFF/WAV
      .when(magic8.startsWith("664C6143"), "audio")   // fLaC
      .when(magic8.startsWith("494433"), "audio")     // ID3v2 (MP3)
      .when(magic8.startsWith("FFFB") ||
        magic8.startsWith("FFFA"), "audio")           // bare MP3 frame
      .when(magic8 === "4F676753", "audio")           // OggS
      .when(magic8.startsWith("00000018") ||
        magic8.startsWith("66747970"), "video")       // MP4-ish
      .otherwise("unknown")
  }

  /** Kind-vs-magic consistency violations (validates declared `kind`
   * against sniffed bytes) — a pydantic-style constraint on binary data. */
  def kindMismatch(df: DataFrame): DataFrame =
    df.withColumn("sniffed", sniffKind(col("payload")))
      .filter(col("sniffed") =!= "unknown" && col("sniffed") =!= col("kind"))
      .select(col("media_id"), col("kind"), col("sniffed"))

  /**
   * Batch decode + feature extraction: one partition = one batch, codecs
   * initialized once per partition (the `mapPartitions` iterator is the
   * batch boundary; rows stream through without materializing the whole
   * partition). Returns the fixed MediaFeatures schema.
   */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec init would happen here (once, not per row)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        sha.reset()
        val digest = sha.digest(r.payload).map("%02x".format(_)).mkString
        // REAL header decode first (PNG/JPEG/GIF dimensions need no codec
        // library — MediaHeaders); the deterministic stub only covers
        // payloads in formats the container cannot parse
        val (w, hgt) = r.kind match {
          case "image" | "video" =>
            MediaHeaders.parseDims(r.payload)
              .map { case (_, pw, ph) => (pw, ph) }
              .orElse(MediaExtra.parseMoreDims(r.payload))
              .getOrElse(Codecs.decodeImage(r.payload))
          case _ => (-1, -1)
        }
        // decode once per row — duration and frame count come from the
        // same demux call (round 1 decoded videos twice)
        val (dur, frames) = r.kind match {
          case "audio" =>
            // WAV, FLAC STREAMINFO and MP3 frame headers decode for real
            // (MediaHeaders); other audio formats fall back to the stub
            (MediaHeaders.parseWav(r.payload).map(_._3)
              .orElse(Option(FlacInfo.scan(r.payload)).map(_(4)))
              .orElse(Option(Mp3Info.scan(r.payload)).map(_(3)))
              .orElse(Option(OggDuration.scan(r.payload)).map(_(3)))
              .getOrElse(Codecs.decodeAudio(r.payload)), -1)
          case "video" =>
            // canonical MP4 moov/mvhd + video-trak stts decode for real;
            // only when the header scan yields no frame count (no stts in
            // the payload window) does the stub demux run — and then
            // exactly once, destructured for both fields
            Mp4Info.scan(r.payload) match {
              case a if a != null && a(3) >= 0 => (a(2), a(3).toInt)
              case a if a != null =>
                val (_, stubFrames) = Codecs.decodeVideo(r.payload)
                (a(2), stubFrames)
              case _ => Codecs.decodeVideo(r.payload)
            }
          case _ => (-1L, -1)
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, digest,
          w, hgt, dur, frames, Codecs.embed(r.payload))
      }
    }
  }

  /** Frame sampling plan for videos: every `everyMs` ms up to `maxFrames`
   * offsets — emitted as (media_id, frame_idx, offset_ms) rows the decode
   * stage consumes. Pure expressions: sequence + explode, no UDF. */
  def frameSamplePlan(features: Dataset[MediaFeatures], everyMs: Long,
                      maxFrames: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"),
        posexplode(slice(sequence(lit(0L), col("duration_ms"), lit(everyMs)),
          1, maxFrames)).as(Seq("frame_idx", "offset_ms")))

  /** Deterministic synthetic media table for tests/benchmarks. */
  def synthetic(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(n).map { id =>
      val kind = kinds((id % 3).toInt)
      val len = 64 + (id * 2654435761L % 4096).toInt.abs
      val payload = Array.tabulate[Byte](len)(i =>
        ((id * 31 + i * 7) % 251).toByte)
      MediaRow(id, kind, payload, Map("src" -> s"bucket/${id % 10}"))
    }
  }
}
