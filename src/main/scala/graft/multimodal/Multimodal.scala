package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video as opaque `binary` columns with
 * typed metadata, processed in partition-sized batches.
 *
 * No reference analog (pydantic validates no media); this is the
 * training-data-pipeline extension from the build brief. The Spark-side
 * plumbing — schema, batch shape, partition processing, metadata
 * extraction — is real and tested. Decode is REAL wherever the format is
 * parseable without a codec library: dimensions for
 * PNG/JPEG/GIF/BMP/PPM/TIFF/ICO, durations for WAV/FLAC/MP3/OGG/MP4,
 * full pixel decode for BMP/PPM/PNG/GIF/baseline-JPEG, full sample
 * decode for WAV-PCM/FLAC plus the LOSSY codecs G.711 mu-law/A-law and
 * IMA ADPCM (MediaHeaders/MediaExtra/MediaLossy), full video
 * sample-data decode for AVI/MJPEG (MediaVideo: RIFF demux + per-frame
 * JPEG pipeline), and the content embedding ([[ContentEmbed]]) is
 * computed from those REAL decoded pixels/samples/frames — a classical
 * color-moment / waveform-statistics descriptor. Only payloads NO
 * native parser can decode (transform-codec audio: MP3/Vorbis/Opus;
 * transform-codec video: H.26x/VP9/AV1 sample data; unknown byte
 * formats) fall back to the deterministic fakes in [[Codecs]]. On a
 * real cluster, swap Codecs for codec-library bindings; nothing else
 * changes.
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
   * REAL content embeddings from the native decoders — the classical
   * pre-neural descriptors: color moments for images (mean and sigma per
   * RGB channel — Stricker & Orengo, "Similarity of Color Images", 1995)
   * and waveform statistics for audio (mean-abs/RMS/peak/ZCR/clip —
   * Wold et al., "Content-Based Classification, Search, and Retrieval of
   * Audio", IEEE MultiMedia 1996). Every component is derived from
   * ACTUALLY DECODED pixels/samples (the [[MediaExtra]] scans), using
   * only +,-,*,/ and sqrt on IEEE doubles with one final float32
   * rounding — all correctly-rounded operations, so an independent
   * engine (the DuckDB oracle) replays each component bit-exactly from
   * the integer moment slots.
   */
  object ContentEmbed {
    /** Moment slots for any image format with a native pixel decoder
     * (BMP/PPM/PNG/GIF/baseline-JPEG), dispatched by magic bytes; null
     * when no real decode is possible. Slots: see [[BmpPixelStats]]. */
    def imageMoments(b: Array[Byte]): Array[Long] = {
      if (b == null || b.length < 2) return null
      val m0 = b(0) & 0xFF; val m1 = b(1) & 0xFF
      if (m0 == 'B' && m1 == 'M') BmpPixelStats.scan(b)
      else if (m0 == 'P' && m1 == '6') PpmInfo.scan(b)
      else if (m0 == 0x89) PngPixelStats.scan(b)
      else if (m0 == 'G' && m1 == 'I') GifPixelStats.scan(b)
      else if (m0 == 0xFF && m1 == 0xD8) JpegPixelStats.scan(b)
      else null
    }

    /** Sample-statistic slots for any audio format with a native sample
     * decoder (WAV-PCM s16, FLAC, and the REAL lossy decodes: G.711
     * mu-law/A-law and IMA ADPCM); null otherwise (the transform codecs
     * MP3/Vorbis/Opus need a real codec library). Slots: see
     * [[WavPcmStats]]. */
    def audioMoments(b: Array[Byte]): Array[Long] = {
      if (b == null || b.length < 4) return null
      val m0 = b(0) & 0xFF
      if (m0 == 'R') {
        val pcm = WavPcmStats.scan(b)
        if (pcm != null) pcm
        else {
          val g = G711Stats.scan(b)
          if (g != null) g else AdpcmStats.scan(b)
        }
      }
      else if (m0 == 'f') FlacPcmStats.scan(b)
      else null
    }

    /** 8-dim image descriptor from the 11 moment slots:
     * [meanR, meanG, meanB]/255, [sigmaR, sigmaG, sigmaB]/127.5,
     * w/(w+h) (aspect), (max-min)/255 (contrast). */
    def imageEmbed(m: Array[Long]): Array[Float] = {
      val n = m(5).toDouble
      val w = m(0).toDouble; val h = m(1).toDouble
      @inline def mean(i: Int): Double = m(i).toDouble / n
      @inline def sigma(sum: Long, sq: Long): Double = {
        val mu = sum.toDouble / n
        val v = sq.toDouble / n - mu * mu
        math.sqrt(if (v > 0) v else 0.0)
      }
      Array(
        (mean(2) / 255.0).toFloat, (mean(3) / 255.0).toFloat,
        (mean(4) / 255.0).toFloat,
        (sigma(m(2), m(8)) / 127.5).toFloat,
        (sigma(m(3), m(9)) / 127.5).toFloat,
        (sigma(m(4), m(10)) / 127.5).toFloat,
        (w / (w + h)).toFloat,
        ((m(7) - m(6)).toDouble / 255.0).toFloat)
    }

    /** Image-shaped moment slots for a video payload with a native
     * decoder (AVI/MJPEG): the per-frame pixel moments aggregate across
     * ALL decoded frames into the same 11-slot layout [[imageMoments]]
     * produces, so [[imageEmbed]] yields a real color-moment descriptor
     * of the decoded video content. Null when the container is not AVI
     * or no frame decodes. */
    def videoMoments(b: Array[Byte]): Array[Long] = {
      if (b == null || b.length < 12 || b(0) != 'R' || b(8) != 'A')
        return null
      val a = AviMjpegStats.scan(b)
      if (a == null || a(4) <= 0) return null
      Array(a(0), a(1), a(5), a(6), a(7), a(8), a(9), a(10),
        a(11), a(12), a(13))
    }

    /** 8-dim audio descriptor from the 9 sample-statistic slots:
     * meanAbs and peak normalized by the stream's full scale, RMS at the
     * 16-bit sum_sq scale, zero-crossing rate and clipped fraction per
     * sample, duration normalized to 10 minutes, channels/8,
     * rate/96kHz. */
    def audioEmbed(m: Array[Long]): Array[Float] = {
      val ch = m(0); val rate = m(1).toDouble; val frames = m(2)
      val n = (frames * ch).toDouble
      val full = (1L << (m(8).toInt - 1)).toDouble
      Array(
        (m(3).toDouble / n / full).toFloat,
        (math.sqrt(m(6).toDouble / n) / 32768.0).toFloat,
        (m(4).toDouble / full).toFloat,
        (m(7).toDouble / n).toFloat,
        (m(5).toDouble / n).toFloat,
        (frames.toDouble / rate / 600.0).toFloat,
        (ch.toDouble / 8.0).toFloat,
        (rate / 96000.0).toFloat)
    }
  }

  /**
   * Codec boundary — the residual stubbed layer, now reached ONLY for
   * payloads no native parser decodes (see the class doc). Deterministic
   * fakes derive every "decoded" property from the payload bytes, so
   * tests are stable and the pipeline shape is exercised end-to-end.
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
      // RIFF: AVI containers sniff video, everything else (WAVE and
      // short/headerless RIFF prefixes) keeps the audio default
      .when(magic8.startsWith("52494646") &&
        upper(hex(substring(payload, 9, 4))) === "41564920", "video")
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
        // AVI/MJPEG decodes ONCE per row: the same scan supplies dims,
        // duration, frame count AND the content-moment slots below
        val avi: Array[Long] =
          if (r.kind == "video" && r.payload.length >= 12 &&
            r.payload(0) == 'R' && r.payload(8) == 'A')
            AviMjpegStats.scan(r.payload)
          else null
        // REAL header decode first (PNG/JPEG/GIF dimensions need no codec
        // library — MediaHeaders); the deterministic stub only covers
        // payloads in formats the container cannot parse
        val (w, hgt) = r.kind match {
          case "video" if avi != null => (avi(0).toInt, avi(1).toInt)
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
          case "video" if avi != null =>
            // REAL AVI demux: header timing plus actually-decoded frames
            (avi(14), avi(3).toInt)
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
        // REAL content embedding wherever pixels/samples actually decode
        // (ContentEmbed); the stub embeds only what nothing native can
        val emb = r.kind match {
          case "image" =>
            Option(ContentEmbed.imageMoments(r.payload))
              .map(ContentEmbed.imageEmbed)
          case "audio" =>
            Option(ContentEmbed.audioMoments(r.payload))
              .map(ContentEmbed.audioEmbed)
          case "video" if avi != null && avi(4) > 0 =>
            // decoded MJPEG frames -> aggregated color moments -> the
            // same image descriptor (video content, not a stub)
            Some(ContentEmbed.imageEmbed(Array(avi(0), avi(1), avi(5),
              avi(6), avi(7), avi(8), avi(9), avi(10), avi(11), avi(12),
              avi(13))))
          case _ => None
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, digest,
          w, hgt, dur, frames, emb.getOrElse(Codecs.embed(r.payload)))
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
