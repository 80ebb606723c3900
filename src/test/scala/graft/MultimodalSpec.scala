package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  lazy val media = Multimodal.synthetic(spark, 300L).cache()

  test("synthetic media is deterministic; features have the fixed schema") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(Multimodal.synthetic(spark, 300L))
      .collect().sortBy(_.media_id)
    assert(f1.map(_.sha256).toSeq == f2.map(_.sha256).toSeq)
    val img = f1.find(_.kind == "image").get
    assert(img.width > 0 && img.height > 0 && img.duration_ms == -1L)
    val vid = f1.find(_.kind == "video").get
    assert(vid.frame_count > 0 && vid.duration_ms > 0)
    val aud = f1.find(_.kind == "audio").get
    assert(aud.duration_ms > 0 && aud.width == -1)
    assert(f1.forall(_.embedding.length == 8))
    assert(f1.forall(f => f.byte_size >= 64))
  }

  test("column-only metadata checks: size, sha, magic sniffing") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
    val wav = Array[Byte](0x52, 0x49, 0x46, 0x46, 9, 9, 9)
    val df = Seq((1L, "image", png), (2L, "image", wav), (3L, "audio", wav))
      .toDF("media_id", "kind", "payload")
    val sniffed = df.select(col("media_id"),
      Multimodal.sniffKind(col("payload")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(sniffed == Map(1L -> "image", 2L -> "audio", 3L -> "audio"))
    // kind mismatch: declared image but RIFF bytes
    val bad = Multimodal.kindMismatch(df)
      .select("media_id").as[Long].collect().toSeq
    assert(bad == Seq(2L))
    val sizes = df.select(Multimodal.byteSize(col("payload")))
      .as[Int].collect().toSeq
    assert(sizes == Seq(7, 7, 7))
  }

  test("real header decode: PNG/JPEG/GIF dimensions from hand-built bytes") {
    import graft.multimodal.MediaHeaders
    def u32(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def u16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      u32(13) ++ "IHDR".getBytes("UTF-8") ++ u32(640) ++ u32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    // realistic segment order: SOI, APP0(JFIF), DQT, then SOF0 — plus a
    // fill byte before APP0 to exercise the 0xFF-padding skip
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++
      Array(0xFF.toByte, 0xE0.toByte) ++ u16(16) ++
      "JFIF".getBytes("UTF-8") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
      Array(0xFF.toByte, 0xDB.toByte) ++ u16(67) ++ Array.fill[Byte](65)(1) ++
      Array(0xFF.toByte, 0xC0.toByte) ++ u16(17) ++ Array[Byte](8) ++
      u16(768) ++ u16(1024) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val gif = "GIF89a".getBytes("UTF-8") ++
      Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00, 0x00) // 320 x 200 LE
    val junk = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val df = Seq(Tuple1(png), Tuple1(jpeg), Tuple1(gif), Tuple1(junk))
      .toDF("payload")
    val out = df.select(MediaHeaders.imageDims(col("payload")).as("d"))
      .select(col("d.format"), col("d.width"), col("d.height")).collect()
    assert(out(0).toSeq == Seq("png", 640, 480))
    assert(out(1).toSeq == Seq("jpeg", 1024, 768))
    assert(out(2).toSeq == Seq("gif", 320, 200))
    assert(out(3).toSeq == Seq(null, null, null))
    // Scala twin agrees with the expression path
    assert(MediaHeaders.parseDims(png).contains(("png", 640, 480)))
    assert(MediaHeaders.parseDims(jpeg).contains(("jpeg", 1024, 768)))
    assert(MediaHeaders.parseDims(gif).contains(("gif", 320, 200)))
    assert(MediaHeaders.parseDims(junk).isEmpty)
    // extractFeatures now reports REAL dimensions for parseable payloads
    val rows = Seq(Multimodal.MediaRow(0L, "image", png, Map.empty),
      Multimodal.MediaRow(1L, "image", jpeg, Map.empty)).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats(0).width == 640 && feats(0).height == 480)
    assert(feats(1).width == 1024 && feats(1).height == 768)
  }

  test("real WAV header decode: canonical RIFF layout") {
    import graft.multimodal.MediaHeaders
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // 44100 Hz stereo 16-bit, 1 second of data (176400 bytes declared)
    val wav = "RIFF".getBytes ++ le32(176400 + 36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(176400)
    assert(MediaHeaders.parseWav(wav).contains((44100, 2, 1000L)))
    val row = Seq(Tuple1(wav)).toDF("payload")
      .select(MediaHeaders.wavInfo(col("payload")).as("w"))
      .select(col("w.sample_rate"), col("w.channels"), col("w.byte_rate"),
        col("w.duration_ms")).collect().head
    assert(row.toSeq == Seq(44100, 2, 176400, 1000L))
    // non-WAV bytes -> null
    assert(MediaHeaders.parseWav("nope".getBytes).isEmpty)
    // audio features use the real duration for WAV payloads
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "audio", wav, Map.empty)).toDS()).collect()
    assert(feats.head.duration_ms == 1000L)
  }

  test("real MP4 mvhd decode: box walk to timescale/duration") {
    import graft.multimodal.{MediaHeaders, Mp4Info}
    def u32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val ftyp = u32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ u32(0)
    val mvhd = u32(28) ++ "mvhd".getBytes ++
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(1500)
    // a free box before mvhd exercises the child walk
    val free = u32(12) ++ "free".getBytes ++ Array[Byte](0, 0, 0, 0)
    val moov = u32(8 + free.length + mvhd.length) ++ "moov".getBytes ++
      free ++ mvhd
    val mp4 = ftyp ++ moov
    // 1500 units at timescale 600 = 2500 ms; no trak -> n_frames -1
    assert(Mp4Info.scan(mp4).toSeq == Seq(600L, 1500L, 2500L, -1L))
    val row = Seq(Tuple1(mp4)).toDF("payload")
      .select(MediaHeaders.mp4Info(col("payload")).as("m"))
      .select(col("m.timescale"), col("m.duration"), col("m.duration_ms"),
        col("m.n_frames"))
      .collect().head
    assert(row.toSeq == Seq(600, 1500L, 2500L, null))
    assert(Mp4Info.scan("nope not an mp4".getBytes) == null)
    // video features pick up the real duration
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "video", mp4, Map.empty)).toDS()).collect()
    assert(feats.head.duration_ms == 2500L)
  }

  test("real MP4 stts decode: video-trak frame counts, audio trak skipped") {
    import graft.multimodal.{MediaHeaders, Mp4Info, Multimodal}
    def u32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ t.getBytes ++ payload
    val ftyp = u32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ u32(0)
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(1500))
    def hdlr(kind: String) = box("hdlr",
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ kind.getBytes)
    def stts(counts: Seq[Long]) = box("stts",
      Array[Byte](0, 0, 0, 0) ++ u32(counts.size.toLong) ++
        counts.toArray.flatMap(c => u32(c) ++ u32(100)))
    def trak(kind: String, counts: Seq[Long]) = box("trak", box("mdia",
      hdlr(kind) ++ box("minf", box("stbl", stts(counts)))))
    // audio trak FIRST — the walk must skip it and take the video trak
    val moov = box("moov",
      mvhd ++ trak("soun", Seq(9999L)) ++ trak("vide", Seq(24L, 18L, 3L)))
    val mp4 = ftyp ++ moov
    assert(Mp4Info.scan(mp4).toSeq == Seq(600L, 1500L, 2500L, 45L))
    val row = Seq(Tuple1(mp4)).toDF("payload")
      .select(MediaHeaders.mp4Info(col("payload")).as("m"))
      .select(col("m.n_frames")).collect().head
    assert(row.getLong(0) == 45L)
    // features: frames from the header, duration from mvhd — no stub call
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "video", mp4, Map.empty)).toDS()).collect()
    assert(feats.head.duration_ms == 2500L && feats.head.frame_count == 45)
    // malformed trak degrades to -1, never nulls the mvhd fields
    val badTrak = box("trak", "no mdia here".getBytes)
    val mp4bad = ftyp ++ box("moov", mvhd ++ badTrak)
    assert(Mp4Info.scan(mp4bad).toSeq == Seq(600L, 1500L, 2500L, -1L))
  }

  test("real FLAC STREAMINFO decode: packed-bit unpack, audio features") {
    import graft.multimodal.{FlacInfo, MediaHeaders, Multimodal}
    // 44100 Hz, 2 ch, 16 bps, 441000 samples -> 10000 ms
    val rate = 44100L; val ch = 2L; val bps = 16L; val total = 441000L
    val packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    def be(v: Long, n: Int) =
      (0 until n).reverse.map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val flac = "fLaC".getBytes ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++              // last STREAMINFO
      be(4096, 2) ++ be(4096, 2) ++ be(0, 3) ++ be(0, 3) ++
      be(packed, 8) ++ Array.fill[Byte](16)(0)           // md5 signature
    assert(FlacInfo.scan(flac).toSeq ==
      Seq(44100L, 2L, 16L, 441000L, 10000L))
    val row = Seq(Tuple1(flac)).toDF("payload")
      .select(MediaHeaders.flacInfo(col("payload")).as("m"))
      .select(col("m.sample_rate"), col("m.channels"),
        col("m.bits_per_sample"), col("m.total_samples"),
        col("m.duration_ms")).collect().head
    assert(row.toSeq == Seq(44100, 2, 16, 441000L, 10000L))
    assert(FlacInfo.scan("not flac".getBytes) == null)
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "audio", flac, Map.empty)).toDS()).collect()
    assert(feats.head.duration_ms == 10000L)
  }

  test("real MP3 frame-header decode: bitrate/samplerate tables, ID3 skip") {
    import graft.multimodal.{MediaHeaders, Mp3Info, Multimodal}
    // MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0) + 1246 bytes
    // payload -> (1250*8)/128 = 78 ms
    val frame = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      Array.fill[Byte](1246)(0)
    assert(Mp3Info.scan(frame).toSeq == Seq(10L, 128L, 44100L, 78L))
    // ID3v2 tag (syncsafe size 20) before the frame: skipped
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, 0, 20) ++ Array.fill[Byte](20)(0)
    assert(Mp3Info.scan(id3 ++ frame).toSeq == Seq(10L, 128L, 44100L, 78L))
    // MPEG2 Layer III (0xF3), idx 9 -> 80 kbps, sr idx 1 -> 24000
    val v2 = Array(0xFF, 0xF3, 0x96, 0x00).map(_.toByte) ++
      Array.fill[Byte](96)(0)
    assert(Mp3Info.scan(v2).toSeq == Seq(20L, 80L, 24000L, 10L))
    // Layer I rejected (documented subset), garbage rejected
    assert(Mp3Info.scan(Array(0xFF, 0xFF, 0x90, 0x00).map(_.toByte)) == null)
    assert(Mp3Info.scan("nope".getBytes) == null)
    val row = Seq(Tuple1(frame)).toDF("payload")
      .select(MediaHeaders.mp3Info(col("payload")).as("m"))
      .select(col("m.version_x10"), col("m.bitrate_kbps"),
        col("m.sample_rate"), col("m.duration_ms")).collect().head
    assert(row.toSeq == Seq(10, 128, 44100, 78L))
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(0L, "audio", frame, Map.empty)).toDS()).collect()
    assert(feats.head.duration_ms == 78L)
  }

  test("real BMP pixel decode: padding skipped, top-down rows, " +
      "non-24bpp and compressed rejected") {
    import graft.multimodal.BmpPixelStats
    // 2x2 24-bit BMP: stride 8 (2 pad bytes/row, set to 0xEE — counting
    // them would corrupt sums AND max). Pixels (B,G,R) row0: (1,2,3),
    // (4,5,6); row1: (7,8,9), (10,11,12).
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def hdr(h: Int) = Array[Byte]('B', 'M') ++ le32(70) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(2) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(16) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0)
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 0xEE.toByte, 0xEE.toByte,
      7, 8, 9, 10, 11, 12, 0xEE.toByte, 0xEE.toByte)
    val up = BmpPixelStats.scan(hdr(2) ++ px)
    // [w, h, sumR, sumG, sumB, nPx, min, max, sqR, sqG, sqB]
    assert(up.toSeq == Seq(2L, 2L, 3L + 6 + 9 + 12, 2L + 5 + 8 + 11,
      1L + 4 + 7 + 10, 4L, 1L, 12L,
      9L + 36 + 81 + 144, 4L + 25 + 64 + 121, 1L + 16 + 49 + 100))
    // negative height (top-down rows) — same stats, order-insensitive
    assert(BmpPixelStats.scan(hdr(-2) ++ px).toSeq == up.toSeq)
    // 32bpp and compressed (BI_RLE8 = 1) are rejected
    val h32 = hdr(2); h32(28) = 32
    assert(BmpPixelStats.scan(h32 ++ px) == null)
    val hC = hdr(2); hC(30) = 1
    assert(BmpPixelStats.scan(hC ++ px) == null)
    // truncated raster
    assert(BmpPixelStats.scan(hdr(2) ++ px.take(10)) == null)
  }

  test("real PPM P6 decode: comments, 16-bit maxval and P5 rejected") {
    import graft.multimodal.PpmInfo
    val hdr = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII")
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // RGB RGB
    val got = PpmInfo.scan(hdr ++ px)
    assert(got.toSeq == Seq(2L, 1L, 10L + 40, 20L + 50, 30L + 60, 2L,
      10L, 60L, 100L + 1600, 400L + 2500, 900L + 3600))
    assert(PpmInfo.scan("P6\n2 1\n65535\n".getBytes("US-ASCII") ++ px)
      == null) // 16-bit maxval unsupported
    assert(PpmInfo.scan("P5\n2 1\n255\n".getBytes("US-ASCII") ++ px)
      == null) // grayscale P5 is a different format
    assert(PpmInfo.scan(hdr ++ px.take(4)) == null) // truncated raster
  }

  test("real TIFF dims: LONG-typed entries and truncated IFDs") {
    import graft.multimodal.TiffDims
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    // little-endian, LONG (type 4) dims — the query uses SHORT, so the
    // LONG path is pinned here
    val tiff = Array[Byte]('I', 'I', 42, 0) ++ le32(8) ++
      Array[Byte](2, 0) ++
      Array[Byte](0, 1, 4, 0) ++ le32(1) ++ le32(70000) ++
      Array[Byte](1, 1, 4, 0) ++ le32(1) ++ le32(90000) ++ le32(0)
    assert(TiffDims.scan(tiff).toSeq == Seq(70000L, 90000L))
    assert(TiffDims.scan(tiff.take(20)) == null) // IFD truncated mid-entry
    assert(TiffDims.scan("II+ ".getBytes("US-ASCII")) == null)
  }

  test("real ID3v2 decode: UTF-8 frames, missing artist, padding stop") {
    import graft.multimodal.Id3v2Tags
    // v2.4, one TIT2 with encoding 3 (UTF-8, non-ascii), then padding
    val title = "café".getBytes("UTF-8")
    val body = Array[Byte](3) ++ title
    val frame = "TIT2".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, body.length.toByte, 0, 0) ++ body
    val pad = Array.fill[Byte](8)(0)
    val size = frame.length + pad.length
    val tag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 0, size.toByte) ++ frame ++ pad
    val got = Id3v2Tags.scan(tag)
    assert(got(0).toString == "2.4")
    assert(got(1).toString == "café")
    assert(got(2) == null) // no TPE1
    assert(Id3v2Tags.scan("ID4xxxxxxx".getBytes("US-ASCII")) == null)
  }

  test("real OGG decode: multi-segment table offsets; truncated null") {
    import graft.multimodal.OggInfo
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    // page with TWO lacing values (the id packet split across segments):
    // the payload still starts at 27 + nsegs
    val opusHead = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1, 2) ++ Array[Byte](0x38, 1) ++ le32(48000) ++
      Array[Byte](0, 0, 0)
    val page = "OggS".getBytes("US-ASCII") ++ Array[Byte](0, 2) ++
      Array.fill[Byte](8)(0) ++ le32(7) ++ le32(0) ++ le32(0) ++
      Array[Byte](2, 10, 9) ++ opusHead
    assert(OggInfo.scan(page).toSeq == Seq(0L, 2L, 48000L))
    assert(OggInfo.scan(page.take(30)) == null)
  }

  test("real content embeddings: color moments from decoded pixels, " +
      "waveform stats from decoded samples; stub only when undecodable") {
    import graft.multimodal.Multimodal.ContentEmbed
    // image: 2x1 PPM, pixels (10,20,30) and (40,50,60)
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val im = ContentEmbed.imageMoments(ppm)
    assert(im.toSeq == Seq(2L, 1L, 50L, 70L, 90L, 2L, 10L, 60L,
      1700L, 2900L, 4500L))
    val ie = ContentEmbed.imageEmbed(im)
    def sig(sum: Long, sq: Long): Double = {
      val mu = sum / 2.0; math.sqrt(sq / 2.0 - mu * mu)
    }
    assert(ie.toSeq == Seq[Float](
      (25.0 / 255.0).toFloat, (35.0 / 255.0).toFloat, (45.0 / 255.0).toFloat,
      (sig(50, 1700) / 127.5).toFloat, (sig(70, 2900) / 127.5).toFloat,
      (sig(90, 4500) / 127.5).toFloat,
      (2.0 / 3.0).toFloat, (50.0 / 255.0).toFloat))
    // audio: mono 8kHz WAV, samples [100, -100, 100]
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val wav = "RIFF".getBytes ++ le32(42) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(6) ++
      le16(100) ++ le16(-100 & 0xFFFF) ++ le16(100)
    val am = ContentEmbed.audioMoments(wav)
    assert(am.toSeq == Seq(1L, 8000L, 3L, 300L, 100L, 0L, 30000L, 2L, 16L))
    val ae = ContentEmbed.audioEmbed(am)
    assert(ae.toSeq == Seq[Float](
      (300.0 / 3.0 / 32768.0).toFloat,
      (math.sqrt(30000.0 / 3.0) / 32768.0).toFloat,
      (100.0 / 32768.0).toFloat, (2.0 / 3.0).toFloat, 0.0f,
      (3.0 / 8000.0 / 600.0).toFloat, 0.125f, (8000.0 / 96000.0).toFloat))
    // extractFeatures routes decodable payloads through the REAL embeds;
    // only the undecodable one reaches the stub
    val rows = Seq(
      MediaRow(1L, "image", ppm, Map.empty),
      MediaRow(2L, "audio", wav, Map.empty),
      MediaRow(3L, "image", "garbage".getBytes, Map.empty)).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats(0).embedding.toSeq == ie.toSeq)
    assert(feats(1).embedding.toSeq == ae.toSeq)
    assert(feats(2).embedding.toSeq ==
      Multimodal.Codecs.embed("garbage".getBytes).toSeq)
  }

  test("content near-dup wiring: near-identical decoded images share an " +
      "LSH bucket and clear the cosine threshold; distinct ones do not") {
    import graft.multimodal.Multimodal
    import graft.similarity.Similarity
    def ppm(colors: Seq[(Int, Int, Int)]): Array[Byte] =
      s"P6\n${colors.size} 1\n255\n".getBytes("US-ASCII") ++
        colors.flatMap { case (r, g, b) =>
          Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val base = Seq((200, 30, 90), (200, 30, 90), (10, 220, 40))
    val tweak = Seq((200, 30, 90), (200, 30, 90), (10, 220, 41)) // +1 blue
    val far = Seq((5, 5, 5), (250, 250, 250), (128, 0, 255))
    val rows = Seq(
      Multimodal.MediaRow(0L, "image", ppm(base), Map.empty),
      Multimodal.MediaRow(1L, "image", ppm(tweak), Map.empty),
      Multimodal.MediaRow(2L, "image", ppm(far), Map.empty)).toDS()
    val emb = Multimodal.extractFeatures(rows).toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
    val planes = Similarity.portablePlanes(6, 8)
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.995, planes)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("frame sampling plan: pure-expression sequence+explode") {
    val feats = Multimodal.extractFeatures(media.filter(col("kind") === "video"))
    val plan = Multimodal.frameSamplePlan(feats, everyMs = 1000L, maxFrames = 5)
    val byId = plan.groupBy("media_id").count()
    assert(byId.agg(max("count")).as[Long].head() <= 5)
    val one = plan.filter(col("media_id") === 2)
      .select("frame_idx", "offset_ms").as[(Int, Long)].collect().sortBy(_._1)
    assert(one.head == (0, 0L))
    assert(one.forall { case (i, off) => off == i * 1000L })
  }

  test("extractFeatures dims fallback: BMP/PPM/TIFF/ICO headers beat the " +
      "stub; unknown bytes still reach it") {
    import graft.multimodal.MediaExtra
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val bmp = Array[Byte]('B', 'M') ++ le32(70) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(2) ++ le32(-3) ++ // top-down: |h| = 3
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(16) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0)
    val ppm = "P6\n4 5\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](4 * 5 * 3)(7)
    val tiff = Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8, 0, 2) ++
      Array[Byte](1, 0, 0, 3, 0, 0, 0, 1, 0, 6, 0, 0) ++  // 256 SHORT 6
      Array[Byte](1, 1, 0, 3, 0, 0, 0, 1, 0, 9, 0, 0) ++  // 257 SHORT 9
      Array[Byte](0, 0, 0, 0)
    val ico = Array[Byte](0, 0, 1, 0, 1, 0, 0, 0) ++ // 0-byte dims = 256
      Array.fill[Byte](14)(0)
    assert(MediaExtra.parseMoreDims(bmp).contains((2, 3)))
    assert(MediaExtra.parseMoreDims(ppm).contains((4, 5)))
    assert(MediaExtra.parseMoreDims(tiff).contains((6, 9)))
    assert(MediaExtra.parseMoreDims(ico).contains((256, 256)))
    assert(MediaExtra.parseMoreDims("garbage".getBytes).isEmpty)
    assert(MediaExtra.parseMoreDims(Array.emptyByteArray).isEmpty)
    // truncated PPM raster: header parses but the scan rejects it
    assert(MediaExtra.parseMoreDims(ppm.dropRight(1)).isEmpty)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", bmp, Map.empty),
      Multimodal.MediaRow(2L, "image", tiff, Map.empty),
      Multimodal.MediaRow(3L, "image", ico, Map.empty),
      Multimodal.MediaRow(4L, "image", "garbage".getBytes, Map.empty)
    ).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.media_id)
    assert((feats(0).width, feats(0).height) == (2, 3))
    assert((feats(1).width, feats(1).height) == (6, 9))
    assert((feats(2).width, feats(2).height) == (256, 256))
    // the unknown payload is the one place the deterministic stub fires
    assert((feats(3).width, feats(3).height) ==
      Multimodal.Codecs.decodeImage("garbage".getBytes))
  }
}
