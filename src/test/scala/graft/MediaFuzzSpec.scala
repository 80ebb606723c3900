package graft

/**
 * Robustness fuzz for every native media scan: these expressions run
 * over UNTRUSTED binary columns at 100-TB scan scale, so a malformed
 * payload must yield null — never an uncaught exception that would
 * fail the Spark task (and with it the whole stage, retries included).
 * Deterministic seeds; three corpora per scan: pure random bytes,
 * magic-prefixed random bytes (forces the parser past the cheap
 * signature check into the structural walk), and random single-byte
 * mutations of a VALID payload (the adversarial middle ground: mostly
 * well-formed streams with one corrupted length/type/entropy byte).
 */
class MediaFuzzSpec extends SparkTestBase {

  import graft.multimodal._

  private val scans: Seq[(String, Array[Byte] => Array[Long])] = Seq(
    "bmp" -> BmpPixelStats.scan, "ppm" -> PpmInfo.scan,
    "png" -> PngPixelStats.scan, "gif" -> GifPixelStats.scan,
    "jpeg" -> JpegPixelStats.scan, "wav" -> WavPcmStats.scan,
    "flac" -> FlacPcmStats.scan, "oggdur" -> OggDuration.scan,
    "ogg" -> OggInfo.scan, "tiff" -> TiffDims.scan,
    "id3v2" -> (b => Option(Id3v2Tags.scan(b)).map(_ => Array(0L)).orNull),
    "g711" -> G711Stats.scan, "adpcm" -> AdpcmStats.scan,
    "avi" -> AviMjpegStats.scan, "aviframes" -> AviFrameMeans.scan)

  private val magics: Map[String, Array[Byte]] = Map(
    "bmp" -> Array[Byte]('B', 'M'),
    "ppm" -> "P6\n".getBytes,
    "png" -> Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte),
    "gif" -> "GIF89a".getBytes,
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "wav" -> "RIFF0000WAVE".getBytes,
    "flac" -> "fLaC".getBytes,
    "oggdur" -> "OggS".getBytes,
    "ogg" -> "OggS".getBytes,
    "tiff" -> Array[Byte]('I', 'I', 0x2A, 0),
    "id3v2" -> "ID3".getBytes,
    "g711" -> "RIFF0000WAVE".getBytes,
    "adpcm" -> "RIFF0000WAVE".getBytes,
    "avi" -> "RIFF0000AVI LIST".getBytes,
    "aviframes" -> "RIFF0000AVI LIST".getBytes)

  private def rnd(seed: Long, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  test("random bytes never throw from any media scan") {
    for ((name, scan) <- scans; seed <- 0 until 400) {
      val n = 1 + (seed * 37) % 512
      try scan(rnd(seed, n))
      catch { case e: Throwable =>
        fail(s"$name threw ${e.getClass.getSimpleName} at seed $seed/$n") }
    }
  }

  test("magic-prefixed random bodies never throw (structural walk fuzz)") {
    for ((name, scan) <- scans; seed <- 0 until 400) {
      val body = rnd(seed + 100000, 16 + (seed * 13) % 700)
      val payload = magics(name) ++ body
      try scan(payload)
      catch { case e: Throwable =>
        fail(s"$name threw ${e.getClass.getSimpleName} at seed $seed") }
    }
  }

  test("single-byte mutations of valid payloads never throw") {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bmp = "BM".getBytes ++ Array.fill[Byte](4)(58) ++
      Array.fill[Byte](4)(0) ++ Array[Byte](54, 0, 0, 0, 40, 0, 0, 0,
        1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 24, 0) ++ Array.fill[Byte](24)(0) ++
      Array[Byte](1, 2, 3, -1)
    val ppm = "P6\n1 1\n255\n".getBytes ++ Array[Byte](10, 20, 30)
    val wav = "RIFF".getBytes ++ le16(40) ++ le16(0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0, 1, 0, 1, 0) ++
      le16(8000) ++ le16(0) ++ le16(16000) ++ le16(0) ++
      Array[Byte](2, 0, 16, 0) ++
      "data".getBytes ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    // real codec output for the complex decoders: the JDK encoders
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      img.setRGB(x, y, (x * 10 << 16) | (y * 14 << 8) | ((x + y) * 5))
    def enc(fmt: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bo); bo.toByteArray
    }
    // single CONSTANT-subframe FLAC (the m_audio_flac synthesis shape):
    // rate 16000, mono, bps 16, 16 samples
    val packed = (16000L << 44) | (15L << 36) | 16L
    val flacC = hexb("664C614380000022" + "00100010" + "000000000000" +
      f"$packed%016X" + "0" * 32 +
      "FFF87D08" + "00" + "000F" + "3E80" + "00" +
      "00" + "1234" + "0000")
    assert(FlacPcmStats.scan(flacC) != null, "fuzz base FLAC must be valid")
    assert(JpegPixelStats.scan(enc("jpg")) != null,
      "fuzz base JPEG must be valid")
    assert(PngPixelStats.scan(enc("png")) != null,
      "fuzz base PNG must be valid")
    // G.711 mu-law and one-block IMA ADPCM WAVs (the MediaLossy scans)
    val g711 = "RIFF".getBytes ++ Array[Byte](44, 0, 0, 0) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++
      Array[Byte](18, 0, 0, 0, 7, 0, 1, 0) ++ le16(8000) ++ le16(0) ++
      le16(8000) ++ le16(0) ++ Array[Byte](1, 0, 8, 0, 0, 0) ++
      "data".getBytes ++ Array[Byte](6, 0, 0, 0, 0, 40, -128, 30, 99, 7)
    assert(G711Stats.scan(g711) != null, "fuzz base G.711 must be valid")
    val adpcm = "RIFF".getBytes ++ Array[Byte](48, 0, 0, 0) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++
      Array[Byte](20, 0, 0, 0, 0x11, 0, 1, 0) ++ le16(8000) ++ le16(0) ++
      le16(8000) ++ le16(0) ++ Array[Byte](8, 0, 4, 0, 2, 0, 9, 0) ++
      "data".getBytes ++ Array[Byte](8, 0, 0, 0) ++
      Array[Byte](100, 0, 30, 0, 0x17, 0x7F, -1, 0x28)
    assert(AdpcmStats.scan(adpcm) != null, "fuzz base ADPCM must be valid")
    // one-frame AVI/MJPEG around the ImageIO JPEG (MediaVideo scan)
    def le32b(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def ch4(tag: String, body: Array[Byte]) = tag.getBytes ++
      le32b(body.length) ++ body ++
      (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val jf = enc("jpg")
    val avih = le32b(40000) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(1) ++ le32b(0) ++ le32b(1) ++ le32b(0) ++ le32b(24) ++
      le32b(16) ++ Array.fill[Byte](16)(0)
    val aviBody = "AVI ".getBytes ++
      ch4("LIST", "hdrl".getBytes ++ ch4("avih", avih)) ++
      ch4("LIST", "movi".getBytes ++ ch4("00dc", jf))
    val avi = "RIFF".getBytes ++ le32b(aviBody.length) ++ aviBody
    assert(AviMjpegStats.scan(avi) != null, "fuzz base AVI must be valid")
    val valids = Seq("bmp" -> bmp, "ppm" -> ppm, "wav" -> wav,
      "jpeg" -> enc("jpg"), "png" -> enc("png"), "flac" -> flacC,
      "g711" -> g711, "adpcm" -> adpcm, "avi" -> avi,
      "aviframes" -> avi)
    val byName = scans.toMap
    for ((name, valid) <- valids; seed <- 0 until 600) {
      val r = new java.util.Random(seed)
      val m = valid.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      try byName(name)(m)
      catch { case e: Throwable =>
        fail(s"$name threw ${e.getClass.getSimpleName} at seed $seed") }
    }
  }
}
