package graft

import org.apache.spark.sql.functions._

import graft.functions.Extras

class ExtrasSpec extends SparkTestBase {

  import spark.implicits._

  test("luhn: known-valid and known-invalid PANs (types.py:1964)") {
    // 4242424242424242 is the canonical valid test PAN
    val cases = Seq("4242424242424242", "4242424242424241", "1234", "abcd")
    val got = cases.toDF("c")
      .select(Extras.luhnValid(col("c"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false, false))
    val brands = Seq("4242424242424242", "5105105105105100", "371449635398431")
      .toDF("c").select(Extras.cardBrand(col("c"))).as[String].collect().toSeq
    assert(brands == Seq("visa", "mastercard", "amex"))
  }

  test("bytesize: decimal vs binary units (types.py:2070)") {
    val cases = Seq("100", "1KiB", "1.5 KB", "2MiB", "1 GB", "junk")
    val got = cases.toDF("c")
      .select(Extras.parseByteSize(col("c"))).as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(100L), Some(1024L), Some(1500L),
      Some(2097152L), Some(1000000000L), None))
  }

  test("validate_email reference fixture table (test_networks.py:905-976)") {
    val df = SparkEntry.emailFixtures.map(_._1).toDF("c")
    val p = Extras.parseNameEmail(col("c"))
    val out = df.select(p.getField("name"), p.getField("email")).collect()
    SparkEntry.emailFixtures.zip(out).foreach { case ((in, nm, em), row) =>
      val gotName = if (row.isNullAt(0)) null else row.getString(0)
      val gotEmail = if (row.isNullAt(1)) null else row.getString(1)
      assert(gotName == nm, s"name of ${in.take(40)}: got $gotName")
      assert(gotEmail == em, s"email of ${in.take(40)}: got $gotEmail")
    }
  }

  test("email IDN parity: local NFC normalization + punycode domain decode") {
    // NFD local ("e" + combining acute U+0301) normalizes to NFC, and the
    // name fallback uses the NORMALIZED local -- email-validator semantics
    val rows = Seq(
      "cafe\u0301@example.com",             // NFD local
      "foobar@XN--80AK6AA92E.COM",           // uppercase ACE prefix
      "x@xn--bogus-!!!.com")                 // undecodable: rejected by
    val out = rows.toDF("c")                 // the domain grammar ('!')
      .select(Extras.parseNameEmail(col("c")).as("p"))
      .select(col("p.name"), col("p.email")).collect()
    assert(out(0).getString(0) == "caf\u00e9")
    assert(out(0).getString(1) == "caf\u00e9@example.com")
    assert(out(1).getString(1) == "foobar@\u0430\u0440\u0440\u04cf\u0435.com")
    assert(out(2).isNullAt(1))
  }

  test("email UTS-46 parity: deviation code points, context-free sigma, " +
      "punycode decode of deviation labels (idna goldens)") {
    import org.apache.spark.unsafe.types.UTF8String
    def d(s: String): String =
      graft.functions.EmailNorm.domain(UTF8String.fromString(s)).toString
    // goldens from python `idna` (UTS-46 non-transitional, std3 off) —
    // the exact library email-validator v2 wraps. The first three were
    // WRONG under the old java.net.IDN/IDNA2003 path (ß mapped to ss,
    // ACE labels decoding to deviation chars kept ascii, final Σ picked
    // the linguistic ς instead of the UTS-46 context-free σ).
    assert(d("straße.com") == "straße.com")
    assert(d("xn--strae-oqa.com") == "straße.com")
    assert(d("ΒΌΛΟΣ.com") == "βόλοσ.com")
    assert(d("STRAẞE.com") == "straße.com")
    assert(d("STRASSE.com") == "strasse.com")
    assert(d("βόλος.com") == "βόλος.com") // typed final ς kept (deviation)
    assert(d("xn--nxasmq6b.com") == "βόλοσ.com")
    assert(d("ΣΌΛΟΣ.gr") == "σόλοσ.gr")
    assert(d("xn--80ak6aa92e.com") == "аррӏе.com")
    assert(d("xn--bogus-!!!.com") == "xn--bogus-!!!.com") // undecodable
  }

  test("punycode decoder fuzz: 40 python-punycode-codec labels round-trip") {
    import org.apache.spark.unsafe.types.UTF8String
    // (encoded-label, expected-decode) fuzz table: python punycode codec,
    // seed 99, mixed Greek/Cyrillic/CJK/Hebrew/Devanagari/Deseret + ß
    val punyFuzz: Seq[(String, String)] = Seq(
      ("78,6e,2d,2d,7a,63,61,61,61,32,33,30,61,38,73,61,32,39,37,36,61,6a,33,38,6c", "df,43e,4e88,3b9,df,10441,df"),
      ("78,6e,2d,2d,7a,63,61,38,38,6c,75,61,37,31,63,68,62,30,35,31,64", "df,44d,445,3c7,3c0,967"),
      ("78,6e,2d,2d,6d,65,62", "5e1"),
      ("78,6e,2d,2d,7a,63,61", "df"),
      ("78,6e,2d,2d,6c,2d,72,6d,62,37,38,61,68,61,39,65,33,30,32,32,64", "3bf,4fd9,6c,43d,44c,43b"),
      ("78,6e,2d,2d,6d,78,61", "3b1"),
      ("78,6e,2d,2d,71,78,61,72,38,37,30,38,71", "10435,3be,3b5"),
      ("78,6e,2d,2d,6d,75,2d,67,69,61,33,37,35,66,6d,39,35,67", "6d,922,df,75,4fc5"),
      ("78,6e,2d,2d,65,2d,70,66,61,30,39,73,65,72,6a,31,73", "df,979,65,44a,3b4"),
      ("78,6e,2d,2d,6b,31,61,6e", "442,43b"),
      ("78,6e,2d,2d,6b,2d,6c,6d,62,34,37,61,38,61,7a,30,6f,75,7a,69,39,38,35,6c", "43d,97f,4f07,3bc,434,5d0,6b"),
      ("78,6e,2d,2d,7a,63,61,61,36,32,34,64,38,69", "df,966,df,917"),
      ("78,6e,2d,2d,6c,2d,71,66,61,33,30,33,31,64", "6c,df,4f3e"),
      ("78,6e,2d,2d,7a,63,61,35,38,6c,68,61,76,32,32,64,71,31,66,72,62,34,35,36,62,6e,72,61,36,34,39,36,63,6c,78,61", "4f3e,3c7,937,4f88,5de,3bf,df,3c1,5e5,97a,440"),
      ("78,6e,2d,2d,7a,63,61,37,34,6f,68,39,61,37,30,66,38,67,6c,66,6c,37,34,31,63", "5dd,442,df,4f84,932,901,94b"),
      ("78,6e,2d,2d,7a,63,61,61,61,31,37,35,61", "440,df,df,df"),
      ("78,6e,2d,2d,71,65,62,33,33,30,38,61", "4e01,5e5"),
      ("78,6e,2d,2d,64,62,2d,66,69,61,63,61,34,30,33,63,69,63,7a,37,6e,38,61,36,36,31,66,62,71,32,72,6e,77,62", "44c,4f0e,df,5d6,64,5d2,62,df,94b,4e66,df,440"),
      ("78,6e,2d,2d,7a,63,61,61,39,32,78,73,61,36,38,71,6e,62,32,31,30,62,77,76,31,30,64", "920,44c,df,447,5d6,5de,df,10449"),
      ("78,6e,2d,2d,64,73,73,2d,74,79,63,37,61,38,37,78,37,63,31,36,35,61,6a,66,32,39,33,30,65,76,79,34,71", "1043d,3c2,4fd6,64,97e,3bb,73,5e4,73,969,5d5"),
      ("78,6e,2d,2d,6d,62,2d,74,71,66", "6d,62,93a"),
      ("78,6e,2d,2d,7a,63,61,33,35,77,6b,61,38,31,34,61,6b,61,39,38,36,37,68,78,6c,61,76,33,30,35,6a,78,64,61", "5d5,1042f,df,4e77,1043d,5d8,912,4eb1,914"),
      ("78,6e,2d,2d,79,6b,2d,67,69,61,62,34,34,37,61,65,64,70,38,61,78,61,34,6a,75,35,70,6c,35,6c,67,7a,30,30,66", "3c8,438,435,79,df,93b,445,6b,df,5d5,3b5,10442"),
      ("78,6e,2d,2d,68,2d,71,66,61,61,31,32,30,61,71,72,61,67,66,31,33,69,37,61,37,6b,79,37,34,61,77,71,61,66,34,38,38,64", "68,df,4fc6,3b6,44c,940,90b,df,5d5,430,5e9,5d9"),
      ("78,6e,2d,2d,6e,78,61,39,34,34,32,6b", "10436,3b2"),
      ("78,6e,2d,2d,6d,79,2d,77,6d,63,35,37,6e,78,39,67,6d,31,35,6b", "444,953,6d,5e3,4e9a,79"),
      ("78,6e,2d,2d,7a,63,61,61,34,32,39,61,7a,70,36,67,35,6a,61", "df,4eb2,df,4ef7,5d5"),
      ("78,6e,2d,2d,73,67,75,71,2d,77,6e,61,63,33,35,32,63,77,32,61,6f,38,68,66,62", "3be,73,67,43b,5d1,5d5,df,75,71,df"),
      ("78,6e,2d,2d,6e,31,61,32,37,78", "43e,96f"),
      ("78,6e,2d,2d,78,78,61,34,78,38,38,36,36,64", "1044e,3bc,43e"),
      ("78,6e,2d,2d,7a,63,61,31,37,6c,62,61,76,34,33,65,64,35,65,64,62,32,33,33,64,34,73,32,6f,69,61,33,32,64,72,33,32,35,6f", "10442,3be,4eb1,44e,4eb0,5d5,3b8,4ee8,df,3b8,5da,97e"),
      ("78,6e,2d,2d,62,2d,71,66,61,38,33,74,75,36,68", "3c5,62,df,930"),
      ("78,6e,2d,2d,39,64,62", "5d5"),
      ("78,6e,2d,2d,7a,63,61,35,35,6f,30,37,61,79,61,39,30,33,62", "5d0,5d6,91d,446,df"),
      ("78,6e,2d,2d,6c,6c,66,2d,70,78,63,32,64,79,32,71,38,62,30,31,31,62,70,73,32,6f,32,64,61,6e,37,61,31,30,39,39,6e", "5e0,5d6,1042f,6c,4e90,3bd,6c,960,4e9d,3b1,66,4ee3"),
      ("78,6e,2d,2d,6e,2d,71,66,61,38,33,74,66,61,31,34,79,78,79,68", "5e8,3c5,6e,3c6,df,97f"),
      ("78,6e,2d,2d,68,2d,70,66,61,34,30,74,62,61,38,33,79,67,75,68,69,32,34,6c", "df,915,93c,3b9,4e41,68,5da,3b9"),
      ("78,6e,2d,2d,74,2d,71,66,61,34,31,39,61,73,75,36,67,39,72,31,6a", "4ed9,10438,74,5d2,df"),
      ("78,6e,2d,2d,6a,62,2d,67,69,61,33,38,30,61,69,61,32,30,66,6b,34,66,71,61,38,32,39,37,6e,64,6c,61,34,33,37,31,6f,6b,65,61", "6a,10438,df,4e6c,5dc,4e45,5de,1042b,3c7,62,3c5,44a"),
      ("78,6e,2d,2d,64,2d,70,66,61,33,32,35,64,36,30,38,65", "df,64,937,4e6d"))
    def fromHex(h: String): String = {
      val sb = new java.lang.StringBuilder
      h.split(",").foreach(c => sb.appendCodePoint(Integer.parseInt(c, 16)))
      sb.toString
    }
    punyFuzz.foreach { case (encHex, expHex) =>
      val enc = fromHex(encHex)
      val exp = java.text.Normalizer.normalize(fromHex(expHex),
        java.text.Normalizer.Form.NFC)
      val got = graft.functions.EmailNorm.domain(
        UTF8String.fromString(enc)).toString
      assert(got == exp, s"decode of $encHex")
    }
  }

  test("email + base64 + redaction") {
    assert(Seq("a.b@ex.com").toDF("c").select(Extras.isEmail(col("c")))
      .as[Boolean].head())
    assert(!Seq("a b@ex.com").toDF("c").select(Extras.isEmail(col("c")))
      .as[Boolean].head())
    assert(Seq("aGVsbG8=").toDF("c").select(Extras.isBase64(col("c")))
      .as[Boolean].head())
    assert(!Seq("a===").toDF("c").select(Extras.isBase64(col("c")))
      .as[Boolean].head())
    val red = Seq("hunter2").toDF("c").select(Extras.redact(col("c")))
      .as[String].head()
    assert(red == "**********")
  }

  test("repetition metrics: duplicate-token and top-bigram fractions (Gopher A1.1)") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "a b a b a"),      // 5 tokens, 2 distinct; "a b" x2 -> 4/5
      (2L, "x y z"),          // no repeats; each bigram once -> 2/3
      (3L, "solo")            // single token, no bigram
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionMetrics(df, "doc_id", "text")
      .orderBy("id")
      .as[(Long, Long, Double, Double)].collect()
    assert(out(0) == ((1L, 5L, 3.0 / 5, 4.0 / 5)))
    assert(out(1) == ((2L, 3L, 0.0, 2.0 / 3)))
    assert(out(2) == ((3L, 1L, 0.0, 0.0)))
  }

  test("chunkTokens: overlap, short tail, single-chunk doc, determinism") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5"), // size 3 stride 2 -> [t1..t3],[t3..t5],[t5]
      (2L, "a b")             // one chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(df, "doc_id", "text", size = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 0, 3, "t1 t2 t3"), (1L, 1, 3, "t3 t4 t5"), (1L, 2, 1, "t5"),
      (2L, 0, 2, "a b")))
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(df, "doc_id", "text", size = 2, stride = 3)
    }
  }

  test("token-frequency stats: mean corpus freq, rare + distinct fractions") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "the the cat"),  // corpus: the x5, cat x2, dog x1, sat x1
      (2L, "the the the dog sat"),
      (3L, "cat")
    ).toDF("doc_id", "text")
    val out = TextOps.tokenFreqStats(df, "doc_id", "text", rareMax = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect()
    // doc 1: freqs (5,5,2) -> mean 4.0; 0 rare; 2 distinct / 3
    assert(out(0) == ((1L, 3L, 4.0, 0.0, 2.0 / 3)))
    // doc 2: freqs (5,5,5,1,1) -> 17/5; rare 2/5; distinct 3/5
    assert(out(1) == ((2L, 5L, 17.0 / 5, 2.0 / 5, 3.0 / 5)))
    assert(out(2) == ((3L, 1L, 2.0, 0.0, 1.0)))
  }

  test("bigramLogProb: add-one bigram model, fixed-point units, by hand") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "a b a b"), // bigrams (a,b) x2, (b,a) x1
      (2L, "a b"),     // bigram (a,b)
      (3L, "c")        // no bigrams: absent from the result
    ).toDF("doc_id", "text")
    // corpus model: c2(a,b) = 2+1 = 3, c2(b,a) = 1; prefix counts
    // c1(a)=3, c1(b)=1; V = |{a,b,c}| = 3.
    // lp(a,b) = round(ln(4/6)  * 1e4) = round(-4054.65) = -4055
    // lp(b,a) = round(ln(2/4)  * 1e4) = round(-6931.47) = -6931
    val out = TextOps.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length == 2) // doc 3 has no bigrams
    assert(out(0) == ((1L, 3L, 2L * -4055L + -6931L, true))) // -15041
    assert(out(1) == ((2L, 1L, -4055L, true)))
  }

  test("bigramLogProb: integer average-log-prob floor (no division)") {
    import graft.text.TextOps
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    // threshold -4500/bigram: doc 1 sum -15041 < 3*-4500 = -13500 ->
    // dropped; doc 2 -4055 >= -4500 -> kept
    val out = TextOps.bigramLogProb(df, "doc_id", "text",
      thresholdFpPerBigram = -4500L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(!out(0)._4 && out(1)._4)
  }

  test("dupSpans: cross-doc spans only, counts, 1-based representative") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "x q r s y"),   // span (q r s) at pos 2
      (2L, "q r s q r s"), // (q r s) at 1 and 4; (r s q), (s q r) once
      (3L, "a b c"),       // unique span
      (4L, "zz")           // shorter than w: emits nothing
    ).toDF("doc_id", "text")
    val out = TextOps.dupSpans(df, "doc_id", "text", w = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    // only "q r s" crosses documents: docs {1,2}, 3 occurrences,
    // representative = (doc 1, pos 2)
    assert(out.length == 1)
    assert((out(0)._2, out(0)._3, out(0)._4, out(0)._5) == ((2L, 3L, 1L, 2L)))
  }

  test("dupSpans: same-doc repetition alone is not a cross-doc dup") {
    import graft.text.TextOps
    val df = Seq((1L, "u v u v u v")).toDF("doc_id", "text")
    // (u v u) and (v u v) each occur twice, but within ONE doc
    assert(TextOps.dupSpans(df, "doc_id", "text", w = 3).count() == 0L)
  }

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanScrub: canonical occurrence kept, every other occurrence's " +
    "tokens removed; unique docs untouched") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "x q r s y"),   // holds the canonical (q r s) at (1,2)
      (2L, "q r s q r s"), // both occurrences removed -> empty
      (3L, "a b c")        // unique: untouched
    ).toDF("doc_id", "text")
    val out = TextOps.spanScrub(df, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 5L, 0L, sha("x q r s y"))))
    assert(out(1) == ((2L, 6L, 6L, sha(""))))
    assert(out(2) == ((3L, 3L, 0L, sha("a b c"))))
  }

  test("packOrder: concat-and-chunk packing, by hand; bucket-size " +
    "independence") {
    import graft.text.TextOps
    val df = Seq(
      (0L, "a b c"),        // 3 toks: [0,2]   block 0
      (1L, "d e"),          // 2 toks: [3,4]   blocks 0-1 (straddles)
      (2L, "f g h i"),      // 4 toks: [5,8]   blocks 1-2
      (3L, ""),             // 0 toks: start 9, stays block 2
      (4L, "j")             // 1 tok:  [9,9]   block 2
    ).toDF("doc_id", "text")
    val out = TextOps.packOrder(df, "doc_id", "text", seqLen = 4L,
      bucketSize = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out(0) == ((0L, 3L, 0L, 0L, 0L)))
    assert(out(1) == ((1L, 2L, 3L, 0L, 1L)))
    assert(out(2) == ((2L, 4L, 5L, 1L, 2L)))
    assert(out(3) == ((3L, 0L, 9L, 2L, 2L)))
    assert(out(4) == ((4L, 1L, 9L, 2L, 2L)))
    // bucketSize must not change the answer (two-level scan is exact)
    val alt = TextOps.packOrder(df, "doc_id", "text", seqLen = 4L,
      bucketSize = 1000L)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(alt.toSeq == out.toSeq)
  }

  test("packOrder: bit-identical across parallelism") {
    import graft.text.TextOps
    val df = (0L until 500L)
      .map(i => (i, ("t " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "text")
    def run(p: Int) = TextOps.packOrder(df.repartition(p), "doc_id",
      "text", seqLen = 16L, bucketSize = 23L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run(1) == run(32))
  }

  test("spanScrub: overlapping duplicated spans union their positions") {
    import graft.text.TextOps
    val df = Seq(
      (4L, "m n o p"),    // canonical copy (lower doc id)
      (5L, "m n o p z")   // loses positions 1-3 u 2-4 -> "z" survives
    ).toDF("doc_id", "text")
    val out = TextOps.spanScrub(df, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((4L, 4L, 0L, sha("m n o p"))))
    assert(out(1) == ((5L, 5L, 4L, sha("z"))))
  }
}
