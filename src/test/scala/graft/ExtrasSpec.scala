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
}
