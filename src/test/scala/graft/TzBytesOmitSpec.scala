package graft

import org.apache.spark.sql.types._

import graft.spec._

/**
 * Datetime tz_constraint + microseconds_precision, bytes encoding modes,
 * and with_default on_error=omit — fixtures transcribed from pydantic-core
 * behavior (verified against pydantic 2.13.4 / pydantic-core in this
 * repo's reference checkout; see Scaladoc in Spec.scala for the exact
 * observed error dicts).
 */
class TzBytesOmitSpec extends SparkTestBase {

  // ------------------------------------------------------ tz constraints

  test("datetime tz=aware: naive string -> timezone_aware (types.rs:582)") {
    val spec = DatetimeSpec(tz = Some(TzConstraint.Aware))
    assert(types(spec, StringType, Seq(
      "2020-01-01T00:00:00", "2020-01-01T00:00:00Z",
      "2020-01-01T00:00:00+01:00", null)) ==
      Seq(Seq("timezone_aware"), Seq(), Seq(), Seq()))
  }

  test("datetime tz=naive: offset string -> timezone_naive (types.rs:581)") {
    val spec = DatetimeSpec(tz = Some(TzConstraint.Naive))
    assert(types(spec, StringType, Seq(
      "2020-01-01T00:00:00", "2020-01-01T00:00:00+0100", "2020-01-01T00:00:00Z")) ==
      Seq(Seq(), Seq("timezone_naive"), Seq("timezone_naive")))
  }

  test("datetime tz=offset: wrong offset -> timezone_offset with rendered seconds (types.rs:583)") {
    val spec = DatetimeSpec(tz = Some(TzConstraint.Offset(3600)))
    val out = run(spec, StringType, Seq(
      "2020-01-01T00:00:00+01:00",  // 3600 -> ok
      "2020-01-01T00:00:00+05:00",  // 18000 -> timezone_offset
      "2020-01-01T00:00:00",        // naive -> timezone_aware
      "2020-01-01T00:00:00-02:30")) // -9000 -> timezone_offset
    assert(out.map(_._2) == Seq(Seq(), Seq("timezone_offset"),
      Seq("timezone_aware"), Seq("timezone_offset")))
    // message renders expected + actual like the reference
    import org.apache.spark.sql.functions._
    import graft.compile.Compiler
    val schema = StructType(Seq(StructField("x", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(org.apache.spark.sql.Row("2020-01-01T00:00:00+05:00")), 1), schema)
    val c = Compiler.compile(col("x"), StringType, array(lit("x")), spec, Mode.Lax)
    val m = df.select(element_at(c.violations, 1).getField("msg"))
      .collect().head.getString(0)
    assert(m == "Timezone offset of 3600 required, got 18000")
  }

  test("datetime tz: TimestampType input counts as aware; timestamp_ntz naive") {
    val aware = DatetimeSpec(tz = Some(TzConstraint.Aware))
    val naive = DatetimeSpec(tz = Some(TzConstraint.Naive))
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    assert(types(aware, TimestampType, Seq(ts)) == Seq(Seq()))
    assert(types(naive, TimestampType, Seq(ts)) == Seq(Seq("timezone_naive")))
  }

  // ------------------------------------------- microseconds_precision

  test("datetime microseconds_precision: truncate keeps 6 digits (speedate Truncate)") {
    val spec = DatetimeSpec()
    val out = run(spec, StringType, Seq("2020-01-01T00:00:00.1234567"))
    assert(out.head._2 == Seq())
    assert(out.head._1.toString == "2020-01-01 00:00:00.123456")
  }

  test("datetime microseconds_precision=error rejects >6 fraction digits (observed pydantic-core)") {
    val spec = DatetimeSpec(
      microsecondsPrecision = MicrosecondsPrecision.Error)
    assert(types(spec, StringType, Seq(
      "2020-01-01T00:00:00.1234567", "2020-01-01T00:00:00.123456")) ==
      Seq(Seq("datetime_from_date_parsing"), Seq()))
  }

  // --------------------------------------------------- bytes encodings

  test("bytes mode=base64: decode + bytes_invalid_encoding (val_json_bytes, config.rs)") {
    val spec = BytesSpec(mode = BytesEncoding.Base64)
    val out = run(spec, StringType, Seq("aGkh", "x!", "abc", null))
    assert(out(0)._2 == Seq())
    assert(new String(out(0)._1.asInstanceOf[Array[Byte]]) == "hi!")
    assert(out(1)._2 == Seq("bytes_invalid_encoding"))
    assert(out(2)._2 == Seq()) // unpadded accepted like the Rust crate
    assert(out(3)._2 == Seq())
  }

  test("bytes mode=hex: decode + bytes_invalid_encoding") {
    val spec = BytesSpec(mode = BytesEncoding.Hex)
    val out = run(spec, StringType, Seq("686921", "x!", "abc"))
    assert(out(0)._2 == Seq())
    assert(new String(out(0)._1.asInstanceOf[Array[Byte]]) == "hi!")
    assert(out(1)._2 == Seq("bytes_invalid_encoding"))
    assert(out(2)._2 == Seq("bytes_invalid_encoding")) // odd length
  }

  test("bytes encoding_error: the reference's exact crate Display strings " +
      "(test_json.py:229,261,273; base64 0.22.1 / hex 0.4.3)") {
    import org.apache.spark.sql.functions._
    import graft.compile.Compiler
    def msgs(spec: Spec, inputs: Seq[String]): Seq[(String, String)] = {
      val schema = StructType(Seq(StructField("x", StringType)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(
        inputs.map(org.apache.spark.sql.Row(_)), 1), schema)
      val c = Compiler.compile(col("x"), StringType, array(lit("x")), spec,
        Mode.Lax)
      df.select(
          element_at(c.violations, 1).getField("msg"),
          element_at(c.violations, 1).getField("ctx").getItem("encoding_error"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    }
    // pydantic-core tests/test_json.py:229 — 'wrong!': '!' (33) at offset 5
    val b = msgs(BytesSpec(mode = BytesEncoding.Base64),
      Seq("wrong!", "aa=", "aaaaa", "ab"))
    assert(b(0) == (("Data should be valid base64: Invalid symbol 33, offset 5.",
      "Invalid symbol 33, offset 5.")))
    // partial padding under DecodePaddingMode::Indifferent
    assert(b(1)._2 == "Invalid padding")
    // 5 symbols, no padding -> symbols ≡ 1 (mod 4)
    assert(b(2)._2 == "Invalid input length: 5")
    // 'b' = 27 carries nonzero trailing bits in a 2-symbol tail
    assert(b(3)._2 == "Invalid last symbol 98, offset 1.")
    // test_json.py:261,273 — hex odd length, then Rust char-debug rendering
    val h = msgs(BytesSpec(mode = BytesEncoding.Hex), Seq("a", "ag"))
    assert(h(0) == (("Data should be valid hex: Odd number of digits",
      "Odd number of digits")))
    assert(h(1) == (("Data should be valid hex: Invalid character 'g' at position 1",
      "Invalid character 'g' at position 1")))
  }

  test("bytes mode=base64: URL_SAFE alphabet accepted with STANDARD fallback " +
      "(config.rs:91-96 two-engine decode)") {
    val spec = BytesSpec(mode = BytesEncoding.Base64)
    // '-_' (url-safe) and '+/' (standard, via fallback) both decode;
    // 'a-a+' mixes alphabets -> the fallback engine still errors
    val out = run(spec, StringType, Seq("-_-_", "+/+/", "a-a+"))
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq())
    assert(out(2)._2 == Seq("bytes_invalid_encoding"))
    // 111110 111111 111110 111111 -> 0xFB 0xFF 0xBF in both alphabets
    assert(out(0)._1.asInstanceOf[Array[Byte]].toSeq ==
      Array(0xfb, 0xff, 0xbf).map(_.toByte).toSeq)
    assert(out(1)._1.asInstanceOf[Array[Byte]].toSeq ==
      Array(0xfb, 0xff, 0xbf).map(_.toByte).toSeq)
  }

  test("bytes mode=base64 composes with byte-count length checks") {
    val spec = BytesSpec(minLength = Some(3), mode = BytesEncoding.Base64)
    // "aGk" decodes to "hi" (2 bytes) -> bytes_too_short
    assert(types(spec, StringType, Seq("aGkh", "aGk")) ==
      Seq(Seq(), Seq("bytes_too_short")))
  }

  // ------------------------------------------------- on_error = omit

  test("with_default on_error=omit: error swallowed, value omitted (with_default.rs:110-122)") {
    val spec = WithDefaultSpec(IntSpec(ge = Some(0)), default = "",
      onError = OnError.Omit)
    val out = run(spec, StringType, Seq("5", "-3", "zz"))
    assert(out(0) == ((5L, Seq())))
    assert(out(1) == ((null, Seq()))) // ge failed -> omitted
    assert(out(2) == ((null, Seq()))) // parse failed -> omitted
  }

  test("list of omit items drops the bad elements (the dropping-list idiom)") {
    val spec = ListSpec(WithDefaultSpec(IntSpec(), default = "",
      onError = OnError.Omit))
    val out = run(spec, ArrayType(StringType), Seq(Seq("1", "x", "3")))
    assert(out.head._2 == Seq())
    assert(out.head._1.asInstanceOf[scala.collection.Seq[Any]] == Seq(1L, 3L))
  }

  // ------------------------------------------------- validate_default

  test("validate_default: bad default emits its violation on defaulted rows (with_default.rs:204)") {
    // pydantic golden (2.13, x: int = Field('zz', validate_default=True)):
    // [{'type': 'int_parsing', 'loc': ('x',), 'input': 'zz', ...}]
    val spec = WithDefaultSpec(IntSpec(), default = "zz",
      validateDefault = true)
    val out = run(spec, StringType, Seq(null, "5"))
    assert(out(0)._2 == Seq("int_parsing"))
    assert(out(1) == ((5L, Seq())))
    // un-flagged: the default injects without validation (pydantic's
    // validate_default=False default behavior)
    val off = WithDefaultSpec(IntSpec(), default = "7")
    assert(run(off, StringType, Seq(null)).head == ((7L, Seq())))
  }

  test("validate_default: default is coerced and constrained like any input") {
    val low = WithDefaultSpec(IntSpec(ge = Some(10)), default = "7",
      validateDefault = true)
    assert(run(low, StringType, Seq(null)).head._2 == Seq("greater_than_equal"))
    val ok = WithDefaultSpec(IntSpec(ge = Some(10)), default = "27",
      validateDefault = true)
    assert(run(ok, StringType, Seq(null)).head == ((27L, Seq())))
  }

  test("omit keeps legitimately-valid null elements (drop on error, not on nullness)") {
    // Nullable OVER the omitting default: a null element is valid (nullable
    // passes it through) and must survive the omit filter; only elements
    // whose inner validation errored are dropped (with_default.rs:110-122)
    val spec = ListSpec(NullableSpec(WithDefaultSpec(IntSpec(ge = Some(0)),
      default = "0", onError = OnError.Omit)))
    val out = run(spec, ArrayType(StringType), Seq(Seq("1", null, "x", "-2")))
    assert(out.head._2 == Seq())
    assert(out.head._1.asInstanceOf[scala.collection.Seq[Any]] == Seq(1L, null))
  }

  test("omit nested under a chain is honored by the containing list") {
    val spec = ListSpec(ChainSpec(Seq(WithDefaultSpec(IntSpec(ge = Some(0)),
      default = "0", onError = OnError.Omit))))
    val out = run(spec, ArrayType(StringType), Seq(Seq("2", "-5", "7")))
    assert(out.head._2 == Seq())
    assert(out.head._1.asInstanceOf[scala.collection.Seq[Any]] == Seq(2L, 7L))
  }
}
