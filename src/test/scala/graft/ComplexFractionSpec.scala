package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._

/**
 * ComplexSpec + FractionSpec — fixtures transcribed from live
 * pydantic-core runs (`SchemaValidator(complex_schema())`, this repo's
 * reference checkout) and Python `complex()` / `fractions.Fraction`
 * semantics, which the reference validators delegate to
 * (`complex.rs:66-93`, `fraction.rs:141-175`).
 */
class ComplexFractionSpec extends SparkTestBase {
  import spark.implicits._

  private def cx(values: Seq[String]): Seq[(Option[(Double, Double)], Seq[String])] =
    run(ComplexSpec, StringType, values).map { case (v, t) =>
      val p = Option(v).map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.Row]
        (row.getDouble(0), row.getDouble(1))
      }
      (p, t)
    }

  test("complex: accepted string forms parse like complex() (pydantic-core run)") {
    val cases = Seq(
      "1+2j" -> (1.0, 2.0), "-1.5e-3-2J" -> (-0.0015, -2.0),
      "j" -> (0.0, 1.0), "-j" -> (0.0, -1.0), "+J" -> (0.0, 1.0),
      "3" -> (3.0, 0.0), "3.5" -> (3.5, 0.0),
      " (1+2j) " -> (1.0, 2.0), "( 1+2j )" -> (1.0, 2.0),
      "(3)" -> (3.0, 0.0), "+1-2j" -> (1.0, -2.0),
      ".5+.5j" -> (0.5, 0.5), "5.+2.j" -> (5.0, 2.0),
      "1_000+2j" -> (1000.0, 2.0), "1e10j" -> (0.0, 1.0e10),
      "1e1_0j" -> (0.0, 1.0e10), "1.5e3+2.5e-1j" -> (1500.0, 0.25))
    val out = cx(cases.map(_._1))
    cases.zip(out).foreach { case ((in, exp), (got, viol)) =>
      assert(viol.isEmpty, s"$in violations $viol")
      assert(got.contains(exp), s"$in -> $got")
    }
    // inf / nan specials
    val sp = cx(Seq("infj", "1+infj", "nan+nanj", "-inf-infj"))
    assert(sp(0)._1.get == ((0.0, Double.PositiveInfinity)))
    assert(sp(1)._1.get == ((1.0, Double.PositiveInfinity)))
    assert(sp(2)._1.get._1.isNaN && sp(2)._1.get._2.isNaN)
    assert(sp(3)._1.get ==
      ((Double.NegativeInfinity, Double.NegativeInfinity)))
  }

  test("complex: rejected strings -> complex_str_parsing") {
    val bad = Seq("(1+2j", "1 + 2j", "2j+1", "", "abc", "1+2i", "((1+2j))",
      "1__0+2j", "_1+2j")
    cx(bad).foreach { case (v, t) =>
      assert(v.isEmpty && t == Seq("complex_str_parsing"), s"$v $t")
    }
  }

  test("complex: numeric and struct inputs; other types -> complex_type") {
    val n = run(ComplexSpec, LongType, Seq(3L, null))
    assert(n(0)._1.asInstanceOf[org.apache.spark.sql.Row].getDouble(0) == 3.0)
    assert(n(0)._1.asInstanceOf[org.apache.spark.sql.Row].getDouble(1) == 0.0)
    assert(n(1) == ((null, Seq())))
    val t = types(ComplexSpec, ArrayType(LongType), Seq(Seq(1L)))
    assert(t == Seq(Seq("complex_type")))
  }

  test("complex: to_json rendering matches the reference goldens") {
    import graft.serialize.Serializer
    val df = Seq((1.0, 2.0), (0.0, 2.0), (1.5, -2.5), (3.0, 0.0), (0.0, 0.0),
      (Double.PositiveInfinity, 1.0), (1e20, 0.0001),
      // negative zeros keep their sign, exactly like Python repr:
      // complex(1,-0.0) -> '1-0j', complex(-0.0,2) -> '-0+2j',
      // complex(0.0,-0.0) -> '-0j', complex(-0.0,-0.0) -> '-0-0j'
      (1.0, -0.0), (-0.0, 2.0), (0.0, -0.0), (-0.0, -0.0))
      .toDF("re", "im")
    val out = df.select(Serializer.complexJson(struct(col("re"), col("im"))))
      .as[String].collect().toSeq
    assert(out == Seq("1+2j", "2j", "1.5-2.5j", "3+0j", "0j", "inf+1j",
      "100000000000000000000+0.0001j", "1-0j", "-0+2j", "-0j", "-0-0j"))
  }

  // ------------------------------------------------------------- fraction

  private def fr(values: Seq[Any], dt: DataType = StringType,
                 spec: Spec = FractionSpec()): Seq[(Option[(Long, Long)], Seq[String])] =
    run(spec, dt, values).map { case (v, t) =>
      val p = Option(v).map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.Row]
        (row.getLong(0), row.getLong(1))
      }
      (p, t)
    }

  test("fraction: string grammar parses and reduces like Fraction()") {
    val cases = Seq(
      "3/4" -> (3L, 4L), " 3/4 " -> (3L, 4L), "-3/4" -> (-3L, 4L),
      "6/8" -> (3L, 4L), "1.5" -> (3L, 2L), "7" -> (7L, 1L),
      "2e-3" -> (1L, 500L), "5." -> (5L, 1L), ".5" -> (1L, 2L),
      "1_0/4" -> (5L, 2L), "1.5e3" -> (1500L, 1L))
    val out = fr(cases.map(_._1))
    cases.zip(out).foreach { case ((in, exp), (got, viol)) =>
      assert(viol.isEmpty, s"$in violations $viol")
      assert(got.contains(exp), s"$in -> $got")
    }
  }

  test("fraction: parse failures -> fraction_parsing (ValueError/ZeroDivision)") {
    val bad = Seq("3/0", "x", "", "3 / 4", "1/2/3", "inf")
    fr(bad).foreach { case (v, t) =>
      assert(v.isEmpty && t == Seq("fraction_parsing"), s"$v $t")
    }
  }

  test("fraction: oversized input -> fraction_parsing, never an ANSI throw") {
    // Grammar-matched strings whose exponent/significand/denominator exceed
    // the Long-bounded budget previously hit unguarded ANSI casts
    // (SparkNumberFormatException killed the job on one dirty row).
    val big = Seq(
      "1e99999999999", "1e-99999999999", "1e+99999999999",
      "9999999999999999999",               // 19-digit significand
      "1/9999999999999999999999999",       // 25-digit denominator
      "1.5e1000000000000000000", "123456789012345678901234567890")
    fr(big).foreach { case (v, t) =>
      assert(v.isEmpty && t == Seq("fraction_parsing"), s"$v $t")
    }
    // boundary cases that must still parse
    val ok = fr(Seq("999999999999999999", "1e9", "1e-9",
      "1/999999999999999999"))
    assert(ok(0)._1.contains((999999999999999999L, 1L)))
    assert(ok(1)._1.contains((1000000000L, 1L)))
    assert(ok(2)._1.contains((1L, 1000000000L)))
    assert(ok(3)._1.contains((1L, 999999999999999999L)))
  }

  test("fraction: int and float inputs (exact binary ratio)") {
    val i = fr(Seq(3L, null), LongType)
    assert(i(0)._1.contains((3L, 1L)) && i(1) == ((None, Seq())))
    val d = fr(Seq(0.5, 0.1, 1.0 / 3.0), DoubleType)
    assert(d(0)._1.contains((1L, 2L)))
    // Fraction(0.1) — the exact binary ratio, pinned from Python
    assert(d(1)._1.contains((3602879701896397L, 36028797018963968L)))
    assert(d(2)._1.contains((6004799503160661L, 18014398509481984L)))
    // NaN/Inf raise in Fraction() -> fraction_parsing
    val s = fr(Seq(Double.NaN, Double.PositiveInfinity), DoubleType)
    s.foreach { case (v, t) =>
      assert(v.isEmpty && t == Seq("fraction_parsing"))
    }
  }

  test("fraction: ordered constraints cross-multiply; bound renders like str(Fraction)") {
    val ge = FractionSpec(ge = Some("1/2"))
    val out = fr(Seq("3/4", "1/4", "-2"), spec = ge)
    assert(out(0)._2 == Seq())
    assert(out(1)._2 == Seq("greater_than_equal"))
    assert(out(2)._2 == Seq("greater_than_equal"))
    val lt = FractionSpec(lt = Some("2"))
    assert(fr(Seq("9/4"), spec = lt).head._2 == Seq("less_than"))
    // message carries the reduced str(Fraction) bound
    import graft.compile.Compiler
    val df = Seq("1/4").toDF("x")
    val c = Compiler.compile(col("x"), StringType, array(lit("x")),
      FractionSpec(ge = Some("2/4")), Mode.Lax)
    val msg = df.select(element_at(c.violations, 1).getField("msg"))
      .as[String].head()
    assert(msg == "Input should be greater than or equal to 1/2")
  }

  test("fraction: strict accepts only the Fraction-object analog (is_instance_of)") {
    assert(types(FractionSpec(strict = Some(true)), StringType, Seq("3/4")) ==
      Seq(Seq("is_instance_of")))
    assert(types(FractionSpec(strict = Some(true)), LongType, Seq(3L)) ==
      Seq(Seq("is_instance_of")))
    val st = StructType(Seq(StructField("num", LongType),
      StructField("den", LongType)))
    val out = run(FractionSpec(strict = Some(true)), st,
      Seq(org.apache.spark.sql.Row(6L, 8L)))
    assert(out.head._2 == Seq())
    val r = out.head._1.asInstanceOf[org.apache.spark.sql.Row]
    assert((r.getLong(0), r.getLong(1)) == ((3L, 4L)))
  }

  test("two-projection split keeps the q_complex plan bounded (29s regression guard)") {
    // the oracle query inlines the parse into 4+ outputs; the projection
    // boundary must survive optimization or the grammar regexes evaluate
    // ~30x per row (measured 29.3s at sf0.1 when it collapsed)
    val df = Seq("1+2j").toDF("c")
    import graft.compile.Compiler
    import graft.serialize.Serializer
    val cc = Compiler.compile(col("c"), StringType, array(lit("z")),
      ComplexSpec, Mode.Lax)
    val split = df
      .select(col("c"), cc.value.as("__cx"), size(cc.violations).as("__nv"))
      .select((col("__nv") === 0).as("ok"), col("__cx.re"), col("__cx.im"),
        Serializer.complexJson(col("__cx")).as("cjson"))
    val optNodes = split.queryExecution.optimizedPlan.expressions
      .map(_.collect { case e => e }.size).sum
    // one materialized parse (~1.5k nodes incl. complexJson) — the
    // collapsed form measured ~8x that; guard well under it
    assert(optNodes < 6000, s"q_complex optimized plan grew to $optNodes nodes")
    assert(split.collect().length == 1)
  }

  test("fraction: to_json renders str(Fraction)") {
    import graft.serialize.Serializer
    val df = Seq((3L, 4L), (3L, 1L), (-3L, 4L)).toDF("num", "den")
    val out = df.select(Serializer.fractionJson(struct(col("num"), col("den"))))
      .as[String].collect().toSeq
    assert(out == Seq("3/4", "3", "-3/4"))
  }
}
