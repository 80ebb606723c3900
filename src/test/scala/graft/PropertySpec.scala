package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.serialize.Serializer
import graft.spec._

/**
 * Property-based tests — reference parity with
 * `pydantic-core/tests/test_hypothesis.py` (SURVEY §5): roundtrip
 * (validate ∘ serialize = id on valid data), constraint monotonicity,
 * coercion laws. Plus the strict-mode 3-way matrix of
 * `pydantic-core/tests/conftest.py:114-129`.
 */
class PropertySpec extends SparkTestBase {

  // batch generated cases into ONE Spark job per property (a job per
  // sample would be minutes of overhead)
  private def intResults(spec: Spec, values: Seq[Long]): Seq[Seq[String]] =
    types(spec, LongType, values)

  test("property: int bound violations are exactly the complement of the bound") {
    val values = Gen.listOfN(200, Gen.chooseNum(-1000L, 1000L)).sample.get
    val gt = 17L
    val got = intResults(IntSpec(gt = Some(gt)), values)
    values.zip(got).foreach { case (v, viols) =>
      assert(viols.contains("greater_than") == (v <= gt),
        s"v=$v viols=$viols")
    }
  }

  test("property: tightening a constraint never un-flags a row (monotonicity)") {
    val values = Gen.listOfN(100, Gen.chooseNum(-100L, 100L)).sample.get
    val loose = intResults(IntSpec(ge = Some(0L)), values)
    val tight = intResults(IntSpec(ge = Some(50L)), values)
    loose.zip(tight).foreach { case (l, t) =>
      assert(l.isEmpty || t.nonEmpty) // flagged by loose => flagged by tight
    }
  }

  test("property: str->int lax coercion roundtrips rendered longs") {
    val values = Gen.listOfN(150, Gen.chooseNum(Long.MinValue / 2,
      Long.MaxValue / 2)).sample.get
    val got = run(IntSpec(), StringType, values.map(_.toString))
    values.zip(got).foreach { case (v, (coerced, viols)) =>
      assert(viols.isEmpty && coerced == v)
    }
  }

  test("property: serialize ∘ validate = id on valid rows (roundtrip)") {
    val model = ModelSpec("m", Seq(
      FieldSpec("a", IntSpec()), FieldSpec("b", StrSpec())))
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(-1000000L, 1000000L),
        Gen.alphaNumStr.map(_.take(40)))).sample.get
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
    val ok = df.select(Serializer.roundTripOk(df, model).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(ok)
  }

  // --- strict-mode matrix (conftest.py:114-129: strict-schema /
  // strict-call / both agree on outcomes)
  test("strict matrix: spec-level strict == call-level strict == both") {
    val values: Seq[Any] = Seq("42", 42L)
    def outcome(specStrict: Option[Boolean], mode: Mode) = {
      val schemaStr = types(IntSpec(strict = specStrict), StringType,
        Seq("42"), mode).head
      val schemaInt = types(IntSpec(strict = specStrict), LongType,
        Seq(42L), mode).head
      (schemaStr, schemaInt)
    }
    val specLevel = outcome(Some(true), Mode.Lax)
    val callLevel = outcome(None, Mode.Strict)
    val both = outcome(Some(true), Mode.Strict)
    assert(specLevel == callLevel && callLevel == both)
    assert(specLevel._1 == Seq("int_type")) // strict rejects string input
    assert(specLevel._2 == Nil)             // exact int passes
    // spec-level strict=false OVERRIDES call-level strict (types.py:123:
    // per-field Strict metadata wins over the call mode)
    val overridden = types(IntSpec(strict = Some(false)), StringType,
      Seq("42"), Mode.Strict).head
    assert(overridden == Nil)
  }
}
