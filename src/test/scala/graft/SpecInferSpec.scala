package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import graft.compile.ModelValidator

/** SpecInfer: decision table, self-consistency (inferred spec ACCEPTS its
 * own sample), and JSON Schema round-trip of inferred specs. */
class SpecInferSpec extends SparkTestBase {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("email", StringType, nullable = true),
      StructField("tag", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false)))
    val rows = (0 until 100).map { i =>
      Row(i.toLong, s"user$i@example.com", Seq("a", "b", "c")(i % 3),
        if (i == 7) null else i / 10.0, i % 2 == 0)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  test("profile decision table: kinds, enum, pattern, bounds, nullable") {
    val p = SpecInfer.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getString(1) == "int")
    assert(p("id").getDouble(7) == 0.0 && p("id").getDouble(8) == 99.0)
    assert(p("email").getString(1) == "str")
    assert(p("email").getString(10) == "email") // first all-match pattern
    assert(p("tag").getString(1) == "enum")
    assert(p("tag").getString(9) == "a,b,c") // sorted observed values
    assert(p("score").getString(1) == "float" && p("score").getBoolean(2))
    assert(p("score").getLong(3) == 1L) // one observed null
    assert(p("flag").getString(1) == "bool" && !p("flag").getBoolean(2))
  }

  test("inferred spec validates its own sample with zero violations") {
    val m = SpecInfer.infer(df, "sample")
    val out = ModelValidator.validate(df, m)
    assert(out.filter(!col(ModelValidator.VALID)).count() == 0)
    // and the suggested bounds BITE outside the sample: id=100 violates le
    val bad = df.limit(1).select((col("id") + 100).as("id"), col("email"),
      col("tag"), col("score"), col("flag"))
    assert(ModelValidator.validate(bad, m)
      .filter(!col(ModelValidator.VALID)).count() == 1)
  }

  test("inferred spec round-trips through JSON Schema export/import") {
    val m = SpecInfer.infer(df, "sample")
    val once = JsonSchemaGen.toJson(m)
    val twice = JsonSchemaGen.toJson(JsonSchemaReader.fromJson(once))
    assert(once == twice)
  }

  test("profileDiff: added/removed/changed/same, breaking classification") {
    import spark.implicits._
    val a = Seq(
      (1L, "alpha", "x", 5.0, "old"),
      (2L, "beta-longer", "y", 9.0, "old"))
      .toDF("id", "name", "tag", "score", "gone")
    val b = Seq(
      (1L, "alpha", "x", 5.0, true),
      (2L, "beta", "z", 7.0, false)) // name narrowed, tag changed, score narrowed
      .toDF("id", "name", "tag", "score", "fresh")
    val d = SpecDiff.profileDiff(SpecInfer.profile(a), SpecInfer.profile(b))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("id").getString(1) == "same" && d("id").getInt(4) == 0)
    assert(d("gone").getString(1) == "removed" && d("gone").getInt(4) == 1)
    assert(d("fresh").getString(1) == "added" && d("fresh").getInt(4) == 0)
    // name: max_len 11 -> 5 narrowed (enum either side is still 2 distinct
    // -> both enum kind; 'beta-longer' removed + 'beta' added)
    assert(d("name").getString(1) == "changed" && d("name").getInt(4) == 1)
    assert(d("name").getString(5).contains("len_narrowed"))
    // tag: enum y removed, z added -> breaking via enum_removed
    assert(d("tag").getString(5) == "enum_removed,enum_added")
    assert(d("tag").getInt(4) == 1)
    // score: max 9 -> 7 num_narrowed
    assert(d("score").getString(5) == "num_narrowed" && d("score").getInt(4) == 1)
  }

  test("approx profile: HLL distinct, no enum extraction") {
    val p = SpecInfer.profile(df, approx = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("tag").getString(1) == "str") // enum promotion disabled
    assert(p("tag").isNullAt(9))
    assert(p("tag").getLong(4) > 0) // HLL estimate present
  }
}
