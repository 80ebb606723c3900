package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compile.ModelValidator
import graft.spec._

/** Alias lookup — AliasChoices (flat, ordered) and AliasPath (nested
 * struct/array navigation). Reference: `pydantic/aliases.py:15,57`,
 * `pydantic-core/src/lookup_key.rs`. */
class AliasSpec extends SparkTestBase {

  test("flat alias choices are tried in order (first present wins)") {
    val model = ModelSpec("m", Seq(
      FieldSpec("name", StrSpec(minLength = Some(2)),
        aliases = Seq("full_name", "username"))))
    val schema = StructType(Seq(StructField("username", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("ok")), 1), schema)
    val out = ModelValidator.validate(df, model).collect().head
    assert(out.getAs[String]("name") == "ok")
    assert(out.getAs[Boolean]("valid"))
  }

  test("AliasPath navigates nested structs and array indices") {
    // field 'name' <- AliasPath('data', 0, 'name'); field 'n' <- ('meta','n')
    val model = ModelSpec("m", Seq(
      FieldSpec("name", StrSpec(minLength = Some(2)),
        aliasPaths = Seq(Seq("data", "0", "name"))),
      FieldSpec("n", IntSpec(ge = Some(0)),
        aliasPaths = Seq(Seq("meta", "n")))))
    val schema = StructType(Seq(
      StructField("data", ArrayType(StructType(Seq(
        StructField("name", StringType))))),
      StructField("meta", StructType(Seq(StructField("n", LongType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(Row("alice")), Row(5L)),
        Row(Seq(Row("x")), Row(-1L)),   // too short + negative
        Row(Seq.empty[Row], Row(2L))    // index 0 missing -> null -> missing
      ), 1), schema)
    val out = ModelValidator.plan(df, model)
      .select(col("name"), col("n"),
        transform(col(ModelValidator.VIOLATIONS),
          v => v.getField("type")).as("types"))
      .collect()
    assert(out(0).getAs[String]("name") == "alice" &&
      out(0).getAs[Long]("n") == 5L &&
      out(0).getSeq[String](2).isEmpty)
    assert(out(1).getSeq[String](2).toSet ==
      Set("string_too_short", "greater_than_equal"))
    assert(out(1).getAs[Long]("n") == -1L ||
      out(1).isNullAt(1) == false) // coerced value still present
    assert(out(2).getSeq[String](2).contains("missing"))
  }

  test("unresolvable AliasPath falls through to missing") {
    val model = ModelSpec("m", Seq(
      FieldSpec("x", IntSpec(), aliasPaths = Seq(Seq("nope", "deep")))))
    val schema = StructType(Seq(StructField("other", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L)), 1), schema)
    val out = ModelValidator.plan(df, model)
      .select(transform(col(ModelValidator.VIOLATIONS),
        v => v.getField("type")).as("t")).collect().head
    assert(out.getSeq[String](0) == Seq("missing"))
  }
}
