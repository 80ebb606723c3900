package graft

import org.apache.spark.sql.functions._

import graft.compile.ModelValidator
import graft.data.NorthStar

/** The exploded-list scale path must agree with the inline HOF path. */
class ExplodedListSpec extends SparkTestBase {

  import spark.implicits._

  test("exploded list validation matches the inline path (violation multisets)") {
    val people = NorthStar.generate(spark, 2000L).cache()
    def summarize(df: org.apache.spark.sql.DataFrame) = df
      .select(col("row_id"),
        explode(col(ModelValidator.VIOLATIONS)).as("v"))
      .select(col("row_id"), concat_ws("/", col("v.loc")).as("loc"),
        col("v.type").as("t"))
      .as[(Long, String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sorted).toMap
    val inline = summarize(ModelValidator.plan(people, NorthStar.personSpec))
    val exploded = summarize(ModelValidator.planExplodedList(
      people, NorthStar.personSpec, "row_id", "websites"))
    assert(inline == exploded)
    // verdicts agree too
    val vi = ModelValidator.plan(people, NorthStar.personSpec)
      .filter(col(ModelValidator.VALID)).count()
    val ve = ModelValidator.planExplodedList(people, NorthStar.personSpec,
      "row_id", "websites").filter(col(ModelValidator.VALID)).count()
    assert(vi == ve)
    people.unpersist()
  }

  test("size constraints enforced on the scalar side of the exploded path") {
    val model = NorthStar.personSpec.copy(fields =
      NorthStar.personSpec.fields.map { f =>
        if (f.name == "websites")
          f.copy(spec = graft.spec.ListSpec(NorthStar.websiteSpec,
            minLength = Some(2)))
        else f
      })
    val people = NorthStar.generate(spark, 500L)
    val out = ModelValidator.planExplodedList(people, model, "row_id", "websites")
      .select(explode(col(ModelValidator.VIOLATIONS)).as("v"))
      .select(col("v.type")).as[String].collect()
    assert(out.contains("too_short")) // rows with a single website flagged
  }
}
