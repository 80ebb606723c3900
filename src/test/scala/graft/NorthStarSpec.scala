package graft

import org.apache.spark.sql.functions._

import graft.compile.ModelValidator
import graft.data.NorthStar

/** Integration test of the reference's north-star composite model
 * (`tests/benchmarks/test_north_star.py`): UUID/decimal/date/time/datetime
 * fields + a list of two-level discriminated unions, validated from lax
 * string inputs in ONE compiled plan. */
class NorthStarSpec extends SparkTestBase {

  import spark.implicits._

  lazy val people = NorthStar.generate(spark, 4000L).cache()

  test("composite model validates lax strings end-to-end; injected violations surface") {
    val planned = ModelValidator.plan(people, NorthStar.personSpec).cache()
    val total = planned.count()
    val valid = planned.filter(col(ModelValidator.VALID)).count()
    assert(total == 4000L)
    // most rows valid; the ~5% injection plus union-shape misses flag some
    assert(valid > total * 7 / 10 && valid < total)
    val types = planned
      .select(explode(col(ModelValidator.VIOLATIONS)).as("v"))
      .select(col("v.type")).as[String].collect().toSet
    assert(types.contains("uuid_parsing"))       // bad uuid injection
    assert(types.contains("less_than_equal"))    // rating 9.5 / connections 501
    assert(types.contains("string_too_short"))   // empty username
    planned.unpersist()
  }

  test("nested union violations carry full loc paths (field -> index -> field)") {
    val planned = ModelValidator.plan(people, NorthStar.personSpec)
    val locs = planned
      .select(explode(col(ModelValidator.VIOLATIONS)).as("v"))
      .select(col("v.loc")).as[Seq[String]].collect()
    // list element loc: websites / <idx> / <field>
    assert(locs.exists(l => l.length >= 3 && l.head == "websites" &&
      l(1).forall(_.isDigit)))
  }

  test("deterministic: same seed, same verdict counts") {
    def invalids() = ModelValidator.plan(
      NorthStar.generate(spark, 1500L), NorthStar.personSpec)
      .filter(!col(ModelValidator.VALID)).count()
    assert(invalids() == invalids())
  }
}
