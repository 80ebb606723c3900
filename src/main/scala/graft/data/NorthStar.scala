package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spec._

/**
 * The reference's north-star composite benchmark, mirrored
 * (`/root/reference/tests/benchmarks/test_north_star.py:22-60`): a Person
 * record with UUID / decimal / date / time / datetime fields plus a list
 * of two-level discriminated unions
 * (Website = tagged on `type` -> Blog | SocialProfile tagged on `network`),
 * validated from LAX string inputs (the validate_strings dialect — the
 * generator renders every leaf as a string like the reference's Faker
 * `lax_int`/`lax_time` variants render Python strs).
 *
 * Deterministic: all values derive from xxhash64(id, seed) expressions —
 * distributed generation, no driver data.
 */
object NorthStar {

  /** Website tagged union: type -> blog | profile; profile nests a second
   * discriminator on network (exactly the reference's two-level shape). */
  val websiteSpec: Spec = TaggedUnionSpec("type", Seq(
    "blog" -> ModelSpec("Blog", Seq(
      FieldSpec("type", LiteralSpec(Seq("blog"))),
      FieldSpec("title", StrSpec(minLength = Some(1))),
      FieldSpec("post_count", IntSpec(ge = Some(0))),
      FieldSpec("readers", IntSpec(ge = Some(0))),
      FieldSpec("avg_post_rating", FloatSpec(ge = Some(0.0), le = Some(5.0))),
      FieldSpec("url", UrlSpec(allowedSchemes = Seq("http", "https"),
        hostRequired = true)))),
    "profile" -> TaggedUnionSpec("network", Seq(
      "facebook" -> ModelSpec("FacebookProfile", Seq(
        FieldSpec("network", LiteralSpec(Seq("facebook"))),
        FieldSpec("username", StrSpec(minLength = Some(1))),
        FieldSpec("join_date", DateSpec()),
        FieldSpec("friends", IntSpec(ge = Some(0))))),
      "twitter" -> ModelSpec("TwitterProfile", Seq(
        FieldSpec("network", LiteralSpec(Seq("twitter"))),
        FieldSpec("username", StrSpec(minLength = Some(1))),
        FieldSpec("join_date", DateSpec()),
        FieldSpec("followers", IntSpec(ge = Some(0))))),
      "linkedin" -> ModelSpec("LinkedinProfile", Seq(
        FieldSpec("network", LiteralSpec(Seq("linkedin"))),
        FieldSpec("username", StrSpec(minLength = Some(1))),
        FieldSpec("join_date", DateSpec()),
        // Field(le=500) — the reference's one bounded profile field
        FieldSpec("connections", IntSpec(le = Some(500)))))))))

  /** Person — `test_north_star.py:52-60`. All leaf inputs arrive as
   * strings (lax dialect); websites is a list of unified structs. */
  val personSpec: ModelSpec = ModelSpec("Person", Seq(
    FieldSpec("id", UuidSpec()),
    FieldSpec("name", StrSpec(minLength = Some(1))),
    FieldSpec("height", DecimalSpec(precision = 10, scale = 2,
      gt = Some(BigDecimal(0)))),
    FieldSpec("entry_created_date", DateSpec()),
    FieldSpec("entry_created_time", TimeSpec()),
    FieldSpec("entry_updated_at", DatetimeSpec()),
    FieldSpec("websites", ListSpec(websiteSpec))))

  /** Deterministic lax Person rows: ~5% of rows carry an injected
   * violation (bad uuid / oversize rating / missing username / >500
   * connections), mirroring the reference data's mixed-validity spirit. */
  def generate(spark: SparkSession, n: Long, seed: Long = 7L,
               partitions: Int = 0): DataFrame = {
    val ids = if (partitions > 0) spark.range(0L, n, 1L, partitions)
              else spark.range(n)
    val h = xxhash64(col("id"), lit(seed))
    val h2 = xxhash64(col("id"), lit(seed + 1))
    val h3 = xxhash64(col("id"), lit(seed + 2))
    val h4 = xxhash64(col("id"), lit(seed + 3))
    val h5 = xxhash64(col("id"), lit(seed + 4))
    def hex(c: org.apache.spark.sql.Column, len: Int) =
      substring(md5(c.cast("string")), 1, len)
    val badSel = pmod(h2, lit(100)) // 0..99; <5 => inject a violation
    val uuid = concat(hex(h, 8), lit("-"), hex(h2, 4), lit("-4"),
      hex(h3, 3), lit("-8"), hex(h4, 3), lit("-"), hex(h5, 12))
    val badUuid = when(badSel === 0, lit("not-a-uuid")).otherwise(uuid)
    val website = (i: Int) => {
      val hh = xxhash64(col("id"), lit(seed + 10 + i))
      val isBlog = pmod(hh, lit(2)) === 0
      val net = element_at(typedLit(Seq("facebook", "twitter", "linkedin")),
        pmod(hh, lit(3)).cast("int") + 1)
      struct(
        when(isBlog, "blog").otherwise("profile").as("type"),
        when(isBlog, concat(lit("post-"), pmod(hh, lit(997)).cast("string")))
          .as("title"),
        when(isBlog, pmod(hh, lit(10000)).cast("string")).as("post_count"),
        when(isBlog, pmod(hh, lit(1000000)).cast("string")).as("readers"),
        when(isBlog, when(badSel === 1 && lit(i) === 0, lit("9.5"))
          .otherwise((pmod(hh, lit(50)) / 10.0).cast("string")))
          .as("avg_post_rating"),
        when(isBlog, concat(lit("https://example"),
          pmod(hh, lit(100)).cast("string"), lit(".com/p"))).as("url"),
        when(!isBlog, net).as("network"),
        when(!isBlog, when(badSel === 2 && lit(i) === 0, lit(""))
          .otherwise(concat(lit("user"), pmod(hh, lit(99991)).cast("string"))))
          .as("username"),
        when(!isBlog, date_format(
          date_add(lit("2015-01-01").cast("date"),
            pmod(hh, lit(2900)).cast("int")), "yyyy-MM-dd")).as("join_date"),
        when(!isBlog && net === "facebook",
          pmod(hh, lit(5000)).cast("string")).as("friends"),
        when(!isBlog && net === "twitter",
          pmod(hh, lit(1000000)).cast("string")).as("followers"),
        when(!isBlog && net === "linkedin",
          when(badSel === 3 && lit(i) === 0, lit("501"))
            .otherwise(pmod(hh, lit(500)).cast("string"))).as("connections"))
    }
    val nSites = pmod(h2, lit(4)).cast("int") // 0..3 websites
    ids.select(
      col("id").as("row_id"),
      badUuid.as("id"),
      concat(lit("person-"), pmod(h, lit(100000)).cast("string")).as("name"),
      (pmod(h2, lit(8000)) / 100.0 + 0.5).cast("string").as("height"),
      date_format(date_add(lit("2000-01-01").cast("date"),
        pmod(h, lit(8000)).cast("int")), "yyyy-MM-dd").as("entry_created_date"),
      concat(lpad(pmod(h, lit(24)).cast("string"), 2, "0"), lit(":"),
        lpad(pmod(h2, lit(60)).cast("string"), 2, "0"), lit(":"),
        lpad(pmod(h3, lit(60)).cast("string"), 2, "0"))
        .as("entry_created_time"),
      concat(date_format(date_add(lit("2010-01-01").cast("date"),
        pmod(h2, lit(4700)).cast("int")), "yyyy-MM-dd"), lit("T"),
        lpad(pmod(h, lit(24)).cast("string"), 2, "0"), lit(":30:00"))
        .as("entry_updated_at"),
      slice(array(website(0), website(1), website(2)), lit(1), nSites + 1)
        .as("websites"))
  }
}
