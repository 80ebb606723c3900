package graft

import org.apache.spark.sql.functions._

import graft.text.{CodeOps, TextOps}

/** The SQL surface (`GraftExtensions`): every registered `graft_*`
 * function must resolve from `spark.sql` and agree with the Column API
 * it wraps. */
class ExtensionsSpec extends SparkTestBase {

  import spark.implicits._

  GraftExtensions.install(spark)

  test("every registry entry resolves from SQL") {
    GraftExtensions.registry.foreach { case (name, _, _) =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        name)
    }
  }

  test("graft_hash60 / normalize / alnum agree with the Column API") {
    val df = Seq("Hello, World!", "x = 1 // c", "").toDF("s")
    df.createOrReplaceTempView("t_ext")
    val sql = spark.sql(
      """SELECT graft_hash60(s) h, graft_normalize_code(s) n,
        |graft_alnum_frac(s) a FROM t_ext""".stripMargin).collect()
    val api = df.select(TextOps.hash60($"s"), CodeOps.normalizeCode($"s"),
      CodeOps.alnumFrac($"s")).collect()
    assert(sql.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
  }

  test("native expressions register: vector_dot, fraction_reduce") {
    val r = spark.sql(
      """SELECT graft_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) d,
        |       graft_fraction_reduce(6L, -4L) f,
        |       graft_double_to_fraction(0.5D) g""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[Long](1) == Seq(-3L, 2L))
    assert(r.getSeq[Long](2) == Seq(1L, 2L))
  }

  test("code + extras functions from pure SQL") {
    val r = spark.sql(
      """SELECT graft_strip_comments('// gone\nkeep\n', 'scala') s,
        |       graft_is_autogen('// AUTO-GENERATED, do not edit\nx') g,
        |       graft_extract_imports('import lib7\n', 'python') i,
        |       graft_luhn_valid('4242424242424242') l,
        |       graft_parse_bytesize('1.5KiB') b""".stripMargin)
      .collect().head
    assert(r.getString(0) == "keep\n")
    assert(r.getBoolean(1))
    assert(r.getSeq[String](2) == Seq("lib7"))
    assert(r.getBoolean(3))
    assert(r.getLong(4) == 1536L)
  }

  test("ip functions from pure SQL") {
    val r = spark.sql(
      """SELECT graft_ip_address('2001:DB8::FF00:42:8329') a,
        |       graft_ip_interface('1.2.3.0/255.255.255.0') i,
        |       graft_ip_network('1.2.3.4/24') n""".stripMargin)
      .collect().head
    assert(r.getString(0) == "2001:db8::ff00:42:8329")
    assert(r.getString(1) == "1.2.3.0/24")
    assert(r.isNullAt(2)) // host bits set -> strict network rejects
  }

  test("wrong arity fails analysis, not execution") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hash60('a', 'b')").collect()
    }
    assert(e.getMessage.contains("graft_hash60"))
  }
}
