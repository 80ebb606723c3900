package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import graft.compile.Compiler

/** Multi-host URL / DSN defaults (`networks.py:731-999`) and the union
 * plan-size regression guard (round-1 compiled every Smart branch 3x). */
class UrlAndPlanSizeSpec extends SparkTestBase {

  test("multi-host DSN: comma-separated authority, each host checked (url.rs multi-host)") {
    val spec = UrlSpec(allowedSchemes = Seq("postgres"), multiHost = true)
    val out = run(spec, StringType, Seq(
      "postgres://h1:5432,h2:5432/db",
      "postgres://user:pw@h1,user@h2/db",
      "postgres://h1,,h2/db",        // empty middle host
      "mysql://h1,h2/db",            // wrong scheme
      "not a url"))
    assert(out(0)._2 == Seq() && out(0)._1 == "postgres://h1:5432,h2:5432/db")
    assert(out(1)._2 == Seq())
    assert(out(2)._2 == Seq("url_parsing"))
    assert(out(3)._2 == Seq("url_scheme"))
    assert(out(4)._2 == Seq("url_parsing"))
  }

  test("DSN default host/port/path filling (UrlConstraints)") {
    val spec = UrlSpec(defaultHost = Some("localhost"),
      defaultPort = Some(5432), defaultPath = Some("/db"))
    val out = run(spec, StringType, Seq(
      "postgres://user@host/other",     // port filled only
      "postgres://host:9999/db",        // nothing filled
      "postgres://host"))               // port + path filled
    assert(out(0)._1 == "postgres://user@host:5432/other")
    assert(out(1)._1 == "postgres://host:9999/db")
    assert(out(2)._1 == "postgres://host:5432/db")
    assert(out.forall(_._2.isEmpty))
  }

  test("8-branch smart union over a 6-field model: failure bundle reuses branches (plan-size regression)") {
    val branch = (i: Int) => ModelSpec(s"m$i", (0 until 6).map(j =>
      FieldSpec(s"f$j", IntSpec(ge = Some(i.toLong)))): Seq[FieldSpec])
    val union = UnionSpec((0 until 8).map(branch), UnionMode.Smart)
    val st = StructType((0 until 6).map(j => StructField(s"f$j", LongType)))
    val schema = StructType(Seq(StructField("s", st)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(Row(1L, 1L, 1L, 1L, 1L, 1L))), 1), schema)
    val c = Compiler.compile(col("s"), st, array(lit("s")), union, Mode.Lax)
    val out = df.select(c.value.as("v"), c.violations.as("viol"))
    val nodes = out.queryExecution.analyzed.expressions
      .map(_.collect { case e => e }.size).sum
    // Column composition duplicates branch trees per REFERENCE (codegen
    // dedupes via subexpression elimination, but analyzed-plan size is the
    // 64KB-cliff risk). Measured 26532 nodes with the failure bundle
    // reusing the lax branches; the round-1 shape (a third compilation)
    // adds ~8 more branch trees (~+5k). Guard between the two.
    assert(nodes < 29000, s"union expression tree grew to $nodes nodes")
    // and the projection must stay inside whole-stage codegen
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen stage in:\n$plan")
    assert(out.collect().length == 1)
  }
}
