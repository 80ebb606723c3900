package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.spec._
import graft.compile.{Compiler, ModelValidator}

object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Table-driven fixture harness mirroring the reference's per-validator
 * parametric tests (`pydantic-core/tests/conftest.py:60-111`,
 * `tests/validators/test_*.py`): each case = (input, expected violation
 * types) run through the compiled expression on a one-column DataFrame. */
abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** Run `spec` over `values` of Spark type `dt`; returns per-row
   * (coerced value, violation type strings). */
  def run(spec: Spec, dt: DataType, values: Seq[Any],
          mode: Mode = Mode.Lax): Seq[(Any, Seq[String])] = {
    val schema = StructType(Seq(StructField("x", dt, nullable = true)))
    val rows = values.map(v => Row(v))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row), 1), schema)
    val c = Compiler.compile(col("x"), dt, array(lit("x")), spec, mode)
    val out = df.select(c.value.as("v"),
      transform(c.violations, x => x.getField("type")).as("t"))
      .collect()
    out.toSeq.map(r => (r.get(0), r.getSeq[String](1)))
  }

  /** Violation types only. */
  def types(spec: Spec, dt: DataType, values: Seq[Any],
            mode: Mode = Mode.Lax): Seq[Seq[String]] =
    run(spec, dt, values, mode).map(_._2)

  def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (a, b, c) => Row(a, b, c) }, 2), schema)
  }
}
