package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY profiling scratchpad for the r06 optimization round. */
object ProfOpt {
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.OFF)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scrub = graft.text.TextOps.spanScrub(docs, "doc_id", "text", 20)
    val aff = scrub.filter(col("n_removed") > 0).count()
    println(s"affected: $aff / ${docs.count()}")
    spark.sharedState.cacheManager.clearCache()

    // north-star breakdown
    val ns = graft.data.NorthStar.generate(spark, 500000L)
    time("ns_gen_only") { force(ns) }
    time("ns_gen_scalar_cols") {
      force(ns.drop("websites"))
    }
    time("ns_gen_websites_only") {
      force(ns.select(col("row_id"), col("websites")))
    }
    val plan = graft.compile.ModelValidator.planAuto(
      graft.data.NorthStar.generate(spark, 500000L),
      graft.data.NorthStar.personSpec, "row_id")
    time("ns_plan_full") { force(plan) }
    time("ns_plan_full_again") { force(plan) }
    def fresh() = graft.compile.ModelValidator.planAuto(
      graft.data.NorthStar.generate(spark, 500000L),
      graft.data.NorthStar.personSpec, "row_id")
    time("ns_fresh_planning_only") {
      fresh().queryExecution.executedPlan
    }
    time("ns_fresh_planning_only2") {
      fresh().queryExecution.executedPlan
    }
    time("ns_fresh_force_1") { force(fresh()) }
    time("ns_fresh_force_2") { force(fresh()) }
    def freshT() = graft.compile.ModelValidator.planAuto(
      graft.data.NorthStar.generate(spark, 500000L).localCheckpoint(false),
      graft.data.NorthStar.personSpec, "row_id")
    time("nsT_planning_only") { freshT().queryExecution.executedPlan }
    time("nsT_planning_only2") { freshT().queryExecution.executedPlan }
    time("nsT_force_1") { force(freshT()) }
    time("nsT_force_2") { force(freshT()) }
    time("nsT_force_3") { force(freshT()) }
    spark.stop()
  }
}
