package graft

import org.apache.spark.sql.SparkSession

import graft.run.Runner

/**
 * spark-submit entrypoint for cluster runs (north star: "launches via
 * spark-submit on multi-executor clusters"):
 *
 *   spark-submit --class graft.Main pydanticspark.jar \
 *     <inputPathOrGEN:rows> <outDir> [buckets] [waveSize]
 *
 * Input is a parquet directory with the source-files schema
 * (repo, path, commit, lang, content), or "GEN:<rows>" to run on the
 * deterministic synthetic generator. The run is checkpointed to <outDir>
 * (see run.Runner); re-submitting the same command resumes.
 *
 * Cluster-relevant conf is left to spark-submit (--num-executors etc.);
 * only engine-level settings are fixed here.
 */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Main <inputPath|GEN:rows> <outDir> [buckets] [waveSize]")
    val input = args(0)
    val outDir = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 64
    val waveSize = if (args.length > 3) args(3).toInt else 16
    val spark = SparkSession.builder()
      .appName("graft-validate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df =
      if (input.startsWith("GEN:"))
        data.SourceFilesGen.generate(spark, input.stripPrefix("GEN:").toLong)
      else spark.read.parquet(input)
    val report = Runner.run(spark, df, Bench.sourceFileModel,
      keyCol = "repo", contentCol = "content", outDir = outDir,
      buckets = buckets, waveSize = waveSize)
    println(
      s"""{"buckets":${report.buckets},"skipped":${report.skipped.size},""" +
        s""""ran":${report.ran.size},"passed":${report.passed.size},""" +
        s""""failed":${report.failed.size}}""")
    spark.stop()
  }
}
