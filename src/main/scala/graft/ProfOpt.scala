package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY profiling scratchpad for the r06 optimization round —
 * per-stage timings of the heaviest queries. Not part of any contract. */
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

    import graft.text.CodeOps
    import graft.dedup.Dedup

    // p_code_clean pieces: quality gate / license / redact / strip /
    // jaccard-on-norm. codeInput is the fixed 2000-file table.
    val code = spark.read.parquet(
      sys.env.getOrElse("GRAFT_CODE_INPUT", "/tmp/graft_code_input_v1"))
    println(s"code files: ${code.count()}")
    time("cc_quality_filter") {
      force(CodeOps.codeFilter(CodeOps.codeQuality(code, "id", "lang", "content")))
    }
    time("cc_license") { force(CodeOps.licenseScan(code, "id", "content")) }
    time("cc_redact") {
      force(code.select(col("id"), CodeOps.redactSecrets(col("content")).as("c")))
    }
    val keep = CodeOps.codeFilter(
        CodeOps.codeQuality(code, "id", "lang", "content"))
      .filter(col("keep")).select("id")
    val gated = code.join(keep, "id")
    time("cc_strip_boiler") {
      force(CodeOps.stripBoilerplate(
        gated.select(col("id"), col("lang"), col("content")), "id", "content", 20L))
    }
    val norm = CodeOps.nearDupNorm(gated)
    time("cc_norm_only") { force(norm) }
    time("cc_jaccard_norm") {
      force(Dedup.jaccardNgramPairs(norm, "id", "norm", 3, 1L, 2L,
        stagingDir = Some("/tmp/graft_prof_stage/cj")))
    }
    spark.sharedState.cacheManager.clearCache()
    time("p_code_clean_full") {
      force(SparkEntry.queries("p_code_clean")(spark, sfDir))
    }
    spark.sharedState.cacheManager.clearCache()

    // corpus clean pieces
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("pc_kept1") {
      force(docs.groupBy(col("text")).agg(min(col("doc_id")).as("id")))
    }
    time("pc_langid") {
      force(graft.text.TextOps.langIdDf(
        docs.select(col("doc_id").as("id"), col("text").as("__text")),
        "id", "__text", graft.text.TextOps.defaultProfiles))
    }
    time("p_corpus_clean_full") {
      force(SparkEntry.queries("p_corpus_clean")(spark, sfDir))
    }
    spark.sharedState.cacheManager.clearCache()

    // i_infer pieces
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    println(s"events: ${events.count()} cols=${events.schema.fieldNames.length}")
    time("i_infer_full") {
      force(SparkEntry.queries("i_infer")(spark, sfDir))
    }
    time("i_infer_again") {
      force(SparkEntry.queries("i_infer")(spark, sfDir))
    }
    spark.sharedState.cacheManager.clearCache()
    time("t_span_scrub_full") {
      force(SparkEntry.queries("t_span_scrub")(spark, sfDir))
    }
    time("t_dup_spans_full") {
      force(SparkEntry.queries("t_dup_spans")(spark, sfDir))
    }
    spark.sharedState.cacheManager.clearCache()
    time("w_triangles_full") {
      force(SparkEntry.queries("w_triangles")(spark, sfDir))
    }
    time("w_kcore_full") {
      force(SparkEntry.queries("w_kcore")(spark, sfDir))
    }
    spark.stop()
  }
}
