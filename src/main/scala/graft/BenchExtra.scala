package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper (guide §1.4): time individual SparkEntry
 * queries in isolation with the same session shape as [[Bench]], min of
 * N timed runs after one warm run, cache cleared between runs exactly
 * like the frozen harness. NOT part of the driver contract — Bench.scala
 * is the measured artifact; this exists so per-query before/after deltas
 * can be measured without paying the full 131-query sweep.
 *
 * Usage: sbt "runMain graft.BenchExtra q1 q2 ..."   (no args = heavy set)
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPEATS (default 2),
 *      SPARK_GRAFT_EXPLAIN_DIR (also dump .explain("formatted") per query).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "2").toInt
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

    val heavy = Seq("d_components", "p_code_clean", "w_canonical",
      "p_corpus_clean", "d_jaccard_ngram", "w_hits", "t_decontam",
      "c_near_dup", "w_triangles", "t_span_scrub", "w_kcore", "w_trustrank",
      "w_pipeline", "w_pagerank", "w_labelprop", "d_minhash_lsh")
    val names = if (args.nonEmpty) args.toSeq else heavy
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      explainDir.foreach { d =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"$name.txt"), txt)
        spark.sharedState.cacheManager.clearCache()
      }
      spark.sparkContext.setJobDescription(s"warm:$name")
      val warm = Bench.time(Bench.force(fn(spark, sfDir)))
      spark.sharedState.cacheManager.clearCache()
      val timed = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"timed:$name:$i")
        val t = Bench.time(Bench.force(fn(spark, sfDir)))
        spark.sharedState.cacheManager.clearCache()
        t
      }
      println(f"EXTRA $name%-18s warm=$warm%7.3f min=${timed.min}%7.3f " +
        timed.map(t => f"$t%.3f").mkString("runs=[", ",", "]"))
      name -> timed.min
    }
    println(results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("EXTRA_JSON {", ",", "}"))
    spark.stop()
  }
}
