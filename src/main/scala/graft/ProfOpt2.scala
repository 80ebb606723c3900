package graft
import org.apache.spark.sql.SparkSession
/** r06 profiling scratchpad: planning-vs-execution split for
 * expression-tier queries (guide §7.3). Not part of any driver contract. */
object ProfOpt2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.OFF)
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      try {
        // NOTE: building the DataFrame itself executes staged writes /
        // iterative loops for some queries; planOnly still isolates the
        // final Catalyst planning cost, which is the quantity of interest.
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t1) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"PROF2 $q%-18s build=$tBuild%7.2f planOnly=$tPlan%7.2f")
      } catch { case e: Throwable =>
        println(s"PROF2 $q FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
