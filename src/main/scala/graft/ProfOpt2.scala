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
    for (q <- Seq("q_fraction", "q_tuple_var", "ns_verdict", "q_complex", "x_color")) {
      val warm = Bench.time(Bench.force(SparkEntry.queries(q)(spark, dir)))
      val planOnly = Bench.time {
        SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      }
      val t1 = Bench.time(Bench.force(SparkEntry.queries(q)(spark, dir)))
      val t2 = Bench.time(Bench.force(SparkEntry.queries(q)(spark, dir)))
      println(f"PROF2 $q%-14s warm=$warm%6.2f planOnly=$planOnly%6.2f timed=[$t1%6.2f,$t2%6.2f]")
    }
    spark.stop()
  }
}
