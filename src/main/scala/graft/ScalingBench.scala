package graft

import org.apache.spark.sql.SparkSession

import graft.data.SourceFilesGen

/**
 * The two-cluster-size scaling protocol (BASELINE.md): run the IDENTICAL
 * validation job on the SAME input at local[N] and local[4N], report
 * throughput at both and efficiency = T(N-cores speedup) = thr(4N)/(4·thr(N)).
 *
 * Usage: runMain graft.ScalingBench [N] [rows]  (default N=8, rows=2000000)
 * Prints one JSON line; results are transcribed into BENCH.md.
 */
object ScalingBench {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runAt(cores: Int, rows: Long): Double = {
    val spark = session(cores)
    spark.sparkContext.setLogLevel("WARN")
    val gen = SourceFilesGen.generate(spark, rows)
      .repartition(cores * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gen.count()
    Bench.validationSecs(gen.limit(100000)) // warm codegen
    val s1 = Bench.validationSecs(gen)
    val s2 = Bench.validationSecs(gen)
    gen.unpersist()
    spark.stop()
    math.min(s1, s2)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8
    val rows = if (args.length > 1) args(1).toLong else 2000000L
    val secsN = runAt(n, rows)
    val secs4N = runAt(4 * n, rows)
    val thrN = rows / secsN / 1e6
    val thr4N = rows / secs4N / 1e6
    val eff = thr4N / (4 * thrN)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cores":$n%d,"rows":$rows%d,"thr_n_mrows":$thrN%.3f,"thr_4n_mrows":$thr4N%.3f,"sec_n":$secsN%.3f,"sec_4n":$secs4N%.3f}""")
  }
}
