package graft

import org.apache.spark.sql.SparkSession

import graft.data.SourceFilesGen

/**
 * The two-cluster-size scaling protocol (BASELINE.md): run the IDENTICAL
 * validation job on the SAME input at local[N] and local[4N], report
 * throughput at both and efficiency = thr(4N)/(4·thr(N)).
 *
 * Protocol notes for honest efficiency measurement:
 *  - the input layout is FIXED (same partition count in both runs) so only
 *    the executor-thread count varies — exactly "same job, two cluster
 *    sizes", and task granularity stays fine enough (>= 8 tasks/core at 4N)
 *    that stragglers don't masquerade as scaling loss;
 *  - min of 3 timed runs after a codegen warm-up, GC between runs, so a
 *    collection triggered by run k doesn't bill run k+1.
 *
 * Usage: runMain graft.ScalingBench [N] [rows] (default N=8, rows=8000000)
 * Prints one JSON line; results are transcribed into BENCH.md.
 */
object ScalingBench {

  val FixedPartitions = 256

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .config("spark.sql.shuffle.partitions", FixedPartitions.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runAt(cores: Int, rows: Long): Double = {
    val spark = session(cores)
    spark.sparkContext.setLogLevel("WARN")
    // Generation is fused with validation (no persist): the deterministic
    // generator is a pure codegen'd projection over spark.range, standing
    // in for a parquet scan. Caching the 2KB-content rows would bottleneck
    // the 4N run on storage-pool spill and measure the disk, not the
    // engine; fused, both runs are pure CPU over identical partitions.
    def gen = SourceFilesGen.generate(spark, rows, partitions = FixedPartitions)
    Bench.validationSecs(SourceFilesGen.generate(spark, 100000L)) // warm
    val secs = (1 to 3).map { _ =>
      System.gc()
      Bench.validationSecs(gen)
    }.min
    spark.stop()
    secs
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8
    val rows = if (args.length > 1) args(1).toLong else 8000000L
    val secsN = runAt(n, rows)
    val secs4N = runAt(4 * n, rows)
    val thrN = rows / secsN / 1e6
    val thr4N = rows / secs4N / 1e6
    val eff = thr4N / (4 * thrN)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cores":$n%d,"rows":$rows%d,"thr_n_mrows":$thrN%.3f,"thr_4n_mrows":$thr4N%.3f,"sec_n":$secsN%.3f,"sec_4n":$secs4N%.3f}""")
  }
}
