package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Skew-proof demo (round-4 order #7): a boilerplate-heavy corpus — 20% of
 * documents sharing one ~0.9-Jaccard template cluster (generate with
 * `runMain graft.DataGen /root/testdata/sf0.1 /tmp/graft_sf01_skew 1 20`) —
 * must not blow up the near-dup joins. Two valves, both standard practice:
 *
 *  - MinHash-LSH: the `maxBucket` guard drops degenerate (band,hash)
 *    buckets before the self-join (a bucket holding 20% of the corpus is
 *    template text, not near-dup signal — and would emit |bucket|^2 pairs);
 *    AQE skew-join splitting handles the surviving moderately-hot buckets.
 *  - Exact Jaccard: the `maxDf` stop-shingle cap excludes
 *    template shingles from the All-Pairs index, which bounds prefix
 *    candidate generation the same way.
 *
 * Prints ONE JSON line: uniform-vs-skewed seconds + pair counts, guarded
 * and (for LSH) unguarded. Acceptance: guarded skewed runs within ~2x of
 * uniform at the same sf.
 */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val skewDir = if (args.length > 0) args(0) else "/tmp/graft_sf01_skew"
    val uniDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.OFF)

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def clear(): Unit = spark.sharedState.cacheManager.clearCache()

    // warm codegen once on the small side
    Dedup.minhashLshPairs(docs(uniDir).limit(500), "doc_id", "text",
      numHashes = 12, bands = 4).queryExecution.toRdd.count()
    clear()

    def lsh(dir: String, maxBucket: Long): (Double, Long) = {
      clear()
      timed(Dedup.minhashLshPairs(docs(dir), "doc_id", "text",
        numHashes = 12, bands = 4, shingleN = 3, threshold = 0.5,
        maxBucket = maxBucket).queryExecution.toRdd.count())
    }
    def jac(dir: String, maxDf: Option[Long]): (Double, Long) = {
      clear()
      timed(Dedup.jaccardNgramPairs(docs(dir), "doc_id", "text",
        shingleN = 3, thrNum = 1L, thrDen = 2L, maxDf = maxDf)
        .queryExecution.toRdd.count())
    }

    // sandbox-scaled guard: 500-doc buckets/shingles ~ the 10^5 guard at
    // 10^9-doc scale (both ≈ corpus * 1e-3)
    val guard = 500L
    val (lshUniS, lshUniN) = lsh(uniDir, 100000L)
    val (lshSkewGuardS, lshSkewGuardN) = lsh(skewDir, guard)
    val (lshSkewRawS, lshSkewRawN) = lsh(skewDir, 100000L)
    val (jacUniS, jacUniN) = jac(uniDir, None)
    val (jacSkewGuardS, jacSkewGuardN) = jac(skewDir, Some(guard))

    val json =
      f"""{"metric":"skew_demo","uniform_dir":"$uniDir%s","skew_dir":"$skewDir%s",""" +
        f""""lsh_uniform_sec":$lshUniS%.2f,"lsh_uniform_pairs":$lshUniN%d,""" +
        f""""lsh_skew_guarded_sec":$lshSkewGuardS%.2f,"lsh_skew_guarded_pairs":$lshSkewGuardN%d,""" +
        f""""lsh_skew_unguarded_sec":$lshSkewRawS%.2f,"lsh_skew_unguarded_pairs":$lshSkewRawN%d,""" +
        f""""jac_uniform_sec":$jacUniS%.2f,"jac_uniform_pairs":$jacUniN%d,""" +
        f""""jac_skew_guarded_sec":$jacSkewGuardS%.2f,"jac_skew_guarded_pairs":$jacSkewGuardN%d,""" +
        f""""max_bucket_guard":$guard%d}"""
    spark.stop()
    println(json)
    System.out.flush()
  }
}
