package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.ModelValidator
import graft.data.SourceFilesGen
import graft.spec._

/** Benchmark entry point (driver contract: ONE JSON line on stdout).
 *
 * Times every SparkEntry query on SPARK_GRAFT_SF_DIR, plus the headline
 * metric from BASELINE.json: validation throughput (M rows/sec) of the
 * compiled constraint model over the synthetic source-code table.
 */
object Bench {

  /** Canonical source-file constraint model (FIXTURES.md §1). */
  val sourceFileModel: ModelSpec = ModelSpec("source_file", Seq(
    FieldSpec("repo", StrSpec(pattern = Some("^[\\w.-]+/[\\w.-]+$"))),
    FieldSpec("path", StrSpec(minLength = Some(1))),
    FieldSpec("commit", StrSpec(pattern = Some("^[0-9a-f]{40}$"),
      minLength = Some(40), maxLength = Some(40))),
    FieldSpec("lang", EnumSpec(SourceFilesGen.langs)),
    FieldSpec("content", NullableSpec(StrSpec(maxLength = Some(1000000))))
  ))

  /** Force full materialization of every output column (a bare count()
   * would let Catalyst prune the violation expressions away). */
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Validation throughput over `rows` synthetic source files already
   * materialized in `df`: rows/sec of the full model (5 fields, ~10
   * compiled constraints + sha256 invariant). */
  def validationSecs(df: DataFrame): Double = time {
    val planned = ModelValidator.plan(df, sourceFileModel)
      .withColumn("sha", graft.checks.TableChecks.sha256(col("content")))
    // aggregate forces every violation expression + the hash
    planned.agg(
      sum(size(col(ModelValidator.VIOLATIONS))),
      count(when(col(ModelValidator.VALID), 1)),
      max(col("sha"))).collect()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: WholeStageCodegen logs full physical plans at WARN
    // when a projection trips the 64KB/8KB-constant-pool limits, and that
    // multi-line dump polluted the round-1 bench output stream.
    spark.sparkContext.setLogLevel("ERROR")

    // ---- per-query timings on the driver's parquet tables.
    // No exception swallowing: a broken query must FAIL the bench loudly,
    // not silently report -1s (round-1 verdict item #5).
    // The sandbox host throttles CPU in rolling windows (BENCH.md §variance):
    // a single timed run can land 20x slow through no fault of the plan. The
    // warm run doubles as a control: if the timed run is slower than the warm
    // run (which paid codegen + shuffle-file costs the timed run doesn't),
    // the timed window was throttled — re-time once and take the min. Extra
    // cost is bounded to the throttle victims, not every query.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val warmSec = time(force(fn(spark, sfDir))) // warm (codegen + shuffles)
      // queries that persist internal stages (d_jaccard_ngram,
      // p_corpus_clean) must rebuild them in the TIMED run — a leaked
      // warm-run cache would bill only the post-materialization steady
      // state. Clearing here also keeps query N's storage away from N+1.
      spark.sharedState.cacheManager.clearCache()
      val t1 = time(force(fn(spark, sfDir)))
      val t = if (t1 > math.max(warmSec, 1.0)) {
        spark.sharedState.cacheManager.clearCache()
        math.min(t1, time(force(fn(spark, sfDir))))
      } else t1
      spark.sharedState.cacheManager.clearCache()
      name -> t
    }

    // ---- headline: validation throughput on the synthetic source table
    // (measured before the heavier composite bench; min of 2 runs after
    // warm-up + GC so earlier queries' heap state doesn't bill this number)
    val gen = SourceFilesGen.generate(spark, benchRows)
      .repartition(cpus.toInt * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gen.count() // materialize input so we time validation, not generation
    validationSecs(gen.limit(100000)) // warm codegen
    System.gc()
    val vSecs = Seq(validationSecs(gen), validationSecs(gen)).min
    val mRowsPerSec = benchRows / vSecs / 1e6
    gen.unpersist()

    // ---- north-star composite model (reference test_north_star.py):
    // UUID/decimal/date/time/datetime + nested discriminated unions from
    // lax strings — the reference's own flagship benchmark shape
    val nsRows = 500000L
    // planAuto routes the heavy websites list to the exploded scale path
    // (codegen'd scalars + vectorized element pass) by weight heuristic
    def nsPlan(n: Long) = ModelValidator.planAuto(
      graft.data.NorthStar.generate(spark, n),
      graft.data.NorthStar.personSpec, "row_id")
    // warm doubles as a throttle control (same trick as the query loop):
    // a clean 500k run costs ~10x the 50k warm; if a timed run exceeds
    // 40x warm, the window was throttled — retry (up to 4 runs total)
    val nsWarm = time(force(nsPlan(50000L)))
    System.gc()
    var nsRuns = List(time(force(nsPlan(nsRows))))
    while (nsRuns.min > math.max(nsWarm * 40.0, 4.0) && nsRuns.size < 4) {
      System.gc(); nsRuns = time(force(nsPlan(nsRows))) :: nsRuns
    }
    // one confirmation run when the first attempt was accepted outright
    // (min of 2 clean runs); skip it when retries already burned the budget
    if (nsRuns.size == 1) nsRuns = time(force(nsPlan(nsRows))) :: nsRuns
    val nsSecs = nsRuns.min
    val nsMRows = nsRows / nsSecs / 1e6

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = f"""{"metric":"validation_mrows_per_sec","value":$mRowsPerSec%.3f,"unit":"Mrows/sec","queries_total_sec":$total%.3f,"queries":$qs%s,"validate_rows":$benchRows%d,"validate_sec":$vSecs%.3f,"north_star_mrows":$nsMRows%.3f,"north_star_rows":$nsRows%d,"sf":"$sfDir%s"}"""
    // Driver contract: ONE machine-readable JSON line. Belt and braces —
    // print it on stdout (build.sbt's StdoutOutput passes it through
    // unprefixed) AND persist it to a file for out-of-band pickup.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
    println(json)
    System.out.flush()
  }
}
