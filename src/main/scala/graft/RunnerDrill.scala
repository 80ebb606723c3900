package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Kill-resume drill for the checkpointed Runner (round-5 order #9): run
 * the sf1-scale validation, HARD-kill the JVM mid-wave (Runtime.halt —
 * no shutdown hooks, the SIGKILL analog), then resume in a fresh process
 * and prove the ledger contract:
 *
 *   - every bucket appears in the ledger EXACTLY once after resume,
 *   - the resumed run re-validated only the holes (completed partitions
 *     skipped),
 *   - results/violations equal an uninterrupted control run bit-exactly
 *     (per-partition sha invariant included) — orphan outputs from the
 *     killed wave are ledger-gated away.
 *
 * Usage:
 *   runMain graft.RunnerDrill <sfDir> <stateDir> kill <minParts>
 *     — runs and halts(137) once the ledger holds >= minParts partitions
 *   runMain graft.RunnerDrill <sfDir> <stateDir> resume <controlDir>
 *     — resumes to completion, runs the control in <controlDir>, prints
 *       one JSON line with the accounting
 */
object RunnerDrill {
  private val Buckets = 64

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def docs(s: SparkSession, sfDir: String) =
    s.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("content", col("text"))

  private def runIt(s: SparkSession, sfDir: String, out: String): Unit =
    run.Runner.run(s, docs(s, sfDir), SparkEntry.docModel,
      keyCol = "source", contentCol = "content", outDir = out,
      buckets = Buckets, waveSize = 8, histLo = 0, histHi = 600,
      histBuckets = 20)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, stateDir, mode, rest) = args.take(4)
    val spark = session()
    mode match {
      case "kill" =>
        val minParts = rest.toInt
        val ledgerDir = new java.io.File(s"$stateDir/ledger")
        val watcher = new Thread(() => {
          while (true) {
            Thread.sleep(100L)
            // count committed partitions straight off the ledger files
            // (one JSON line per partition) — no Spark involvement, so
            // the poll can never serialize with the wave under test
            val n = try {
              Option(ledgerDir.listFiles()).getOrElse(Array())
                .filter(_.getName.endsWith(".json"))
                .map(f => java.nio.file.Files.lines(f.toPath).count())
                .sum
            } catch { case _: Throwable => 0L }
            if (n >= minParts) {
              System.err.println(s"[drill] $n partitions committed — " +
                "halting mid-wave (Runtime.halt, no shutdown hooks)")
              Runtime.getRuntime.halt(137)
            }
          }
        })
        watcher.setDaemon(true)
        watcher.start()
        runIt(spark, sfDir, stateDir)
        // reaching here means the run finished before the kill threshold —
        // the drill is invalid; say so loudly
        System.err.println("[drill] run completed BEFORE the kill fired — " +
          "raise minParts or enlarge the input")
        sys.exit(2)

      case "resume" =>
        val controlDir = rest
        val before = run.Runner.completedParts(spark, stateDir,
          run.Runner.specHash(SparkEntry.docModel)).size
        val t0 = System.nanoTime()
        runIt(spark, sfDir, stateDir)
        val resumeSec = (System.nanoTime() - t0) / 1e9
        // accounting off the resumed ledger
        val ledger = run.Runner.results(spark, stateDir)
        val perPart = ledger.groupBy("part_id")
          .agg(count(lit(1)).as("n")).collect()
        val dups = perPart.count(_.getLong(1) > 1L)
        val total = perPart.length
        // uninterrupted control in a fresh dir, then bit-compare
        runIt(spark, sfDir, controlDir)
        val cols = Seq("part_id", "row_count", "violation_count",
          "invalid_rows", "passed", "sha_checksum", "psi")
        def canon(dir: String) = run.Runner.results(spark, dir)
          .select(cols.map(col): _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        val matchClean = canon(stateDir) == canon(controlDir)
        println(s"""{"drill":"runner_kill_resume","buckets":$Buckets,""" +
          s""""completed_before_resume":$before,""" +
          s""""ledger_parts":$total,"dup_parts":$dups,""" +
          s""""resume_sec":${math.round(resumeSec * 10) / 10.0},""" +
          s""""match_clean":$matchClean}""")
      case other =>
        System.err.println(s"unknown mode $other"); sys.exit(2)
    }
    spark.stop()
  }
}
