package graft.run

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Storage behind [[Runner]] — the ledger, the violation sink and the
 * frozen drift reference, as one swappable trait (SURVEY §7.0: the
 * parquet-dir layout in the sandbox, an Iceberg catalog on a real
 * cluster — same shapes, same commit semantics).
 *
 * Contract the Runner relies on:
 *  - [[commitWave]] is ATOMIC: a killed run never leaves a half-visible
 *    wave in the ledger (parquet-dir: tmp file + atomic rename; Iceberg:
 *    a single append transaction).
 *  - [[clearViolationPartitions]] + [[writeViolations]] together give
 *    per-(spec_hash, part_id) overwrite: a re-run bucket replaces its
 *    previous violation rows, including the killed-attempt orphans.
 *  - [[writeRefHistIfAbsent]] freezes the drift baseline exactly once,
 *    first-writer-wins under concurrency.
 */
trait TableIO {

  /** Raw ledger rows (all attempts), or None when nothing committed. */
  def ledger(spark: SparkSession): Option[DataFrame]

  /** Atomically commit one wave of partition results. */
  def commitWave(results: Seq[Runner.PartitionResult]): Unit

  /** Drop any previous violation rows of the given partitions (stale or
   * orphaned) before [[writeViolations]] re-writes them. */
  def clearViolationPartitions(specHash: String, parts: Seq[Int]): Unit

  /** Write a wave's violation rows, partitioned by (spec_hash, part_id). */
  def writeViolations(df: DataFrame): Unit

  /** All violation rows ever written (the Runner ledger-gates them). */
  def readViolations(spark: SparkSession): DataFrame

  /** Freeze the drift reference histogram if none exists yet. */
  def writeRefHistIfAbsent(df: DataFrame): Unit

  def readRefHist(spark: SparkSession): DataFrame

  /** Append per-wave observability rows ([[Runner.WaveMetrics]] — the
   * plugin-hook bridge). Append-only; ordering is by completed_at_ms. */
  def appendMetrics(rows: Seq[Runner.WaveMetrics]): Unit

  /** All observability rows ever appended, or None when there are none. */
  def metrics(spark: SparkSession): Option[DataFrame]

  /** Does a staged bucketed copy for this signature exist already? */
  def stagedExists(sig: String): Boolean

  def writeStaged(sig: String, df: DataFrame): Unit

  def readStaged(sig: String, spark: SparkSession): DataFrame
}

/**
 * The parquet-directory implementation (default; what the sandbox runs):
 *   ledger/wave-<uuid>.json    JSON-lines, written tmp + atomic rename
 *   violations/spec_hash=S/part_id=K/   dynamic-partition-overwritten
 *   _ref_hist/                 frozen via atomic directory move
 *   _staged_<sig>/             bucketed staging copies, _SUCCESS-gated
 */
final class ParquetDirIO(outDir: String) extends TableIO {

  private def ledgerDir = Paths.get(outDir, "ledger")

  override def ledger(spark: SparkSession): Option[DataFrame] = {
    if (!Files.isDirectory(ledgerDir)) return None
    val files = Files.list(ledgerDir).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
    if (files.isEmpty) None else Some(spark.read.json(files: _*))
  }

  override def commitWave(results: Seq[Runner.PartitionResult]): Unit = {
    Files.createDirectories(ledgerDir)
    val json = results.map { r =>
      s"""{"part_id":${r.part_id},"spec_hash":"${r.spec_hash}","row_count":${r.row_count},""" +
        s""""violation_count":${r.violation_count},"invalid_rows":${r.invalid_rows},""" +
        s""""sha_checksum":${r.sha_checksum},"psi":${r.psi},"passed":${r.passed},""" +
        s""""attempt":${r.attempt},"completed_at_ms":${r.completed_at_ms},""" +
        s""""constructed":${r.constructed}}"""
    }.mkString("", "\n", "\n")
    val tmp = ledgerDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, json)
    Files.move(tmp, ledgerDir.resolve(s"wave-${UUID.randomUUID()}.json"),
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def metricsDir = Paths.get(outDir, "metrics")

  override def appendMetrics(rows: Seq[Runner.WaveMetrics]): Unit = {
    Files.createDirectories(metricsDir)
    val json = rows.map { m =>
      s"""{"spec_hash":"${m.spec_hash}","wave_id":${m.wave_id},""" +
        s""""parts":${m.parts},"rows":${m.rows},""" +
        s""""violations":${m.violations},"wall_ms":${m.wall_ms},""" +
        s""""spark_queries":${m.spark_queries},""" +
        s""""spark_query_ms":${m.spark_query_ms},""" +
        s""""status":"${m.status}","constructed":${m.constructed},""" +
        s""""completed_at_ms":${m.completed_at_ms}}"""
    }.mkString("", "\n", "\n")
    val tmp = metricsDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, json)
    Files.move(tmp, metricsDir.resolve(s"m-${UUID.randomUUID()}.json"),
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  override def metrics(spark: SparkSession): Option[DataFrame] = {
    if (!Files.isDirectory(metricsDir)) return None
    val files = Files.list(metricsDir).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
    if (files.isEmpty) None else Some(spark.read.json(files: _*))
  }

  override def clearViolationPartitions(specHash: String,
                                        parts: Seq[Int]): Unit =
    parts.foreach { p =>
      val partDir = Paths.get(outDir, "violations",
        s"spec_hash=$specHash", s"part_id=$p")
      if (Files.isDirectory(partDir)) {
        def rm(fl: java.io.File): Unit = {
          Option(fl.listFiles()).foreach(_.foreach(rm)); fl.delete(); ()
        }
        rm(partDir.toFile)
      }
    }

  override def writeViolations(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("spec_hash", "part_id")
      .parquet(s"$outDir/violations")

  override def readViolations(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$outDir/violations")

  private def refHistPath = s"$outDir/_ref_hist"

  override def writeRefHistIfAbsent(df: DataFrame): Unit = {
    if (Files.isDirectory(Paths.get(refHistPath))) return
    val tmp = s"$outDir/._ref_hist-${UUID.randomUUID()}"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    try Files.move(Paths.get(tmp), Paths.get(refHistPath),
      StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      // concurrent run won the race; use theirs and drop our staging dir
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
    ()
  }

  override def readRefHist(spark: SparkSession): DataFrame =
    spark.read.parquet(refHistPath)

  private def stagedPath(sig: String) = s"$outDir/_staged_$sig"

  override def stagedExists(sig: String): Boolean =
    Files.exists(Paths.get(stagedPath(sig), "_SUCCESS"))

  override def writeStaged(sig: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("__part").parquet(stagedPath(sig))

  override def readStaged(sig: String, spark: SparkSession): DataFrame =
    spark.read.parquet(stagedPath(sig))
}

/**
 * Iceberg-catalog implementation: the same four shapes as catalog tables
 * under `prefix` (e.g. `lake.graft_runs.run42`), written through Spark's
 * DataFrameWriterV2 so every wave is ONE Iceberg snapshot commit —
 * append for the ledger, dynamic `overwritePartitions` for the violation
 * sink. Compiles against Spark alone; needs an Iceberg catalog configured
 * (`spark.sql.catalog.<name>` + iceberg-spark-runtime on the cluster
 * classpath) at runtime, which the sandbox does not ship — exercised
 * there only through [[ParquetDirIO]]-backed tests (documented in
 * SURVEY §7.0).
 */
final class IcebergIO(spark: SparkSession, prefix: String) extends TableIO {

  private val ledgerTbl = s"${prefix}_ledger"
  private val violTbl = s"${prefix}_violations"
  private val refHistTbl = s"${prefix}_ref_hist"
  private def stagedTbl(sig: String) = s"${prefix}_staged_$sig"

  private def exists(tbl: String): Boolean = spark.catalog.tableExists(tbl)

  override def ledger(spark: SparkSession): Option[DataFrame] =
    if (exists(ledgerTbl)) Some(spark.table(ledgerTbl)) else None

  override def commitWave(results: Seq[Runner.PartitionResult]): Unit = {
    import spark.implicits._
    val df = results.toDF()
    // one atomic append snapshot per wave
    if (exists(ledgerTbl)) df.writeTo(ledgerTbl).append()
    else df.writeTo(ledgerTbl).create()
  }

  // Iceberg's dynamic overwritePartitions already replaces every partition
  // present in the incoming frame atomically — and a re-run bucket whose
  // new result is clean is handled by the Runner writing an explicit
  // empty-partition marker-free frame, so stale rows of CLEAN re-runs are
  // dropped here with a partition-level delete.
  override def clearViolationPartitions(specHash: String,
                                        parts: Seq[Int]): Unit =
    if (exists(violTbl) && parts.nonEmpty)
      spark.sql(s"DELETE FROM $violTbl WHERE spec_hash = '$specHash' " +
        s"AND part_id IN (${parts.mkString(",")})")

  override def writeViolations(df: DataFrame): Unit =
    if (exists(violTbl)) df.writeTo(violTbl).overwritePartitions()
    else df.writeTo(violTbl).partitionedBy(col("spec_hash"), col("part_id"))
      .create()

  override def readViolations(spark: SparkSession): DataFrame =
    spark.table(violTbl)

  override def writeRefHistIfAbsent(df: DataFrame): Unit =
    if (!exists(refHistTbl)) df.writeTo(refHistTbl).create()

  override def readRefHist(spark: SparkSession): DataFrame =
    spark.table(refHistTbl)

  private val metricsTbl = s"${prefix}_metrics"

  override def appendMetrics(rows: Seq[Runner.WaveMetrics]): Unit = {
    import spark.implicits._
    val df = rows.toDF()
    if (exists(metricsTbl)) df.writeTo(metricsTbl).append()
    else df.writeTo(metricsTbl).create()
  }

  override def metrics(spark: SparkSession): Option[DataFrame] =
    if (exists(metricsTbl)) Some(spark.table(metricsTbl)) else None

  override def stagedExists(sig: String): Boolean = exists(stagedTbl(sig))

  override def writeStaged(sig: String, df: DataFrame): Unit =
    df.writeTo(stagedTbl(sig)).partitionedBy(col("__part")).createOrReplace()

  override def readStaged(sig: String, spark: SparkSession): DataFrame =
    spark.table(stagedTbl(sig))
}
