package graft.run

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.{Drift, TableChecks}
import graft.compile.ModelValidator
import graft.spec.ModelSpec

/**
 * Checkpointed, resumable validation runs (north rule): the input table is
 * bucketed by key hash, each wave of buckets is validated and its
 * violations + per-partition metrics committed atomically, and a killed run
 * resumes by anti-joining pending buckets against the completed ledger.
 *
 * Reference anchor: pydantic validates one object per call and the caller
 * owns retries; at 10^12 rows the "caller" must be this: partition-level
 * units of work with exactly-once commit semantics.
 *
 * Storage is behind [[TableIO]]: [[ParquetDirIO]] under `outDir` by
 * default (see its scaladoc for the on-disk layout), [[IcebergIO]] for a
 * real cluster's catalog tables — the Runner's logic is identical.
 *
 * Partitions NOT present in the ledger are untrusted: a wave killed
 * mid-write leaves orphan rows in the violation sink which the next run
 * overwrites and the reader ignores (ledger-gated semi-join).
 */
object Runner {

  /** Per-partition verdict + lineage row — the checkpoint unit.
   * `constructed` marks a checks-bypassed ingest (`model_construct`,
   * `pydantic/main.py:331-405`): trusted rows counted and
   * sha-checksummed for lineage but never validated. */
  final case class PartitionResult(
      part_id: Int,
      spec_hash: String,
      row_count: Long,
      violation_count: Long,
      invalid_rows: Long,
      sha_checksum: Long,
      psi: Double,
      passed: Boolean,
      attempt: Int,
      completed_at_ms: Long,
      constructed: Boolean = false)

  final case class RunReport(
      buckets: Int,
      skipped: Seq[Int],
      ran: Seq[Int],
      passed: Seq[Int],
      failed: Seq[Int])

  /** Per-wave observability row — the engine analog of pydantic's plugin
   * hooks (`pydantic/plugin/__init__.py:76-186` on_success/on_error):
   * rows/violations/wall per wave, plus what Spark's own
   * QueryExecutionListener saw while the wave ran (query count and
   * cumulative execution time — the listener bus is async, so the two
   * listener fields are best-effort counters, never gates). */
  final case class WaveMetrics(
      spec_hash: String,
      wave_id: Int,
      parts: Int,
      rows: Long,
      violations: Long,
      wall_ms: Long,
      spark_queries: Long,
      spark_query_ms: Long,
      status: String,
      constructed: Boolean,
      completed_at_ms: Long)

  /** Stable hash of the compiled spec — part of partition lineage, so a
   * spec change invalidates nothing silently (results are keyed by it). */
  def specHash(m: ModelSpec): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(m.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Bucket assignment: xxhash64 of the partition key — uniform even when
   * key values are skewed (the mega-repo still lands in ONE bucket, which
   * is the point: verdicts are per key group; skew inside a bucket is
   * handled by the salted aggs of TableChecks). */
  def partitionId(key: Column, buckets: Int): Column =
    pmod(xxhash64(key), lit(buckets)).cast("int")

  /** Committed partitions (part_id -> attempt), only entries whose
   * spec_hash matches. */
  def completedParts(spark: SparkSession, io: TableIO,
                     spec: String): Map[Int, Int] =
    io.ledger(spark) match {
      case None => Map.empty
      case Some(raw) =>
        raw.filter(col("spec_hash") === spec)
          .groupBy("part_id").agg(max("attempt").as("attempt"))
          .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    }

  def completedParts(spark: SparkSession, outDir: String,
                     spec: String): Map[Int, Int] =
    completedParts(spark, new ParquetDirIO(outDir), spec)

  // ---------------------------------------------------------------- driver

  /**
   * Validate `df` under `model`, checkpointing per `buckets` partitions of
   * `xxhash64(keyCol) % buckets`, `waveSize` buckets per Spark job.
   *
   * Resumable: partitions already in the ledger (same spec hash) are
   * skipped — the input for a completed bucket is never re-read because the
   * bucket filter is pushed into the scan's partition pruning when the
   * input is bucketed/partitioned by the same key, and is a cheap scan
   * filter otherwise.
   *
   * Pass criteria per partition: violation rate <= maxViolationRate AND
   * content-length PSI vs the frozen reference histogram <= maxPsi.
   */
  def run(spark: SparkSession, df: DataFrame, model: ModelSpec,
          keyCol: String, contentCol: String, outDir: String,
          buckets: Int = 64, waveSize: Int = 16,
          maxViolationRate: Double = 0.05, maxPsi: Double = 0.25,
          histLo: Double = 0, histHi: Double = 8192,
          histBuckets: Int = 40,
          stageBuckets: Boolean = false,
          io: Option[TableIO] = None,
          construct: Boolean = false): RunReport = {
    val tio = io.getOrElse(new ParquetDirIO(outDir))
    // `model_construct` ingests under its OWN lineage (hash + marker):
    // a construct-committed partition must never satisfy a later REAL
    // validation's resume check — bypassing checks is explicit in the
    // ledger, not a silent skip of future validation
    val spec = if (construct) specHash(model) + ":construct"
               else specHash(model)
    val done = completedParts(spark, tio, spec)
    val all = 0 until buckets
    val pending = all.filterNot(done.contains)
    // Wave inputs: without staging, every wave re-filters the FULL input —
    // buckets/waveSize rescans per complete run, fine only when the source
    // is already physically partitioned/bucketed by the same key hash.
    // stageBuckets=true writes ONE bucketed staging copy up front
    // (partitioned by __part), so each wave's read partition-prunes to
    // exactly its buckets: total I/O = 1 write + 1 read of the table
    // instead of buckets/waveSize scans. The staging copy is itself
    // resumable state, reused when present — its signature embeds
    // (key column, bucket count), so a resume with a CHANGED buckets or
    // keyCol restages instead of reusing a copy whose __part ids no
    // longer line up (a stale reuse silently committed 0-row 'passed'
    // verdicts for every new bucket id beyond the staged range). Input
    // DATA immutability under one state dir is already the ledger's own
    // contract (completed parts are trusted across runs) — staging
    // inherits it rather than fingerprinting the input.
    val withPart = if (stageBuckets) {
      val keySig = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(keyCol.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.take(8)
      }
      val sig = s"b${buckets}_k$keySig"
      if (!tio.stagedExists(sig))
        tio.writeStaged(sig,
          df.withColumn("__part", partitionId(col(keyCol), buckets)))
      tio.readStaged(sig, spark)
    } else df.withColumn("__part",
      partitionId(col(keyCol), buckets))

    // freeze the drift reference histogram on first contact (validation
    // runs only — construct mode gates nothing on drift)
    val refHist = if (construct) null else {
      tio.writeRefHistIfAbsent(
        Drift.histogram(withPart, lit("all"),
          Drift.bucketize(length(col(contentCol)), histLo, histHi,
            histBuckets))
          .groupBy("bucket").agg(sum("cnt").as("ref_cnt")))
      tio.readRefHist(spark)
    }

    // plugin-hook bridge (WaveMetrics scaladoc): count Spark query
    // executions + cumulative execution time while the run is active
    val qCount = new java.util.concurrent.atomic.AtomicLong
    val qNanos = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        qCount.incrementAndGet(); qNanos.addAndGet(durationNs); ()
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = {
        qCount.incrementAndGet(); ()
      }
    }
    spark.listenerManager.register(listener)

    var ranAll = Vector.empty[Int]
    var passedAll = Vector.empty[Int]
    try pending.grouped(waveSize).zipWithIndex.foreach { case (wave, wi) =>
      val t0 = System.nanoTime()
      val (q0, qn0) = (qCount.get(), qNanos.get())
      def emit(committed: Seq[PartitionResult], status: String): Unit =
        tio.appendMetrics(Seq(WaveMetrics(spec, wi, committed.size,
          committed.map(_.row_count).sum,
          committed.map(_.violation_count).sum,
          (System.nanoTime() - t0) / 1000000L,
          qCount.get() - q0, (qNanos.get() - qn0) / 1000000L,
          status, construct, System.currentTimeMillis())))
      val committed =
        try {
          val waveDf = withPart.filter(col("__part").isin(wave: _*))
          val rows =
            if (construct) constructWave(waveDf, contentCol, spec, done)
            else validateWave(waveDf, model, keyCol, contentCol, spec,
              done, maxViolationRate, maxPsi, histLo, histHi, histBuckets,
              refHist, tio, wave)
          // empty buckets still need ledger entries (completed, zero rows)
          val seen = rows.map(_.part_id).toSet
          val empties = wave.filterNot(seen.contains).map { p =>
            PartitionResult(p, spec, 0L, 0L, 0L, 0L, 0.0, passed = true,
              attempt = done.getOrElse(p, 0) + 1,
              completed_at_ms = System.currentTimeMillis(),
              constructed = construct)
          }
          rows ++ empties
        } catch { case e: Throwable => emit(Nil, "error"); throw e }
      tio.commitWave(committed)
      emit(committed, "success")
      ranAll ++= committed.map(_.part_id)
      passedAll ++= committed.filter(_.passed).map(_.part_id)
    } finally spark.listenerManager.unregister(listener)
    RunReport(buckets,
      skipped = done.keys.toSeq.sorted,
      ran = ranAll.sorted,
      passed = passedAll.sorted,
      failed = (ranAll.toSet -- passedAll.toSet).toSeq.sorted)
  }

  /** One validation wave: violations sink + per-partition metrics + drift
   * gate. Extracted verbatim from the wave loop (see comments inline). */
  private def validateWave(waveDf: DataFrame, model: ModelSpec,
                           keyCol: String, contentCol: String, spec: String,
                           done: Map[Int, Int], maxViolationRate: Double,
                           maxPsi: Double, histLo: Double, histHi: Double,
                           histBuckets: Int, refHist: DataFrame,
                           tio: TableIO, wave: Seq[Int])
  : Seq[PartitionResult] = {
    val planned = ModelValidator.plan(waveDf, model)
      .withColumn("__sha", TableChecks.sha256(col(contentCol)))
      .withColumn("__sha60",
        coalesce(graft.text.TextOps.hash60(col("__sha")), lit(0L)))

    // Violations sink for the wave, keyed by (spec_hash, part_id) so runs
    // under different specs never collide. Dynamic partition overwrite
    // only rewrites partitions that produce >=1 violation row, so a
    // re-run bucket whose new result is CLEAN would leave stale rows from
    // a previous (possibly killed) attempt — clear this wave's partitions
    // first. Clearing before the ledger commit is safe: a partition
    // without a ledger entry is untrusted and will be re-run anyway.
    tio.clearViolationPartitions(spec, wave)
    tio.writeViolations(
      planned.filter(size(col(ModelValidator.VIOLATIONS)) > 0)
        .select(lit(spec).as("spec_hash"),
          col("__part").as("part_id"), col(keyCol).as("key"),
          explode(col(ModelValidator.VIOLATIONS)).as("v"))
        .select(col("spec_hash"), col("part_id"), col("key"),
          col("v.loc").as("loc"), col("v.type").as("type"),
          col("v.msg").as("msg"), col("v.input").as("input")))

    // per-partition metrics: ONE aggregation pass (partial+final)
    val metrics = planned.groupBy(col("__part").as("part_id")).agg(
      count(lit(1)).as("row_count"),
      sum(size(col(ModelValidator.VIOLATIONS))).as("violation_count"),
      sum(when(col(ModelValidator.VALID), 0L).otherwise(1L)).as("invalid_rows"),
      // order-independent content checksum: xor of 60-bit sha prefixes —
      // the per-row sha256-equality invariant aggregated per partition
      // (xor never overflows; any single changed row flips it)
      expr("bit_xor(__sha60)").as("sha_checksum"))

    // drift per partition vs the frozen reference
    val hist = Drift.histogram(waveDf, col("__part"),
      Drift.bucketize(length(col(contentCol)), histLo, histHi, histBuckets))
    val psiDf = Drift.psi(hist, refHist)
      .select(col("part").as("part_id"), col("psi"))

    metrics.join(psiDf, Seq("part_id"), "left")
      .collect().toSeq.map { r =>
        val partId = r.getAs[Int]("part_id")
        val rc = r.getAs[Long]("row_count")
        val vc = Option(r.getAs[Any]("violation_count"))
          .map(_.toString.toLong).getOrElse(0L)
        val inv = r.getAs[Long]("invalid_rows")
        val psi = Option(r.getAs[Any]("psi"))
          .map(_.toString.toDouble).getOrElse(0.0)
        PartitionResult(partId, spec, rc, vc, inv,
          r.getAs[Long]("sha_checksum"), psi,
          passed = inv.toDouble / rc <= maxViolationRate && psi <= maxPsi,
          attempt = done.getOrElse(partId, 0) + 1,
          completed_at_ms = System.currentTimeMillis())
      }
  }

  /** One `model_construct` wave: trusted ingest — rows counted and
   * sha-checksummed for lineage, no validation plan, no violation rows,
   * no drift gate; every partition passes and is flagged `constructed`. */
  private def constructWave(waveDf: DataFrame, contentCol: String,
                            spec: String, done: Map[Int, Int])
  : Seq[PartitionResult] =
    waveDf
      .withColumn("__sha60", coalesce(graft.text.TextOps.hash60(
        TableChecks.sha256(col(contentCol))), lit(0L)))
      .groupBy(col("__part").as("part_id")).agg(
        count(lit(1)).as("row_count"),
        expr("bit_xor(__sha60)").as("sha_checksum"))
      .collect().toSeq.map { r =>
        PartitionResult(r.getAs[Int]("part_id"), spec,
          r.getAs[Long]("row_count"), 0L, 0L,
          r.getAs[Long]("sha_checksum"), 0.0, passed = true,
          attempt = done.getOrElse(r.getAs[Int]("part_id"), 0) + 1,
          completed_at_ms = System.currentTimeMillis(), constructed = true)
      }

  /** Per-wave observability rows ([[WaveMetrics]]), or empty. */
  def metrics(spark: SparkSession, outDir: String): DataFrame =
    metrics(spark, new ParquetDirIO(outDir))

  def metrics(spark: SparkSession, io: TableIO): DataFrame =
    io.metrics(spark).getOrElse(spark.emptyDataFrame)

  /** All committed partition results (latest attempt per partition).
   * `specHash` filters the ledger to one spec lineage — pass it whenever
   * the state dir may hold runs under more than one spec, otherwise an
   * old-spec commit would gate reads of the current run. */
  def results(spark: SparkSession, outDir: String,
              specHash: Option[String] = None): DataFrame =
    results(spark, new ParquetDirIO(outDir), specHash)

  def results(spark: SparkSession, io: TableIO,
              specHash: Option[String]): DataFrame = {
    val raw0 = io.ledger(spark) match {
      case None => return spark.emptyDataFrame
      case Some(df) => df
    }
    val raw = specHash.fold(raw0)(h => raw0.filter(col("spec_hash") === h))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("part_id").orderBy(col("attempt").desc)
    raw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Violations of committed partitions only (ledger-gated read — orphan
   * rows from killed waves are invisible). The gate joins on
   * (spec_hash, part_id), matching the sink layout. */
  def violations(spark: SparkSession, outDir: String,
                 specHash: Option[String] = None): DataFrame =
    violations(spark, new ParquetDirIO(outDir), specHash)

  def violations(spark: SparkSession, io: TableIO,
                 specHash: Option[String]): DataFrame = {
    val committed = results(spark, io, specHash)
      .select("spec_hash", "part_id")
    io.readViolations(spark)
      .join(committed, Seq("spec_hash", "part_id"), "left_semi")
  }

  /** Run-to-run regression diff over two committed runs' violation sinks
   * (the scheduled-validation alert surface): each (key, loc, type)
   * violation identity classified `new` / `fixed` / `persisting` by
   * [[TableChecks.violationDiff]]. Both sides are ledger-gated reads, so
   * orphan rows from killed waves can't fabricate regressions; the two
   * runs may differ in spec (the normal cause of new/fixed classes) or
   * share one (pure data drift between table snapshots). */
  def regressionDiff(spark: SparkSession, outDir: String, curSpec: String,
                     prevSpec: String): DataFrame =
    regressionDiff(spark, new ParquetDirIO(outDir), curSpec, prevSpec)

  def regressionDiff(spark: SparkSession, io: TableIO, curSpec: String,
                     prevSpec: String): DataFrame =
    TableChecks.violationDiff(
      violations(spark, io, Some(curSpec)).select("key", "loc", "type"),
      violations(spark, io, Some(prevSpec)).select("key", "loc", "type"),
      Seq("key", "loc", "type"))
}
