package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.checks.Drift

/**
 * Streaming distribution-drift monitor: PSI of each event-time window's
 * metric histogram against a batch-profiled reference histogram —
 * the streaming face of [[graft.checks.Drift]] (same epsilon-smoothed
 * closed form, same bucketizer, same ref-bucket term set, so a window's
 * PSI equals the batch PSI of the same rows up to float-fold reordering —
 * batch sums terms in hash-aggregate order, this folds by ascending
 * bucket; StreamingSpec pins agreement to 1e-12).
 *
 * Plan shape: ONE watermarked `groupBy(window)` aggregation whose
 * per-bucket counts are conditional sums over the FIXED bucket count
 * (no second streaming aggregation — chained stateful operators stay
 * out of the plan), then a STATELESS projection folds the PSI terms with
 * the reference proportions baked in as literals. State per window is one
 * row of `nBuckets` longs; the watermark bounds the number of live
 * windows, so state is O(windows x buckets) regardless of row volume.
 */
object StreamDrift {

  /** Profile a batch reference DataFrame into the bucket-count vector the
   * monitor needs (tiny: `nBuckets` longs; collect is intentional). */
  def referenceHistogram(ref: DataFrame, metric: Column,
                         lo: Double, hi: Double, nBuckets: Int): Seq[Long] = {
    val m = Drift.histogram(ref, lit("all"), Drift.bucketize(metric, lo, hi, nBuckets))
      .select(col("bucket"), col("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until nBuckets).map(b => m.getOrElse(b, 0L))
  }

  /**
   * Windowed PSI: emits one row per closed event-time window —
   * (window_start, window_end, n_rows, psi, drifted). `drifted` is
   * `psi > threshold` (0.2 = the conventional "significant shift" bound,
   * matching the batch check's default in SparkEntry).
   */
  def psiByWindow(stream: DataFrame, metric: Column, tsCol: String,
                  lo: Double, hi: Double, nBuckets: Int,
                  refHist: Seq[Long],
                  windowDur: String, watermark: String,
                  eps: Double = 1e-4,
                  threshold: Double = 0.2): DataFrame = {
    require(refHist.size == nBuckets, s"refHist must have $nBuckets entries")
    val refTotal = refHist.sum.toDouble
    val q = refHist.map(_ / refTotal)
    val bucket = Drift.bucketize(metric, lo, hi, nBuckets)
    val bucketCounts = (0 until nBuckets).map(b =>
      sum(when(bucket === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(bucketCounts.head, bucketCounts.tail: _*)
    val total = (0 until nBuckets).map(b => col(s"c$b")).reduce(_ + _)
    // same smoothed closed form as Drift.psi: term_b =
    // (max(p,eps)-max(q,eps)) * ln(max(p,eps)/max(q,eps)), q as literals.
    // Terms run over the REFERENCE's populated buckets only — exactly the
    // batch grid (partTot x ref), so window PSI == batch PSI on equal rows.
    val psi = (0 until nBuckets).filter(b => refHist(b) > 0).map { b =>
      val p = greatest(col(s"c$b").cast("double") / col("n_rows"), lit(eps))
      val qb = lit(math.max(q(b), eps))
      (p - qb) * log(p / qb)
    }.reduce(_ + _)
    agged
      .withColumn("n_rows", total)
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_rows"),
        psi.as("psi"))
      .withColumn("drifted", col("psi") > threshold)
  }
}
