package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-drift checks (PSI + KS) on histograms of a numeric metric
 * (canonically `length(content)`) across table partitions.
 *
 * No reference analog — this generalizes pydantic's per-value range checks
 * (gt/ge/lt/le, `validators/int.rs:125-181`) to per-partition distribution
 * checks (SURVEY §2.3). Both statistics are computed in CLOSED FORM over
 * bucket counts: one groupBy to histogram, one tiny join against the
 * reference histogram, a Window for the KS cumulative sums. No UDAF, no
 * collect — everything stays distributed and the heavy shuffle is the single
 * `groupBy(part, bucket)` whose cardinality is |parts| x |buckets|, not |rows|.
 */
object Drift {

  /** Bucketize `metric` into `nBuckets` fixed-width buckets over [lo, hi];
   * out-of-range values clamp to the edge buckets (so mass is conserved —
   * required for PSI). */
  def bucketize(metric: Column, lo: Double, hi: Double, nBuckets: Int): Column =
    least(greatest(
      floor((metric.cast("double") - lo) / ((hi - lo) / nBuckets)).cast("int"),
      lit(0)), lit(nBuckets - 1))

  /** Histogram: (part, bucket, cnt). */
  def histogram(df: DataFrame, partCol: Column, bucket: Column): DataFrame =
    df.groupBy(partCol.as("part"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /**
   * PSI of every partition against a reference histogram
   * (bucket, ref_cnt). PSI = sum_b (p_b - q_b) * ln(p_b / q_b), with
   * epsilon-smoothed proportions (standard practice; keeps the closed form
   * total). Returns (part, psi).
   */
  def psi(hist: DataFrame, refHist: DataFrame, eps: Double = 1e-4): DataFrame = {
    val refTot = refHist.agg(sum("ref_cnt").as("ref_total"))
    val ref = broadcast(refHist.crossJoin(broadcast(refTot))
      .select(col("bucket"),
        (col("ref_cnt") / col("ref_total")).as("q")))
    val partTot = hist.groupBy("part").agg(sum("cnt").as("part_total"))
    // part x ref-bucket grid so a bucket ABSENT from a partition still
    // contributes its (0 - q)·ln(eps/q) mass; grid size = |parts|·|buckets|.
    val grid = partTot.crossJoin(ref)
    grid
      .join(hist, Seq("part", "bucket"), "left")
      .select(col("part"),
        (coalesce(col("cnt"), lit(0L)) / col("part_total")).as("p"),
        col("q"))
      .select(col("part"),
        ((greatest(col("p"), lit(eps)) - greatest(col("q"), lit(eps))) *
          log(greatest(col("p"), lit(eps)) / greatest(col("q"), lit(eps))))
          .as("term"))
      .groupBy("part").agg(sum("term").as("psi"))
  }

  /**
   * Two-sample KS statistic of every partition against the reference:
   * max over buckets of |CDF_part - CDF_ref|. Cumulative sums via a Window
   * ordered by bucket within each partition key — partition cardinality is
   * |parts| x |buckets| so the window is tiny regardless of table size.
   */
  def ks(hist: DataFrame, refHist: DataFrame): DataFrame = {
    val refTot = refHist.agg(sum("ref_cnt").as("ref_total"))
    val refCdf = broadcast(refHist.crossJoin(broadcast(refTot))
      .select(col("bucket"),
        (sum(col("ref_cnt")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)) / col("ref_total"))
          .as("ref_cdf")))
    val partTot = hist.groupBy("part").agg(sum("cnt").as("part_total"))
    // part x ref-bucket grid (cnt=0 where absent) so the cumulative part CDF
    // is evaluated at EVERY bucket boundary — the sup-gap may sit on a
    // bucket the partition never populated.
    val grid = partTot.crossJoin(broadcast(refCdf.select(col("bucket"), col("ref_cdf"))))
    val w = Window.partitionBy("part").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .join(hist, Seq("part", "bucket"), "left")
      .select(col("part"), col("bucket"), col("ref_cdf"),
        (sum(coalesce(col("cnt"), lit(0L))).over(w) / col("part_total"))
          .as("part_cdf"))
      .select(col("part"), abs(col("part_cdf") - col("ref_cdf")).as("gap"))
      .groupBy("part").agg(max("gap").as("ks"))
  }

  /**
   * Wasserstein-1 (earth mover's) distance of every partition against the
   * reference over the shared bucketing: W1 = binWidth * sum_b
   * |CDF_part(b) - CDF_ref(b)| — the discrete closed form on a fixed-width
   * grid. Same grid/window shape as [[ks]] (SUM of CDF gaps instead of the
   * sup), so the shuffle envelope is identical: |parts| x |buckets| rows.
   * Unlike KS it weighs HOW FAR mass moved, not just the largest gap —
   * the standard complement when bucket distances are meaningful (lengths,
   * counts).
   */
  def wasserstein(hist: DataFrame, refHist: DataFrame,
                  binWidth: Double): DataFrame = {
    val refTot = refHist.agg(sum("ref_cnt").as("ref_total"))
    val refCdf = broadcast(refHist.crossJoin(broadcast(refTot))
      .select(col("bucket"),
        (sum(col("ref_cnt")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)) / col("ref_total"))
          .as("ref_cdf")))
    val partTot = hist.groupBy("part").agg(sum("cnt").as("part_total"))
    val grid = partTot.crossJoin(refCdf)
    val w = Window.partitionBy("part").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .join(hist, Seq("part", "bucket"), "left")
      .select(col("part"), col("ref_cdf"),
        (sum(coalesce(col("cnt"), lit(0L))).over(w) / col("part_total"))
          .as("part_cdf"))
      .select(col("part"), abs(col("part_cdf") - col("ref_cdf")).as("gap"))
      .groupBy("part").agg((sum("gap") * binWidth).as("w1"))
  }

  /**
   * Jensen-Shannon divergence of every partition against the reference:
   * JSD(P,Q) = 0.5*sum_b p*ln(2p/(p+q)) + 0.5*sum_b q*ln(2q/(p+q)), with
   * the 0*ln(0) = 0 convention (terms vanish where a side has no mass, so
   * no epsilon smoothing is needed — unlike PSI, JSD is finite by
   * construction and bounded by ln 2). Symmetric, so threshold tables
   * transfer across which side is "reference".
   */
  def jsd(hist: DataFrame, refHist: DataFrame): DataFrame = {
    val refTot = refHist.agg(sum("ref_cnt").as("ref_total"))
    val ref = broadcast(refHist.crossJoin(broadcast(refTot))
      .select(col("bucket"), (col("ref_cnt") / col("ref_total")).as("q")))
    val partTot = hist.groupBy("part").agg(sum("cnt").as("part_total"))
    // part x ref-bucket grid: a bucket absent from a partition still
    // carries the reference's 0.5*q*ln(2) mass at p=0.
    val grid = partTot.crossJoin(ref)
    val p = coalesce(col("cnt"), lit(0L)) / col("part_total")
    val m = (p + col("q")) / 2
    val term =
      when(p > 0, p * log(p / m) / 2).otherwise(lit(0.0)) +
        when(col("q") > 0, col("q") * log(col("q") / m) / 2).otherwise(lit(0.0))
    grid
      .join(hist, Seq("part", "bucket"), "left")
      .select(col("part"), term.as("term"))
      .groupBy("part").agg(sum("term").as("jsd"))
  }

  /**
   * EXACT two-sample KS as a typed `Aggregator` — the unbucketed flavor
   * (SURVEY §4.2 item 3): input rows are (value, isRef); the state holds
   * per-sample value->count maps (map-side combined, order-independent
   * merge), and finish() walks the union of distinct values once, taking
   * the sup of |CDF_a - CDF_b| at every step boundary.
   *
   * Scale envelope: state size is the number of DISTINCT values in the
   * group — exact KS cannot do better (the statistic is defined over the
   * empirical CDFs' jump points). For continuous metrics at 100 TB use the
   * histogram closed form ([[ks]]); this form is for discrete/bounded
   * metrics (lengths, counts, bucketized values), where it equals [[ks]]
   * run on the same discretization — pinned by ChecksSpec's property test.
   */
  final case class KsState(a: Map[Double, Long], b: Map[Double, Long])

  class ExactKsAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Boolean), KsState, Double] {
    override def zero: KsState = KsState(Map.empty, Map.empty)
    private def bump(m: Map[Double, Long], k: Double): Map[Double, Long] =
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    override def reduce(s: KsState, in: (Double, Boolean)): KsState =
      if (in._2) s.copy(b = bump(s.b, in._1)) else s.copy(a = bump(s.a, in._1))
    private def mergeMaps(x: Map[Double, Long],
                          y: Map[Double, Long]): Map[Double, Long] =
      y.foldLeft(x) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
    override def merge(s1: KsState, s2: KsState): KsState =
      KsState(mergeMaps(s1.a, s2.a), mergeMaps(s1.b, s2.b))
    override def finish(s: KsState): Double = {
      val na = s.a.valuesIterator.sum.toDouble
      val nb = s.b.valuesIterator.sum.toDouble
      if (na == 0 || nb == 0) return 0.0
      var ca = 0L; var cb = 0L; var best = 0.0
      (s.a.keySet ++ s.b.keySet).toArray.sorted.foreach { k =>
        ca += s.a.getOrElse(k, 0L); cb += s.b.getOrElse(k, 0L)
        val gap = math.abs(ca / na - cb / nb)
        if (gap > best) best = gap
      }
      best
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[KsState] =
      org.apache.spark.sql.Encoders.product[KsState]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** [[ExactKsAgg]] as an untyped aggregate column over
   * (value double, isRef boolean). */
  def exactKs(value: Column, isRef: Column): Column =
    udaf(new ExactKsAgg()).apply(value.cast("double"), isRef)

  /** End-to-end drift verdicts for `metric` across `partCol`:
   * reference = the global distribution. Returns
   * (part, psi, ks, drifted = psi > psiThreshold || ks > ksThreshold). */
  def driftVerdicts(df: DataFrame, partCol: Column, metric: Column,
                    lo: Double, hi: Double, nBuckets: Int = 50,
                    psiThreshold: Double = 0.2,
                    ksThreshold: Double = 0.15): DataFrame = {
    val b = bucketize(metric, lo, hi, nBuckets)
    val hist = histogram(df, partCol, b).cache()
    val refHist = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
    val p = psi(hist, refHist)
    val k = ks(hist, refHist)
    p.join(k, Seq("part"), "outer")
      .select(col("part"), col("psi"), col("ks"),
        (col("psi") > psiThreshold || col("ks") > ksThreshold).as("drifted"))
  }
}
