package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over embedding columns (`array<float>`): brute-force
 * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
 * the scale path, IVF cells as the balanced-partition path, and
 * embedding-cosine near-duplicate pairs.
 *
 * Reference anchor: none in pydantic (it has no vector ops) — this is the
 * training-data-pipeline extension mandated by the build brief.
 *
 * Scale design (round-2 revision after the round-1 audit):
 *  - Vectors are L2-NORMALIZED ONCE PER ROW before any join, so a pair's
 *    cosine is a single dot product (the round-1 code recomputed both norms
 *    per PAIR — 3x the arithmetic on the quadratic side of the join).
 *  - LSH plane count SCALES WITH CORPUS SIZE ([[planesForCount]]): buckets
 *    ~ n/targetLoad, so candidate pairs stay ~n·targetLoad instead of
 *    O(n²/2^planes) with a fixed plane count.
 *  - Degenerate buckets (boilerplate/zero vectors) are dropped by a
 *    `maxBucket` guard before the self-join, mirroring
 *    [[graft.dedup.Dedup.minhashLshPairs]].
 *  - All arithmetic is in-order double folds so results are bit-identical
 *    across engines (the DuckDB oracle replays the same plan).
 */
object Similarity {

  /** Dot product: a single native Catalyst expression node
   * ([[graft.functions.VectorDot]]) whose doGenCode emits a primitive
   * accumulation loop inside whole-stage codegen. Bit-identical to an
   * in-order left fold (matches DuckDB's list_reduce replay in the
   * oracle) and to round 1's 64-node element_at chain, at 1/dim the plan
   * size. `dim` is kept in the signature for call-site documentation;
   * the loop bounds itself by the arrays' length. */
  def dot(a: Column, b: Column, dim: Int): Column =
    graft.functions.VectorOps.vectorDot(a, b)

  /** Round-1 chain form, kept for plan-size/equivalence tests. */
  private[graft] def dotChain(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast(DoubleType) *
        element_at(b, i + 1).cast(DoubleType)
    }.reduceLeft(_ + _)

  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity; elementwise double arithmetic in array order.
   * Prefer pre-normalizing with [[withNormalized]] + [[dot]] when the same
   * vector participates in many pairs. */
  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /**
   * Add an `array<double>` column `out` = vec/‖vec‖, computed in TWO
   * projections (norm first, then the divides). Deliberately not one
   * expression: inlining the norm into each of the `dim` divides would
   * duplicate the 64-term dot chain 64 times; with a separate column,
   * CollapseProject keeps the projections apart (it refuses to duplicate
   * non-cheap expressions) and both stay in whole-stage codegen.
   */
  def withNormalized(df: DataFrame, vecCol: String, out: String,
                     dim: Int): DataFrame =
    df.withColumn("__nrm", norm(col(vecCol), dim))
      .withColumn(out, array((0 until dim).map(i =>
        element_at(col(vecCol), i + 1).cast(DoubleType) / col("__nrm")): _*))
      .drop("__nrm")

  // ---------------------------------------------------- deterministic planes

  /** Engine-portable pseudo-random hyperplanes: component d of plane p is
   * (h % 2001) - 1000 where h = first 15 hex chars of md5("p_d") parsed
   * base-16 — integer components so both engines compute identical dots.
   * Regenerable in SQL: CAST(concat('0x', substr(md5(p||'_'||d),1,15)) AS
   * BIGINT) % 2001 - 1000. */
  def portablePlanes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        md.reset()
        val hex = md.digest(s"${p}_$d".getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.take(15)
        ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L).toInt
      }
    }
  }

  /**
   * Plane count scaled to the corpus: 2^p buckets ≈ n/targetLoad, so the
   * expected bucket load (and with it the per-row candidate count) stays
   * CONSTANT as the corpus grows — the round-1 fixed-plane design degraded
   * quadratically. `+0.5` nudges the log2 argument off exact integers so
   * Spark's log/DuckDB's log2 can't disagree at a ceil boundary.
   * Clamped to [4, 30] (16 buckets to ~10^9 buckets).
   */
  def planesForCount(n: Long, targetLoad: Double = 8.0): Int = {
    val raw = math.ceil(
      math.log((n + 0.5) / targetLoad) / math.log(2.0)).toInt
    math.max(4, math.min(30, raw))
  }

  /** LSH bucket signature: bit p set iff dot(vec, plane_p) > 0 — ONE
   * native codegen'd node ([[graft.functions.VectorLshBucket]], planes×dim
   * primitive loop). The Column-chain form ([[lshBucketChain]]) is ~dim·3
   * nodes per plane and dominated multi-table plans; semantics (in-order
   * folds, null -> bucket 0) are bit-identical — pinned by spec test.
   * Scale-invariant: normalized and raw vectors land in the same bucket. */
  def lshBucket(vec: Column, planes: Seq[Seq[Int]]): Column =
    graft.functions.VectorOps.lshBucket(vec, planes)

  /** Round-1 Column-chain form of [[lshBucket]], kept for the equivalence
   * test. */
  private[graft] def lshBucketChain(vec: Column, planes: Seq[Seq[Int]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val d = plane.zipWithIndex.map { case (c, i) =>
        element_at(vec, i + 1).cast(DoubleType) * lit(c.toDouble)
      }.reduceLeft(_ + _)
      when(d > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Drop rows in buckets larger than `maxBucket` (window count — the
   * bucket census never hits the driver). A bucket with 10^6 vectors is a
   * degenerate plane cut (zero/boilerplate embeddings), and self-joining it
   * would emit 10^12 pairs. */
  private def guardBuckets(df: DataFrame, bucketCol: String,
                           maxBucket: Long): DataFrame = {
    val w = Window.partitionBy(bucketCol)
    df.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
  }

  // ------------------------------------------------------------ brute force

  /**
   * Exact cosine top-k: every query row against the whole corpus.
   * `queries` is broadcast (must be small); the corpus side never shuffles.
   * Both sides pre-normalized, so each of the |Q|·|C| candidates costs ONE
   * dot product. Deterministic total order: (cosine desc, corpus id asc).
   * For large corpora prefer [[annLsh]]/[[annIvf]].
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int, dim: Int): DataFrame = {
    val q = broadcast(
      withNormalized(queries.select(col(qId).as("query_id"),
        col(qVec).as("__qv")), "__qv", "__qn", dim).drop("__qv"))
    val c = withNormalized(corpus.select(col(cId).as("neighbor_id"),
      col(cVec).as("__cv")), "__cv", "__cn", dim).drop("__cv")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("__qn"), col("__cn"), dim).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /**
   * LSH-bucketed approximate top-k: candidates are corpus rows sharing the
   * query's bucket signature; exact cosine (one dot — pre-normalized) +
   * top-k within candidates. One corpus shuffle on the bucket key; query
   * side broadcast; degenerate buckets dropped by `maxBucket`. Recall
   * rises with fewer planes (bigger buckets) or more tables (union of
   * several plane sets).
   */
  def annLsh(queries: DataFrame, corpus: DataFrame,
             qId: String, qVec: String, cId: String, cVec: String,
             k: Int, planes: Seq[Seq[Int]],
             maxBucket: Long = 100000L): DataFrame = {
    val dim = planes.head.size
    val q = broadcast(
      withNormalized(queries.select(col(qId).as("query_id"),
        col(qVec).as("__qv")), "__qv", "__qn", dim)
        .select(col("query_id"), col("__qn"),
          lshBucket(col("__qv"), planes).as("__bucket")))
    val c0 = withNormalized(corpus.select(col(cId).as("neighbor_id"),
      col(cVec).as("__cv")), "__cv", "__cn", dim)
      .select(col("neighbor_id"), col("__cn"),
        lshBucket(col("__cv"), planes).as("__bucket"))
    val c = guardBuckets(c0, "__bucket", maxBucket)
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("__qn"), col("__cn"), dim).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /**
   * Multi-table LSH ANN — the recall knob: L independent plane sets, a
   * vector lands in one bucket PER TABLE, and a true neighbor is a
   * candidate if it collides in ANY table (recall 1-(1-p)^L vs p for one
   * table). Plan shape stays single-join: each row explodes to L
   * (tableIdx, bucket) rows and the candidate join is ONE equi-join on
   * (tableIdx, bucket); pairs are DEDUPED (distinct ids) before the dot
   * product, so a pair colliding in several tables is scored once. The
   * per-(table,bucket) maxBucket guard and the corpus-scaled plane count
   * carry over from [[annLsh]].
   */
  def annLshMulti(queries: DataFrame, corpus: DataFrame,
                  qId: String, qVec: String, cId: String, cVec: String,
                  k: Int, planeSets: Seq[Seq[Seq[Int]]],
                  maxBucket: Long = 100000L): DataFrame = {
    val dim = planeSets.head.head.size
    def sigs(vec: Column): Column =
      array(planeSets.map(ps => lshBucket(vec, ps)): _*)
    val qn = broadcast(
      withNormalized(queries.select(col(qId).as("query_id"),
        col(qVec).as("__qv")), "__qv", "__qn", dim)
        .select(col("query_id"), col("__qn")))
    val cn = withNormalized(corpus.select(col(cId).as("neighbor_id"),
      col(cVec).as("__cv")), "__cv", "__cn", dim)
      .select(col("neighbor_id"), col("__cn"))
    val qb = broadcast(queries.select(col(qId).as("query_id"),
      posexplode(sigs(col(qVec))).as(Seq("__t", "__bucket"))))
    val cb0 = corpus.select(col(cId).as("neighbor_id"),
      posexplode(sigs(col(cVec))).as(Seq("__t", "__bucket")))
    val w = Window.partitionBy("__t", "__bucket")
    val cb = cb0.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val cand = qb.join(cb, Seq("__t", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cand.join(qn, "query_id").join(cn, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        dot(col("__qn"), col("__cn"), dim).as("cos"))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  // -------------------------------------------------------------------- IVF

  /** IVF coarse quantizer: k deterministic pseudo-random corpus vectors as
   * centroids — the k smallest xxhash64(id) via a distributed top-k
   * (TakeOrderedAndProject: per-partition heaps, driver merges k rows).
   * No count() pass, no global window, no sorted collect — the round-1
   * version pushed the whole corpus through one task. Returns
   * (centroidId, vector-as-doubles); refine with [[ivfRefine]]. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int): Seq[(Int, Seq[Double])] =
    corpus.select(col(vecCol).as("__v"), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"))
      .limit(k)
      .select(col("__v"))
      .collect().toIndexedSeq.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).map(_.toDouble).toSeq
      }

  /** Portable variant of [[ivfCentroids]]: seed order comes from the first
   * 15 hex chars of md5(id) parsed base-16 — a hash any engine can replay
   * (the s_ann_ivf DuckDB oracle recomputes the same seeds), unlike
   * xxhash64. Same distributed top-k shape (TakeOrderedAndProject); use
   * [[ivfCentroids]] when cross-engine replay is not needed (xxhash64 is
   * one codegen'd node vs md5+conv). */
  def ivfCentroidsPortable(corpus: DataFrame, idCol: String, vecCol: String,
                           k: Int): Seq[(Int, Seq[Double])] =
    corpus.select(col(vecCol).as("__v"),
        conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
          .cast(LongType).as("__h"))
      .orderBy(col("__h"))
      .limit(k)
      .select(col("__v"))
      .collect().toIndexedSeq.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).map(_.toDouble).toSeq
      }

  /** One Lloyd (k-means) refinement pass: assign every vector to its
   * nearest centroid, recompute each cell's mean — ONE map-side-combined
   * aggregation (dim avg-aggregates per cell, no shuffle of vectors beyond
   * the k·dim partial sums). Cells that captured no vectors keep their old
   * centroid. Call 1-3 times for balanced cells; each pass is one job. */
  def ivfRefine(corpus: DataFrame, vecCol: String,
                centroids: Seq[(Int, Seq[Double])], dim: Int)
      : Seq[(Int, Seq[Double])] = {
    val assigned = corpus.select(col(vecCol).as("__v"))
      .withColumn("__cell", ivfAssign(col("__v"), centroids))
    val avgs = (0 until dim).map(i =>
      avg(element_at(col("__v"), i + 1).cast(DoubleType)).as(s"c$i"))
    val means = assigned.groupBy("__cell").agg(avgs.head, avgs.tail: _*)
      .collect().map { r =>
        r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1))
      }.toMap
    centroids.map { case (cid, old) =>
      cid -> means.getOrElse(cid, old).toSeq
    }
  }

  /** Nearest-centroid id: ONE native codegen'd node
   * ([[graft.functions.VectorNearestCells]] — k×dim primitive loop).
   * The Column-chain form ([[ivfAssignChain]]) builds ~k·dim·4 nodes and
   * ICEd Janino on the enclosing sort stage; semantics are bit-identical
   * (in-order d2 folds, ties to the smaller cid — pinned by
   * StatefulAndIvfSpec). Assumes centroid ids are 0..k-1 in order, as
   * [[ivfCentroids]]/[[ivfCentroidsPortable]] emit. */
  def ivfAssign(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    // null/short vectors: every chain d2 is NULL, so the chain's tie-reduce
    // keeps the FIRST cid — coalesce reproduces that (and the oracle's
    // all-ties ORDER BY d2, cid)
    coalesce(
      element_at(graft.functions.VectorOps.nearestCells(
        vec, centroids.sortBy(_._1).map(_._2), 1), 1),
      lit(centroids.map(_._1).min))

  /** Round-1 Column-chain form of [[ivfAssign]], kept for the
   * native-vs-chain equivalence test. */
  private[graft] def ivfAssignChain(vec: Column,
                                    centroids: Seq[(Int, Seq[Double])]): Column =
    centroids.map { case (cid, cvec) =>
      val d2 = cvec.zipWithIndex.map { case (cv, i) =>
        val diff = element_at(vec, i + 1).cast(DoubleType) - lit(cv)
        diff * diff
      }.reduceLeft(_ + _)
      struct(d2.as("d2"), lit(cid).as("cid"))
    }.reduce { (a, b) =>
      when(b.getField("d2") < a.getField("d2"), b).otherwise(a)
    }.getField("cid")

  /** `nprobe` nearest centroid ids, as an array column (for query-side
   * multi-probe) — same native node as [[ivfAssign]]. */
  def ivfProbes(vec: Column, centroids: Seq[(Int, Seq[Double])],
                nprobe: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    // null/short vectors: all-NULL d2 ties -> first nprobe cids in cid
    // order, matching the chain's array_sort and the oracle's ORDER BY
    coalesce(
      graft.functions.VectorOps.nearestCells(vec, sorted.map(_._2), nprobe),
      typedLit(sorted.map(_._1).take(math.min(nprobe, sorted.size))))
  }

  /** Round-1 Column-chain form of [[ivfProbes]] (array_sort over
   * struct(d2,cid) literals), kept for the equivalence test. */
  private[graft] def ivfProbesChain(vec: Column, centroids: Seq[(Int, Seq[Double])],
                                    nprobe: Int): Column = {
    val scored = array(centroids.map { case (cid, cvec) =>
      val d2 = cvec.zipWithIndex.map { case (cv, i) =>
        val diff = element_at(vec, i + 1).cast(DoubleType) - lit(cv)
        diff * diff
      }.reduceLeft(_ + _)
      struct(d2.as("d2"), lit(cid).as("cid"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cid"))
  }

  /**
   * IVF ANN: corpus partitioned into centroid cells (ONE pass to assign +
   * one shuffle by cell), queries probe their `nprobe` nearest cells and
   * rank candidates by exact cosine (one dot — pre-normalized). Compared
   * to LSH, recall is controlled directly by nprobe and cells balance
   * better under skewed embedding distributions; [[ivfRefine]] passes
   * tighten the balance further.
   */
  def annIvf(queries: DataFrame, corpus: DataFrame,
             qId: String, qVec: String, cId: String, cVec: String,
             k: Int, dim: Int, centroids: Seq[(Int, Seq[Double])],
             nprobe: Int = 2): DataFrame = {
    val q = broadcast(
      withNormalized(queries.select(col(qId).as("query_id"),
        col(qVec).as("__qv")), "__qv", "__qn", dim)
        .select(col("query_id"), col("__qn"),
          explode(ivfProbes(col("__qv"), centroids, nprobe)).as("__cell")))
    val c = withNormalized(corpus.select(col(cId).as("neighbor_id"),
      col(cVec).as("__cv")), "__cv", "__cn", dim)
      .select(col("neighbor_id"), col("__cn"),
        ivfAssign(col("__cv"), centroids).as("__cell"))
    val scored = q.join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("__qn"), col("__cn"), dim).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: vectors in the same LSH bucket
   * with cosine >= threshold. The equi-join on bucket keeps the pair count
   * ~|corpus|·bucket_load instead of |corpus|²; buckets above `maxBucket`
   * are dropped (degenerate cuts); each surviving pair costs ONE dot
   * product over the pre-normalized vectors.
   */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, planes: Seq[Seq[Int]],
                   maxBucket: Long = 100000L): DataFrame = {
    val dim = planes.head.size
    val sig0 = withNormalized(
      df.select(col(idCol).as("id"), col(vecCol).as("__v")),
      "__v", "nv", dim)
      .select(col("id"), col("nv"), lshBucket(col("__v"), planes).as("__bucket"))
    val sig = guardBuckets(sig0, "__bucket", maxBucket)
    val l = sig.select(col("__bucket"), col("id").as("id_a"), col("nv").as("va"))
    val r = sig.select(col("__bucket"), col("id").as("id_b"), col("nv").as("vb"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        dot(col("va"), col("vb"), dim).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** [[nearDupPairs]] with the plane count derived from the corpus size
   * (see [[planesForCount]]). The count() is a parquet-metadata read on
   * file sources — not a data scan. */
  def nearDupPairsAuto(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, dim: Int,
                       targetLoad: Double = 8.0,
                       maxBucket: Long = 100000L): DataFrame = {
    val planes = portablePlanes(planesForCount(df.count(), targetLoad), dim)
    nearDupPairs(df, idCol, vecCol, threshold, planes, maxBucket)
  }
}
