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
 * the scale path, and embedding-cosine near-duplicate pairs.
 *
 * Reference anchor: none in pydantic (it has no vector ops) — this is the
 * training-data-pipeline extension mandated by the build brief.
 *
 * Scale design:
 *  - Brute force is exact but O(|Q|·|C|): only usable when the query side
 *    is broadcastable. The query set is broadcast so the corpus is a single
 *    map-only pass (no corpus shuffle), with per-partition top-k partial
 *    aggregation before the final k-merge.
 *  - LSH replaces the cross product with an equi-join on bucket signatures:
 *    corpus shuffles once by bucket; recall is tuned by (planes, tables).
 *  - All arithmetic is in-order double folds so results are bit-identical
 *    across engines (the DuckDB oracle replays the same plan).
 */
object Similarity {

  /** Dot product over a STATIC dimension as a left-associated chain of
   * element products — bit-identical to an in-order left fold (matches
   * DuckDB's list_reduce) but, unlike array higher-order functions (which
   * are CodegenFallback, interpreted per element), stays entirely inside
   * whole-stage codegen. */
  def dot(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast(DoubleType) *
        element_at(b, i + 1).cast(DoubleType)
    }.reduceLeft(_ + _)

  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity; elementwise double arithmetic in array order. */
  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

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

  /** LSH bucket signature: bit p set iff dot(vec, plane_p) > 0. Plane
   * components are literals, so each dot is a static codegen'd chain. */
  def lshBucket(vec: Column, planes: Seq[Seq[Int]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val d = plane.zipWithIndex.map { case (c, i) =>
        element_at(vec, i + 1).cast(DoubleType) * lit(c.toDouble)
      }.reduceLeft(_ + _)
      when(d > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  // ------------------------------------------------------------ brute force

  /**
   * Exact cosine top-k: every query row against the whole corpus.
   * `queries` is broadcast (must be small); the corpus side never shuffles —
   * the only shuffle is the final per-query top-k window over
   * |Q|·|C| candidate rows reduced map-side by nothing... so for large
   * corpora prefer [[annLsh]]. Deterministic total order:
   * (cosine desc, corpus id asc).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int, dim: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(qVec).as("__qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv"), dim).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /**
   * LSH-bucketed approximate top-k: candidates are corpus rows sharing the
   * query's bucket signature; exact cosine + top-k within candidates.
   * One corpus shuffle on the bucket key; query side broadcast. Recall
   * rises with fewer planes (bigger buckets) or more tables (union of
   * several plane sets).
   */
  def annLsh(queries: DataFrame, corpus: DataFrame,
             qId: String, qVec: String, cId: String, cVec: String,
             k: Int, planes: Seq[Seq[Int]]): DataFrame = {
    val dim = planes.head.size
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(qVec).as("__qv"), lshBucket(col(qVec), planes).as("__bucket")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("__cv"),
      lshBucket(col(cVec), planes).as("__bucket"))
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv"), dim).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  // -------------------------------------------------------------------- IVF

  /** IVF coarse quantizer: deterministic sample of corpus vectors as
   * centroids (every `corpusSize/k`-th id — one tiny collect; real k-means
   * refinement would iterate the same assignment below). Returns
   * (centroidId, vector-as-doubles). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int): Seq[(Int, Seq[Double])] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(idCol))
    val n = corpus.count()
    val step = math.max(1L, n / k)
    corpus.select(col(idCol), col(vecCol))
      .withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % step === 0)
      .limit(k)
      .select(col(vecCol))
      .collect().toIndexedSeq.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).map(_.toDouble).toSeq
      }
  }

  /** Nearest-centroid id (argmin squared L2 over literal centroids; static
   * codegen'd chains). */
  def ivfAssign(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
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
   * multi-probe). */
  def ivfProbes(vec: Column, centroids: Seq[(Int, Seq[Double])],
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
   * rank candidates by exact cosine. Compared to LSH, recall is controlled
   * directly by nprobe and cells balance better under skewed embedding
   * distributions (a hot hyperplane bucket has no analog here: cells have
   * ~|corpus|/k vectors by construction of sampled centroids).
   */
  def annIvf(queries: DataFrame, corpus: DataFrame,
             qId: String, qVec: String, cId: String, cVec: String,
             k: Int, dim: Int, centroids: Seq[(Int, Seq[Double])],
             nprobe: Int = 2): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(qVec).as("__qv"),
      explode(ivfProbes(col(qVec), centroids, nprobe)).as("__cell")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("__cv"),
      ivfAssign(col(cVec), centroids).as("__cell"))
    val scored = q.join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv"), dim).as("cos"))
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
   * ~|corpus|·bucket_load instead of |corpus|²; exactness within a bucket.
   */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, planes: Seq[Seq[Int]]): DataFrame = {
    val dim = planes.head.size
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val l = sig.select(col("__bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = sig.select(col("__bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb"), dim).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
