package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.similarity.Similarity

class VectorOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("vectorDot: bit-identical to the element_at chain on float arrays") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f, 0.1f), Seq(0.5f, 4.0f, -1.5f, 7.3f)),
      (Seq(0f, 0f, 0f, 0f), Seq(1f, 2f, 3f, 4f)),
      (Seq(1e-7f, 1e7f, -1e-7f, 1e7f), Seq(1e7f, 1e-7f, 1e7f, 1e-7f))
    ).toDF("a", "b")
    val out = df.select(
      VectorOps.vectorDot(col("a"), col("b")).as("native"),
      Similarity.dotChain(col("a"), col("b"), 4).as("chain")
    ).as[(Double, Double)].collect()
    out.foreach { case (n, c) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(c))
    }
  }

  test("vectorDot: double arrays, null array, and interpreted eval agree") {
    val df = Seq(
      (Some(Seq(1.1, 2.2)), Some(Seq(3.3, 4.4))),
      (None, Some(Seq(1.0, 2.0)))
    ).toDF("a", "b")
    val rows = df.select(VectorOps.vectorDot(col("a"), col("b")).as("d"))
      .collect()
    assert(math.abs(rows(0).getDouble(0) - (1.1 * 3.3 + 2.2 * 4.4)) == 0.0)
    assert(rows(1).isNullAt(0))
    // interpreted path (eval): wrap in a non-codegen context via collect on
    // a literal-only plan after disabling codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r2 = df.select(VectorOps.vectorDot(col("a"), col("b"))).collect()
      assert(r2(0).getDouble(0) == rows(0).getDouble(0))
      assert(r2(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vectorDot: whole-stage codegen keeps the projection fused") {
    // spark.range source: a literal local relation would be constant-folded
    // away by ConvertToLocalRelation and carry no codegen stage at all
    val df = spark.range(16).select(
      array((0 to 2).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((0 to 2).map(i => (col("id") * 2 + i).cast("float")): _*).as("b"))
    val plan = df.select(VectorOps.vectorDot(col("a"), col("b")).as("d"))
      .queryExecution.executedPlan
    // the projection must carry a codegen stage (WholeStageCodegenExec root)
    assert(plan.toString.contains("*(1)"),
      s"expected whole-stage codegen in:\n$plan")
  }

  test("lshBucket: native node is bit-identical to the chain, null -> bucket 0") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = Similarity.portablePlanes(12, 64)
    val bad = e.select(
      Similarity.lshBucket(col("embedding"), planes).as("native"),
      Similarity.lshBucketChain(col("embedding"), planes).as("chain"))
      .filter(col("native") =!= col("chain")).count()
    assert(bad == 0)
    // chain semantics on nulls: when(d > 0, ...).otherwise(0) -> bucket 0
    val nulls = e.limit(1).select(
      Similarity.lshBucket(lit(null).cast("array<float>"), planes).as("n"),
      Similarity.lshBucketChain(lit(null).cast("array<float>"), planes).as("c"))
      .collect().head
    assert(nulls.getLong(0) == 0L && nulls.getLong(1) == 0L)
    // short vector: the ANSI chain THROWS on past-end element_at, but the
    // DuckDB oracle's list indexing yields NULL dots -> bucket 0; the
    // native node follows the ORACLE (the driver-compare ground truth)
    val short = e.limit(1).select(
      Similarity.lshBucket(array(lit(1.0f)), planes).as("n"))
      .collect().head
    assert(short.getLong(0) == 0L)
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val bad2 = e.select(
        Similarity.lshBucket(col("embedding"), planes).as("native"),
        Similarity.lshBucketChain(col("embedding"), planes).as("chain"))
        .filter(col("native") =!= col("chain")).count()
      assert(bad2 == 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("annLshMulti: recall dominates single-table at every rank") {
    val dim = 16
    val vecs = (0L until 60L).map { i =>
      i -> (0 until dim).map(d =>
        (((i * 37 + d * 11) % 19).toFloat - 9f) / 9f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val np = 5
    val sets = Similarity.portablePlanes(3 * np, dim).grouped(np).toSeq
    val single = Similarity.annLsh(df, df, "vec_id", "embedding", "vec_id",
        "embedding", k = 3, planes = sets.head, maxBucket = 1000L)
      .select("query_id", "rank", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, r, c) => (q, r) -> c }.toMap
    val multi = Similarity.annLshMulti(df, df, "vec_id", "embedding",
        "vec_id", "embedding", k = 3, planeSets = sets, maxBucket = 1000L)
      .select("query_id", "rank", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, r, c) => (q, r) -> c }.toMap
    // every single-table hit has a multi-table hit at least as good at the
    // same rank (multi's candidate set is a superset), and multi returns
    // at least as many (query, rank) slots
    assert(multi.size >= single.size)
    single.foreach { case ((q, r), c) =>
      assert(multi.contains((q, r)), s"multi lost ($q, $r)")
      assert(multi((q, r)) >= c - 1e-12, s"multi cos worse at ($q, $r)")
    }
  }

  test("similarity pipelines produce identical results via the native dot") {
    // 6 deterministic 8-dim vectors; brute-force top-2 through the public
    // API (which now routes through VectorDot) vs a driver-side replay
    val vecs = (0L until 6L).map { i =>
      i -> (0 until 8).map(d => ((i * 31 + d * 7) % 13 - 6).toFloat)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df, "vec_id", "embedding",
        "vec_id", "embedding", k = 2, dim = 8)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val expect = (for {
      (qi, qv) <- vecs
      ranked = vecs.filter(_._1 != qi)
        .map { case (ci, cv) => (ci, cos(qv, cv)) }
        .sortBy { case (ci, c) => (-c, ci) }.take(2)
      ((ci, _), r) <- ranked.zipWithIndex
    } yield (qi, (r + 1).toLong, ci)).toSet
    assert(got == expect)
  }
}
