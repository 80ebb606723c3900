package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic scale mirrors of the driver's testdata, for scale-proofing
 * above sf0.1 (round-4 order #1) and for the skewed-corpus demo (#7) —
 * the driver's own tables stay read-only; mirrors land under /tmp.
 *
 * `runMain graft.DataGen <srcDir> <outDir> <factor> [skewPct]`
 *
 * Copy semantics (copy k of `factor`; k=0 is the original rows):
 *  - all key columns shift by k*span so per-copy join structure (orders ->
 *    lineitem, customer RI, ...) is preserved exactly;
 *  - document text: every NON-stopword token gets a per-copy suffix — a
 *    token bijection, so intra-copy shingle-set Jaccard (near-dup truth)
 *    is EXACTLY preserved, language-ID/stopword stats are unchanged, and
 *    cross-copy shingle overlap collapses to rare all-stopword 3-grams
 *    (far below the 0.5 near-dup threshold). Dup RATE thus stays constant
 *    with scale — the property linear scaling arguments need;
 *  - embeddings rotate by k positions — a permutation, so intra-copy
 *    cosine structure is exactly preserved and cross-copy cosines decay;
 *  - region/nation (fixed dims) are written once, unscaled.
 *
 * `skewPct > 0` additionally rewrites that percentage of documents (every
 * copy) into ONE boilerplate cluster: a shared English template plus a few
 * doc-specific tokens — pairwise Jaccard ~0.9 within the cluster, the
 * degenerate-LSH-bucket shape (20% of a web crawl being boilerplate is
 * the realistic skew case the maxBucket guard + AQE exist for).
 */
object DataGen {

  private val stop: Seq[String] =
    graft.text.TextOps.defaultProfiles.values.flatten.toSeq.distinct

  /** Per-copy token bijection: suffix non-stopword tokens, keep stopwords
   * (language stats intact). k == 0 returns the text unchanged. */
  def perturbText(text: Column, k: Int): Column =
    if (k == 0) text
    else concat_ws(" ", transform(split(text, "\\s+"),
      t => when(lower(t).isin(stop: _*), t)
        .otherwise(concat(t, lit(s"x$k")))))

  /** ~0.9-Jaccard boilerplate: one shared template + 3 doc-keyed tokens. */
  def boilerplate(docId: Column): Column = {
    val template = (
      "the site uses cookies to improve your experience and by " +
        "continuing to browse you agree to our use of cookies please " +
        "read the privacy policy and the terms of service for more " +
        "information about how we handle your data on this site " +
        "all rights reserved contact us for questions about the policy"
      ).trim
    concat(lit(template), lit(" "),
      concat_ws(" ",
        substring(md5(docId.cast("string")), 1, 6),
        substring(md5(docId.cast("string")), 7, 6),
        substring(md5(docId.cast("string")), 13, 6)))
  }

  private def shifted(df: DataFrame, k: Int,
                      keys: Map[String, Long]): DataFrame =
    keys.foldLeft(df) { case (d, (c, span)) =>
      d.withColumn(c, col(c) + lit(k * span))
    }

  private def span(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val skewPct = if (args.length > 3) args(3).toInt else 0
    require(skewPct >= 0 && skewPct <= 100,
      s"skewPct must be 0..100, got $skewPct")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed dims: written once
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    def scaleTable(t: String, keyCols: Seq[String],
                   extra: (DataFrame, Int) => DataFrame =
                     (d, _) => d): Unit = {
      val base = rd(t)
      val spans = keyCols.map(c => c -> span(base, c)).toMap
      val copies = (0 until factor).map(k => extra(shifted(base, k, spans), k))
      wr(copies.reduce(_ unionAll _), t)
    }

    scaleTable("customer", Seq("c_custkey"))
    scaleTable("supplier", Seq("s_suppkey"))
    scaleTable("part", Seq("p_partkey"))
    scaleTable("orders", Seq("o_orderkey", "o_custkey"))
    scaleTable("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaleTable("events", Seq("event_id", "user_id"))

    scaleTable("documents", Seq("doc_id"), (d, k) => {
      val perturbed = d.withColumn("text", perturbText(col("text"), k))
      val skewed =
        if (skewPct <= 0) perturbed
        // pmod(id,100) < pct hits EXACTLY pct% for any pct (the old
        // 100/skewPct integer-division form silently over-skewed for
        // pct in 34..99 and was an ANSI div-by-zero above 100)
        else perturbed.withColumn("text",
          when(pmod(col("doc_id"), lit(100)) < skewPct,
            boilerplate(col("doc_id"))).otherwise(col("text")))
      skewed.withColumn("n_chars", length(col("text")).cast(
        d.schema("n_chars").dataType))
    })

    val emb = rd("embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val vspan = span(emb, "vec_id")
    wr((0 until factor).map { k =>
      // rotate modulo the dimension: factors above dim (100x mirrors of
      // a 16-dim table) would otherwise drive slice() lengths negative
      val r = k % dim
      val rot = if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r))
      emb.withColumn("vec_id", col("vec_id") + lit(k * vspan))
        .withColumn("embedding", rot)
    }.reduce(_ unionAll _), "embeddings")

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s""""$t":${spark.read.parquet(s"$out/$t.parquet").count()}""")
    println(s"""{"datagen":"$out","factor":$factor,"skew_pct":$skewPct,""" +
      counts.mkString("", ",", "}"))
    spark.stop()
  }
}
