package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * End-to-end code-corpus cleaning — the Stack-style preprocessing
 * pipeline (Kocetkov et al. 2022 §2.2; BigCode preprocessing) composed
 * from the individually-oracled operators, in the published order:
 *
 *   1. quality gate   (`CodeOps.codeQuality` -> `codeFilter`: autogen,
 *                      line-length, alnum-fraction drops)
 *   2. license policy (`CodeOps.licenseScan`: drop files with a DETECTED
 *                      non-permissive license; undetected files stay —
 *                      the repo-level license call happens upstream)
 *   3. secret redaction (`CodeOps.redactSecrets`, content rewrite)
 *   4. boilerplate-line strip (`CodeOps.stripBoilerplate`, document
 *                      frequency computed over the gated+redacted corpus)
 *   5. near-dup drop  (`Dedup.jaccardNgramPairs` on comment-stripped
 *                      normalized content, J >= 1/2; the greater id of
 *                      each pair drops — same pair policy as
 *                      `CorpusClean`)
 *
 * Output: one row per surviving file — `id, lang, n_chars, sha`
 * (sha256 of the final rewritten content), so an independent SQL replay
 * proves the ENTIRE pipeline bit-exact, not just row membership.
 *
 * Scale shape: every stage is one of the already-audited shapes (map-only
 * gates and rewrites, explode + partial-agg line df, the prefix-filtered
 * All-Pairs join with its parquet staging); stages communicate by id
 * sets orders smaller than the corpus. Nothing here adds a new shuffle
 * pattern — the pipeline is the composition, which is the point.
 */
object CodeClean {

  def run(df: DataFrame, stagingDir: Option[String] = None,
          boilerMinDf: Long = 20L,
          shingleN: Int = 3, thrNum: Long = 1L, thrDen: Long = 2L)
  : DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Reused intermediates MUST be materialized: `red`'s content is a
    // triple regexp_replace tree that the strip stage references once
    // per line-explode branch and the final projection twice more
    // (length + sha) — unstaged, Catalyst re-evaluates the regex chain
    // at every reference (the round-3 inlining trap; measured 51s -> 9s
    // at the 2000-file input). Parquet staging is the 100-TB form;
    // MEMORY_AND_DISK persist is the fallback.
    // unique subdir per invocation: overwriting a previous run's staging
    // path can serve that run's (now deleted) file listing from Spark's
    // shared FileStatusCache — FAILED_READ_FILE on the re-run
    val runTag = java.lang.Long.toHexString(System.nanoTime())
    def staged(d: DataFrame, name: String): DataFrame = stagingDir match {
      case Some(dir) =>
        d.write.mode("overwrite").parquet(s"$dir/$runTag/$name")
        d.sparkSession.read.parquet(s"$dir/$runTag/$name")
      case None => d.persist(StorageLevel.MEMORY_AND_DISK)
    }
    // 1. quality gate
    val keep = CodeOps.codeFilter(
        CodeOps.codeQuality(df, "id", "lang", "content"))
      .filter(col("keep")).select("id")
    // 2. license policy: drop DETECTED non-permissive
    val nonPerm = CodeOps.licenseScan(df, "id", "content")
      .where(col("license").isNotNull && !col("permissive"))
      .select("id")
    val gated = staged(
      df.join(keep, "id").join(nonPerm, Seq("id"), "left_anti"), "gated")
    // 3. secret redaction (materialized once — see staged() note)
    val red = staged(gated.select(col("id"), col("lang"),
      CodeOps.redactSecrets(col("content")).as("content")), "red")
    // 4. boilerplate strip (df over the gated+redacted corpus)
    val stripped = CodeOps.stripBoilerplate(red, "id", "content",
      boilerMinDf)
    // 5. near-dup drop on the gated set — the SHARED recipe
    //    (CodeOps.nearDupNorm) and threshold of the standalone operator
    val norm = CodeOps.nearDupNorm(gated)
    val dupIds = Dedup.jaccardNgramPairs(norm, "id", "norm",
        shingleN = shingleN, thrNum = thrNum, thrDen = thrDen,
        // namespaced: the index write is mode=overwrite and must never
        // share a directory with the staged pipeline frames
        stagingDir = stagingDir.map(d => s"$d/$runTag/jacc_index"))
      .select(col("id_b").as("id")).distinct()
    val out = red.select("id", "lang")
      .join(dupIds, Seq("id"), "left_anti")
      .join(stripped, "id")
      .select(col("id"), col("lang"),
        length(col("content")).as("n_chars"),
        sha2(col("content"), 256).as("sha"))
    stagingDir match {
      case Some(dir) =>
        // stage the (orders-smaller) survivor projection, then eagerly
        // delete the heavyweight intermediates — a long-lived service
        // otherwise accumulates one gated+red corpus copy per invocation.
        // The runTag path is never reused, so the FileStatusCache cannot
        // serve a stale listing for it.
        out.write.mode("overwrite").parquet(s"$dir/$runTag/out")
        val spark = df.sparkSession
        val hconf = spark.sessionState.newHadoopConf()
        Seq("gated", "red", "jacc_index").foreach { n =>
          val p = new org.apache.hadoop.fs.Path(s"$dir/$runTag/$n")
          p.getFileSystem(hconf).delete(p, true)
        }
        spark.read.parquet(s"$dir/$runTag/out")
      case None => out
    }
  }
}
