package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.dedup.Dedup

/**
 * End-to-end corpus cleaning — the composition a training-data pipeline
 * actually runs over raw documents before tokenization:
 *
 *   1. EXACT dedup: keep the lowest-id copy of identical text
 *      (map-side-combined groupBy; one shuffle keyed by content);
 *   2. NEAR-DUP removal among survivors: exact n-gram Jaccard pairs
 *      ([[Dedup.jaccardNgramPairs]], prefix-filtered All-Pairs) and drop
 *      the higher id of every pair >= threshold (keep-first, same
 *      determinism rule as step 1);
 *   3. LANGUAGE filter: stopword-profile language ID
 *      ([[TextOps.langIdDf]]), keep `keepLangs`;
 *   4. QUALITY filter: token count and chars/token bounds (cheap,
 *      map-only; evaluated last so the expensive steps run on the
 *      already-deduped set — at 100 TB the dedup steps dominate and both
 *      are linear-ish by design, see the respective scaladocs).
 *
 * Returns (id, lang_pred, chars_per_token) of kept documents.
 */
object CorpusClean {

  def clean(df: DataFrame, idCol: String, textCol: String,
            profiles: Map[String, Seq[String]],
            keepLangs: Seq[String],
            minTokens: Int = 10,
            maxCharsPerToken: Double = 8.0,
            jaccardThrNum: Long = 1L,
            jaccardThrDen: Long = 2L,
            persistStages: Boolean = true,
            stagingDir: Option[String] = None,
            useComponents: Boolean = false): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // stagingDir: stage the reused intermediates (dedup survivors, the
    // jaccard shingle index, the near-dup survivors) to parquet instead of
    // executor-storage persists — the 100-TB form, where the survivor set
    // exceeds aggregate cluster memory. Same values either way.
    def staged(d: DataFrame, name: String, wanted: Boolean): DataFrame =
      stagingDir match {
        case Some(dir) =>
          d.write.mode("overwrite").parquet(s"$dir/$name")
          d.sparkSession.read.parquet(s"$dir/$name")
        case None if wanted => d.persist(StorageLevel.MEMORY_AND_DISK)
        case None => d
      }
    // 1. exact dedup, keep-first. The survivor set feeds the near-dup
    // pair join AND every later stage — persisted (memory, spill to disk)
    // so the content-keyed dedup shuffle runs ONCE, not once per
    // downstream reference (measured 18s -> ~6s at sf0.1). Same rationale
    // as the persisted shingle index inside jaccardNgramPairs.
    val kept1 = staged(df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("id"))
      .select(col("id"), col(textCol).as("__text")), "kept1", persistStages)
    // 2. near-dup removal among survivors (drop the higher id per pair)
    val pairs = Dedup.jaccardNgramPairs(kept1, "id", "__text",
      shingleN = 3, thrNum = jaccardThrNum, thrDen = jaccardThrDen,
      persistIndex = persistStages,
      stagingDir = stagingDir.map(d => s"$d/jacc_index"))
    // Near-dup drop policy: the default drops every pair's higher id —
    // a valid maximal-independent-ish keep-first rule (no two kept docs
    // form a PAIR), but transitively conservative: a~b, b~c with no a~c
    // edge drops both b and c. useComponents=true runs the exact
    // transitive grouping ([[Dedup.connectedComponents]]) and keeps ONE
    // doc (the min id) per component — the canonical corpus-dedup rule.
    val drops =
      if (useComponents)
        Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("component")).select("id")
      else pairs.select(col("id_b").as("id")).distinct()
    // read twice below (language scoring input + final join); staged so
    // the near-dup pair joins upstream of `drops` run ONCE (an unstaged
    // variant re-executed them per consumer — measured a wash at sf0.1
    // where overhead dominates, and strictly worse at scale)
    val kept2 = staged(kept1.join(drops, Seq("id"), "left_anti"),
      "kept2", persistStages)
    // 3. language ID (inner join: token-less docs cannot be language-rated)
    val lang = TextOps.langIdDf(kept2, "id", "__text", profiles)
    // 4. quality (single-space tokenization, matching the quality oracle)
    val toks = split(col("__text"), " ")
    kept2.join(lang, "id")
      .withColumn("chars_per_token",
        round(length(col("__text")).cast(DoubleType) / size(toks), 3))
      .filter(col("lang_pred").isin(keepLangs: _*) &&
        size(toks) >= minTokens &&
        col("chars_per_token") <= maxCharsPerToken)
      .select(col("id"), col("lang_pred"), col("chars_per_token"))
  }
}
