package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.data.Warc
import graft.functions.UrlOps

/**
 * End-to-end web-corpus cleaning — the Common Crawl preprocessing shape
 * (CCNet, Wenzek et al. 2020 §3; RefinedWeb, Penedo et al. 2023 §3)
 * composed from the individually-oracled operators:
 *
 *   1. WARC shard -> response pages ([[Warc.pages]], mapPartitions,
 *      zero shuffle)
 *   2. envelope filter: HTTP 200 + `text/html` Content-Type (map)
 *   3. URL canonicalization ([[UrlOps]]) — non-hierarchical URLs drop
 *      to the violation path (map)
 *   4. HTML main-text extraction ([[HtmlOps]]) BEFORE any exchange —
 *      extraction is map-only and shrinks each row from raw HTML to
 *      visible text, so the wide body column dies before shuffle 1;
 *      extracting pages a later dedup discards costs O(bytes) map work
 *      and saves shuffling raw HTML, the right 100-TB trade
 *   5. URL-level dedup (shuffle 1): keep the earliest crawl — min
 *      (shard_id, rec_idx) — per canonical URL, map-side-combined
 *      min(struct) so each partition sends one candidate per URL
 *   6. quality gate: whitespace token count >= `minTokens` (map; the
 *      CCNet order — dedup by URL first, THEN quality, preserving
 *      "earliest crawl of each page" semantics)
 *   7. content-level exact dedup (shuffle 2): one survivor per
 *      sha256(text); only the hash and the survivor's scalar fields
 *      shuffle, never the text itself
 *
 * Output: one row per surviving page — `shard_id, rec_idx, url, title,
 * n_tokens, text_sha256` — so an independent SQL replay proves the
 * whole chain (record walk, envelope parse, canonicalization, markup
 * strip, both dedup tiers, the gate) bit-exact.
 *
 * Scale shape: two shuffles total, both map-side combined, both keyed
 * on high-cardinality hashes (no skew valve needed: a canonical URL or
 * content hash with pathological fan-in still reduces to one row per
 * map partition before the exchange). The min(struct) aggregates run
 * as SortAggregate (struct-valued buffers are not hash-aggregable) —
 * a deliberate trade: the sort is by the dedup KEY only, i.e. the same
 * sort a pick-winners-then-join-back SortMergeJoin would pay, but with
 * one pass over the corpus and strictly less network (duplicates
 * collapse map-side instead of shuffling to the join).
 */
object WebClean {

  def run(shards: Dataset[(Long, Array[Byte])], minTokens: Int = 5)
  : DataFrame = {
    val pages = Warc.pages(shards).toDF()
      .where(col("http_status") === 200 &&
        col("content_type").startsWith("text/html"))
      .select(col("shard_id"), col("rec_idx"),
        UrlOps.urlCanonCol(col("target_uri")).as("url"), col("body"))
      .where(col("url").isNotNull)
    // stage the extract struct in its own projection (CollapseProject
    // non-cheap discipline: the walk runs once across the field reads)
    val extracted = pages
      .select(col("shard_id"), col("rec_idx"), col("url"),
        HtmlOps.htmlExtractCol(col("body")).as("h"))
      .select(col("shard_id"), col("rec_idx"), col("url"),
        col("h.title").as("title"), col("h.text").as("text"))
    // URL dedup: earliest crawl per canonical URL
    val urlDedup = extracted
      .groupBy(col("url"))
      .agg(min(struct(col("shard_id"), col("rec_idx"), col("title"),
        col("text"))).as("r"))
      .select(col("r.shard_id").as("shard_id"), col("r.rec_idx").as("rec_idx"),
        col("url"), col("r.title").as("title"), col("r.text").as("text"))
    // quality gate on the extracted (single-space-collapsed) text
    val gated = urlDedup
      .withColumn("n_tokens",
        when(length(col("text")) === 0, lit(0))
          .otherwise(size(split(col("text"), " "))))
      .where(col("n_tokens") >= minTokens)
    // content dedup: one survivor per text hash; text never shuffles
    gated
      .groupBy(sha2(col("text"), 256).as("text_sha256"))
      .agg(min(struct(col("shard_id"), col("rec_idx"), col("url"),
        col("title"), col("n_tokens"))).as("r"))
      .select(col("r.shard_id").as("shard_id"),
        col("r.rec_idx").as("rec_idx"), col("r.url").as("url"),
        col("r.title").as("title"), col("r.n_tokens").as("n_tokens"),
        col("text_sha256"))
  }
}
