package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/**
 * Streaming deduplication — the streaming tier of `graft.dedup`.
 *
 * A training-data ingest pipeline dedupes at two points: a cheap exact /
 * fingerprint pass AT INGEST (this module — Structured Streaming, state
 * bounded by watermark) and the full near-dup batch passes
 * (`Dedup.minhashLshPairs` / `jaccardNgramPairs` / `simhashPairs`) over
 * the accumulated corpus. Streaming near-dup beyond fingerprint equality
 * is intentionally NOT offered: hamming-ball / Jaccard-threshold matching
 * needs a candidate self-join, which is unbounded state on an infinite
 * stream — the honest design is fingerprint-tier streaming + periodic
 * batch sweep (lambda-style), not a leaky streaming approximation.
 *
 * State bound: `dropDuplicatesWithinWatermark` keeps one state row per
 * distinct key seen within the watermark horizon and evicts on watermark
 * advance — at 100 TB/day the state is (distinct keys per horizon) × 32
 * bytes, independent of total stream length. Keys are 256-bit content
 * hashes (exact) or 60-bit simhashes (fingerprint), so state rows are
 * tiny and the dedup guarantee is scoped to the horizon, exactly the
 * contract the batch sweep closes.
 */
object StreamDedup {

  /** Content identity key: sha256 of the normalized text. */
  def contentKey(text: Column): Column = sha2(text, 256)

  /**
   * Exact streaming dedup: keep the FIRST arrival of each distinct
   * content hash within the watermark horizon, drop later copies.
   * Map-only plus one stateful operator; no shuffle beyond the state-store
   * hash partitioning on the key.
   */
  def exactDedupStream(stream: DataFrame, textCol: String, tsCol: String,
                       lateness: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__key", contentKey(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")

  /**
   * Fingerprint-tier streaming near-dup: dedupe on simhash EQUALITY
   * (hamming distance 0 — token-order-insensitive boilerplate variants
   * collide; hamming <= k matching is deferred to the batch sweep, see
   * the module doc). Same state bound as [[exactDedupStream]].
   */
  def simhashDedupStream(stream: DataFrame, textCol: String, tsCol: String,
                         lateness: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__key", Dedup.simhash(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")
}
