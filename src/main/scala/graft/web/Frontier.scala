package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Politeness-aware crawl-frontier scheduling — the step between the
 * governance verdicts ([[graft.text.Robots]]: is this URL allowed, and
 * at what Crawl-delay?) and the fetch fleet: turn an unbounded
 * candidate set into per-host fetch queues with exact politeness
 * offsets and a deterministic shard assignment that keeps each host's
 * queue on ONE worker (per-host serialization is what politeness
 * means operationally — two workers fetching the same host defeat any
 * delay arithmetic).
 *
 * Scale shape, in order:
 *
 *  1. Per-host budget cap via the bounded-heap [[graft.functions.TopK]]
 *     Aggregator: map-side combine reduces every partition to at most
 *     `maxPerHost` candidates per host BEFORE the exchange. This is the
 *     load-bound the frontier NEEDS anyway (no crawl fetches a
 *     mega-host exhaustively per cycle) doubling as the skew valve: a
 *     host with 10^9 candidate pages shuffles O(partitions × k) rows,
 *     not 10^9 — the window row_number() idiom would sort and shuffle
 *     every row of every host.
 *  2. Queue ordinals FREE from the aggregator: the top-k state is kept
 *     sorted (weight DESC, id ASC — total order, deterministic), so
 *     `posexplode` yields each page's queue slot with no window, no
 *     second sort, no extra exchange.
 *  3. Politeness arithmetic EXACT: Crawl-delay parses as DECIMAL
 *     seconds → integer milliseconds (`1.5` → 1500; fractional
 *     milliseconds rejected like any malformed directive → default),
 *     `fetch_offset_ms = slot × delay_ms` in BIGINT — bit-identical at
 *     any parallelism and replayable by an independent SQL window (the
 *     LinkGraph scaled-integer discipline).
 *  4. Shard assignment is a pure column — `pmod(hash60(host), nShards)`
 *     — computed map-side with zero additional shuffle; hash60 is the
 *     repo-wide md5-60-bit portable hash, so the oracle replays the
 *     placement bit-for-bit.
 *
 * The delay dimension (one row per host) is broadcast; the candidate
 * table is touched by exactly ONE exchange (the capped groupBy).
 * Total plan: one shuffle regardless of input size.
 *
 * Reference anchor: pydantic treats every wire value as
 * parse-or-violation (`networks.py` Url types); the frontier applies
 * the same discipline to Crawl-delay directives — a malformed or
 * absent delay never throws, it degrades to `defaultDelayMs`.
 */
object Frontier {

  /** `"1.5"` → 1500ms as an exact DECIMAL(9,3)×1000 integer; null /
   * malformed / negative / fractional-ms → null (caller coalesces the
   * default). DECIMAL arithmetic so `0.1`-style values never round
   * through a double. */
  def delayMs(delaySeconds: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val d = delaySeconds
      .try_cast(org.apache.spark.sql.types.DecimalType(9, 3))
    when(d.isNotNull && d >= 0, (d * 1000).cast("long")).otherwise(lit(null))
  }

  /**
   * Build the fetch schedule.
   *
   * @param candidates   (host: string, page_id: long, weight: long) —
   *                     the allowed URL set, already robots-filtered;
   *                     weight is the crawl priority (e.g. scaled
   *                     PageRank from [[LinkGraph]], or sitemap
   *                     priority milli-units from [[Sitemap]])
   * @param delays       (host: string, delay_ms: long) — one row per
   *                     host that declared a Crawl-delay; hosts absent
   *                     here get `defaultDelayMs`. Dimension-sized →
   *                     broadcast.
   * @param maxPerHost   per-cycle fetch budget per host (the TopK k)
   * @param nShards      fetch-fleet width; every host maps to exactly
   *                     one shard
   * @param defaultDelayMs politeness floor for hosts without a
   *                     declared delay
   * @return (host, shard, slot, page_id, weight, delay_ms,
   *         fetch_offset_ms) — slot 0-based in queue order
   */
  def schedule(candidates: DataFrame, delays: DataFrame,
      maxPerHost: Int, nShards: Int,
      defaultDelayMs: Long = 1000L): DataFrame = {
    require(maxPerHost > 0 && nShards > 0)
    import graft.functions.TopK
    val topk = udaf(new TopK.TopKAgg(maxPerHost))
    val queued = candidates
      .groupBy(col("host"))
      .agg(topk(col("weight"), col("page_id")).as("__q"))
      .select(col("host"), posexplode(col("__q").getField("items")))
      .select(col("host"), col("pos").as("slot"),
        col("col").getField("id").as("page_id"),
        col("col").getField("v").as("weight"))
    val hash60 = conv(substring(md5(col("host")), 1, 15), 16, 10)
      .cast("long")
    queued
      .join(broadcast(delays.select(col("host"), col("delay_ms"))),
        Seq("host"), "left")
      .select(col("host"),
        pmod(hash60, lit(nShards.toLong)).as("shard"),
        col("slot"), col("page_id"), col("weight"),
        coalesce(col("delay_ms"), lit(defaultDelayMs)).as("delay_ms"),
        (col("slot").cast("long") *
          coalesce(col("delay_ms"), lit(defaultDelayMs)))
          .as("fetch_offset_ms"))
  }
}
