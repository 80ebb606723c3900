package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextOps

/**
 * Near-duplicate detection for training-data pipelines: exact hashing,
 * MinHash + LSH, SimHash banding, and exact n-gram Jaccard verification.
 *
 * Reference anchor: pydantic's set semantics ("sets - unique lists",
 * `pydantic-core/src/validators/mod.rs:600-601`) generalized from
 * unique-within-a-collection to unique-within-a-100TB-corpus.
 *
 * Scale design:
 *  - Signatures are per-row map-only expressions (no shuffle, codegen'd).
 *  - Candidate generation is an equi-join on (band_id, band_hash) — a hash
 *    shuffle whose key cardinality is ~|docs|·bands / bucket-collision-rate,
 *    NEVER an O(n²) cross join.
 *  - Verification (exact Jaccard) runs only on candidate pairs.
 *  - All hashes derive from md5 (engine-portable) so a DuckDB oracle can
 *    replay every stage bit-for-bit; swap [[TextOps.hash60]] for xxhash64
 *    on a real cluster for ~3x cheaper hashing (same topology).
 */
object Dedup {

  // ------------------------------------------------------------- shingling

  /** Word n-gram shingles (distinct), joined by single spaces.
   * Documents shorter than n tokens yield their full token string. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /**
   * Shingle ROWS (id, sh) via posexplode + window lead — the fully
   * codegen'd form of [[shingles]] (whose array lambda is interpreted and
   * dominated the signature pipeline: measured ~2s of 3.3s at 5000 docs).
   * One shuffle (window by id), every expression codegen'd. May emit
   * duplicate shingles per doc — harmless for min-aggregates and for
   * set-operation consumers (array_intersect/union dedupe). Documents
   * shorter than n tokens contribute their full token string (the pos-0
   * partial window), matching [[shingles]]' fallback.
   */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("__p", "__t")))
    val w = Window.partitionBy("id").orderBy("__p")
    val tails = (1 until n).map(i => lead(col("__t"), i).over(w))
    toks.select(col("id"),
      concat_ws(" ", (col("__t") +: tails): _*).as("sh"),
      tails.last.isNotNull.as("__full"), col("__p"))
      .filter(col("__full") || col("__p") === 0)
      .select(col("id"), col("sh"))
  }

  // -------------------------------------------------------------- minhash

  /** k-permutation MinHash signature over a shingle array: element j is
   * min over shingles of md5(j || ':' || shingle) — string-min over hex
   * digests is a valid uniform permutation and is portable to the oracle.
   * One row-local expression; no shuffle. NOTE: array higher-order
   * functions are CodegenFallback (interpreted per element) — fine for a
   * handful of hashes, but the hot pipeline path is [[minhashSignatureDf]],
   * which keeps every md5 inside whole-stage codegen. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(sh, s => md5(concat(lit(s"$j:"), s))))
    }: _*)

  /** Carter-Wegman minhash prime (fits j·h2 sums in a long for j < 12). */
  val MinhashP = 1000000007L

  /** Codegen'd signature computation: explode shingles, hash each shingle
   * ONCE (md5 split into two 60-bit halves), then derive the k
   * permutations as (h1 + j·h2) mod p (Carter-Wegman universal hashing) —
   * k min-aggregates of pure integer arithmetic instead of k md5 calls
   * per shingle (4x less hashing at k=12). Map-side partial aggregation:
   * the shuffle carries k longs per doc, not shingles.
   * Engine-portable: DuckDB computes the identical values.
   * Returns (id, m0..m{k-1}) as longs. */
  def minhashSignatureDf(df: DataFrame, idCol: String, textCol: String,
                         k: Int, shingleN: Int): DataFrame = {
    require(k <= 12, s"k=$k would overflow j*h2 sums (p=$MinhashP)")
    val exploded = shingleRows(df, idCol, textCol, shingleN)
      .select(col("id"), md5(col("sh")).as("hx"))
      .select(col("id"),
        (conv(substring(col("hx"), 1, 15), 16, 10).cast(LongType) % MinhashP)
          .as("h1"),
        (conv(substring(col("hx"), 17, 15), 16, 10).cast(LongType) % MinhashP)
          .as("h2"))
    val aggs = (0 until k).map { j =>
      min((col("h1") + lit(j.toLong) * col("h2")) % MinhashP).as(s"m$j")
    }
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band hashes: signature split into `bands` bands of `rowsPerBand`,
   * each band hashed to one md5 string. k = bands * rowsPerBand. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Exact Jaccard similarity of two shingle arrays (verification step —
   * runs on candidate pairs only). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b))

  /**
   * EXACT n-gram Jaccard near-dup pairs via prefix filtering (the
   * All-Pairs / PPJoin family — Bayardo, Ma & Srikant, "Scaling Up All
   * Pairs Similarity Search", WWW 2007): returns every pair with
   * Jaccard(shingles(a), shingles(b)) >= thrNum/thrDen, no false
   * negatives — the exact counterpart to the probabilistic
   * [[minhashLshPairs]].
   *
   * Scale design (the naive shingle self-join is O(sum df^2) and dies on
   * stop-shingles):
   *  1. one global total order on shingles by (document frequency, value)
   *     ascending — rare shingles first;
   *  2. each doc only indexes its PREFIX of p = |d| - ceil(t*|d|) + 1
   *     rarest shingles. Theorem: if J(A,B) >= t, the smallest common
   *     shingle under the global order lies in both prefixes, so the
   *     prefix equi-join loses nothing (if it misses, overlap <
   *     ceil(t*|A|) <= required overlap — contradiction). Stop-shingles
   *     sort LAST, so they almost never enter a prefix: posting lists in
   *     the join are short by construction, no maxBucket heuristic needed;
   *  3. size filter t*|A| <= |B| <= |A|/t inside the join (integer
   *     arithmetic — no float boundary);
   *  4. exact overlap verify on the (few) candidates; the final
   *     threshold test is integer (thrDen*c >= thrNum*(|A|+|B|-c)).
   * Shuffles: shingle DF agg, per-doc rank window, prefix equi-join,
   * verify join — all keyed by shingle or doc id (high cardinality).
   */
  /** `maxDf`: opt-in stop-shingle cap for boilerplate-skewed corpora —
   * shingles appearing in more than `maxDf` documents are dropped from
   * the index BEFORE sizing (standard All-Pairs practice: a shingle
   * shared by 20% of a web crawl is template text, not near-dup signal,
   * and keeps candidate generation quadratic). Changes the similarity
   * universe to the filtered shingle sets, so it is None by default
   * (exact published semantics, what the oracle replays).
   *
   * `maxSetSize`: opt-in per-DOC cap, the row-width dual of `maxDf` — the
   * Stage-3 verify materializes each doc's full shingle set as ONE array
   * row, so a pathological 1-GB doc (the quality gate normally drops
   * these upstream) would make a ~100-MB shuffle row. Docs with more
   * than `maxSetSize` distinct shingles are excluded from the index
   * ENTIRELY (they pair with nothing — same exclusion semantics as
   * maxDf) and the drop is loud: a WARN with the exact doc count.
   * None by default; the oracle replays the default. */
  def jaccardNgramPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, thrNum: Long = 1L,
                        thrDen: Long = 2L,
                        persistIndex: Boolean = true,
                        stagingDir: Option[String] = None,
                        maxDf: Option[Long] = None,
                        maxSetSize: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 60-bit md5 shingle ids: every downstream sort/join/intersect runs on
    // longs instead of ~20-byte strings (measured ~2x on the verify stage).
    // The DuckDB oracle replays hash60 exactly, so engine and oracle stay
    // bit-identical INCLUDING any (astronomically unlikely) collision; the
    // prefix theorem only needs a consistent global shingle order, which
    // (df, hash) provides just as well as (df, string).
    val sh0 = shingleRows(df, idCol, textCol, shingleN).distinct()
      .select(col("id"), TextOps.hash60(col("sh")).as("sh"))
    val dfreq0 = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
    val (sh, dfreq) = maxDf match {
      case Some(cap) =>
        val kept = dfreq0.filter(col("df") <= cap)
        (sh0.join(kept.select("sh"), Seq("sh"), "left_semi"), kept)
      case None => (sh0, dfreq0)
    }
    // ONE window exchange serves both the per-doc rank and the doc size
    // (same partitionBy key), and the `ranked` index — (id, sh, sz, rk) —
    // is the only shingle materialization every later stage reads. It is
    // persisted (memory, spill to disk): without it Spark recomputes the
    // shingle explode + window FIVE times (sizes, rank, both self-join
    // sides, verify) — measured 8.3s -> ~2s at sf0.1. At cluster scale
    // this is the staged inverted index every All-Pairs implementation
    // writes anyway; swap persist for a parquet staging dir when the
    // shingle set exceeds aggregate executor storage.
    // persistIndex: the cache entry lives until the session clears it
    // (`spark.sharedState.cacheManager`/`catalog.clearCache`) — callers
    // embedding this in a long-lived service should clear after consuming
    // the result, or pass persistIndex=false and accept recomputation.
    val wId = Window.partitionBy("id")
    val ranked0 = sh.join(dfreq, "sh")
      .withColumn("rk", row_number().over(wId.orderBy(col("df"), col("sh"))))
      .withColumn("sz", count(lit(1)).over(wId))
      .select(col("id"), col("sh"), col("sz"), col("rk"))
    // stagingDir: the 100-TB form of the persist — the index is written to
    // parquet once and every later stage reads the files, so the plan does
    // not depend on aggregate executor storage (and a re-run's cost is
    // I/O-shaped, not shuffle-shaped). Values are identical either way.
    val rankedAll = stagingDir match {
      case Some(dir) =>
        ranked0.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
      case None if persistIndex =>
        ranked0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None => ranked0
    }
    // per-doc set-size guard (see scaladoc): counted AFTER staging/persist
    // so the count is one cheap scan of the materialized index, then the
    // oversized docs are filtered from every downstream stage
    val ranked = maxSetSize match {
      case Some(cap) =>
        val dropped = rankedAll.filter(col("sz") > cap)
          .agg(count_distinct(col("id"))).head().getLong(0)
        if (dropped > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"jaccardNgramPairs: dropping $dropped doc(s) with more than " +
              s"$cap distinct shingles from the All-Pairs index " +
              "(maxSetSize guard) — they will pair with nothing")
        rankedAll.filter(col("sz") <= cap)
      case None => rankedAll
    }
    // ceil(t*sz) with integer arithmetic: (thrNum*sz + thrDen - 1) div thrDen
    val ceilT = (lit(thrNum) * col("sz") + lit(thrDen - 1)) / lit(thrDen)
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceilT.cast(LongType) + 1)
      .select(col("id"), col("sh"), col("sz"), col("rk"))
    // POSITIONAL filter (PPJoin, Xiao/Wang/Lin/Yu WWW 2008 §3.2) on top
    // of the prefix filter: a match on a shingle at rank (i, j) bounds the
    // overlap by ub = 1 + min(|A|-i, |B|-j) (every other common shingle
    // ranks AFTER the smallest common one in BOTH docs, because per-doc
    // rank order IS the global (df, sh) order). Keeping only matches whose
    // ub clears the Jaccard threshold cuts candidates several-fold before
    // the distinct + verify stages — measured 310k -> ~90k candidate rows
    // at sf0.1 for the same 25 result pairs. EXACT: for a true pair the
    // smallest common shingle's own occurrence always passes the bound.
    val ub = lit(1L) +
      least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id") &&
        lit(thrNum) * col("x.sz") <= lit(thrDen) * col("y.sz") &&
        lit(thrNum) * col("y.sz") <= lit(thrDen) * col("x.sz") &&
        lit(thrDen) * ub >= lit(thrNum) * (col("x.sz") + col("y.sz") - ub))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // Verify (Vernica/Carey/Li, SIGMOD 2010, Stage 3): join each candidate
    // pair with BOTH docs' shingle-SET arrays and intersect per pair in
    // memory — ONE narrow row per candidate. The exploded alternative
    // (cand ⋈ ranked ⋈ ranked, grouped) shuffles |cand| × |shingles/doc|
    // rows — measured 211M intermediate rows at the 10x scale mirror,
    // minutes of sort spill; this form shuffles |cand| rows.
    val sets = ranked.groupBy("id")
      .agg(collect_set(col("sh")).as("shs"), first(col("sz")).as("sz"))
    val overlap = cand
      .join(sets.select(col("id").as("id_a"), col("shs").as("sha"),
        col("sz").as("sza")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shs").as("shb"),
        col("sz").as("szb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sza"), col("szb"),
        size(array_intersect(col("sha"), col("shb"))).cast(LongType).as("c"))
    overlap
      .filter(lit(thrDen) * col("c") >=
        lit(thrNum) * (col("sza") + col("szb") - col("c")))
      .select(col("id_a"), col("id_b"),
        (col("c").cast(DoubleType) /
          (col("sza") + col("szb") - col("c"))).as("jaccard"))
  }

  /**
   * Full MinHash-LSH near-dup pipeline:
   *   shingle -> sign -> band -> bucket-join -> verify Jaccard >= threshold.
   *
   * Returns distinct (id_a, id_b, jaccard) with id_a < id_b.
   *
   * The join is banded LSH: docs sharing any band bucket become candidates.
   * Probability a pair with Jaccard s collides: 1-(1-s^r)^b. The shuffle
   * key is (band, hash) — high cardinality, naturally well-distributed;
   * boilerplate-heavy corpora (one bucket holding millions of docs) are the
   * skew case, handled by AQE skew-join splitting plus the `maxBucket`
   * guard that drops degenerate buckets (standard practice: a bucket with
   * 10^6 docs is boilerplate, not near-dup signal — and would produce 10^12
   * pairs).
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 12, bands: Int = 4,
                      shingleN: Int = 3, threshold: Double = 0.5,
                      maxBucket: Long = 100000L): DataFrame = {
    val rowsPerBand = numHashes / bands
    // 1. signatures via codegen'd explode+agg (one shuffle keyed by id)
    val sig = minhashSignatureDf(df, idCol, textCol, numHashes, shingleN)
    // 2. band hashes over the materialized signature columns (cheap md5s
    //    over 32-char strings — no shingle recomputation anywhere above)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          col(s"m${b * rowsPerBand + r}").cast("string")): _*))
    }
    val buckets = sig.select(col("id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bhash")))
    val guarded = {
      import org.apache.spark.sql.expressions.Window
      // drop degenerate buckets before the self-join (count via window so
      // the bucket list never hits the driver)
      val w = Window.partitionBy("band", "bhash")
      buckets.withColumn("__bsz", count(lit(1)).over(w))
        .filter(col("__bsz") <= maxBucket).drop("__bsz")
    }
    // 3. candidate pairs: slim self-join on (band, bhash) — ids only
    val cand = guarded.select(col("band"), col("bhash"), col("id").as("id_a"))
      .join(guarded.select(col("band"), col("bhash"), col("id").as("id_b")),
        Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // 4. verify with exact Jaccard: candidates are few, so Spark broadcasts
    //    them and the shingle arrays never shuffle. Shingle sets come from
    //    the codegen'd row form + collect_set (order-irrelevant for the
    //    set ops in jaccard).
    val sh = shingleRows(df, idCol, textCol, shingleN)
      .groupBy("id").agg(collect_set(col("sh")).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --------------------------------------------------------------- simhash

  /**
   * 60-bit SimHash over whitespace tokens: bit i of the fingerprint is the
   * sign of Σ_tokens (±1 by bit i of hash60(token)). Computed as one
   * row-local aggregate expression over a 60-counter array — map-only,
   * no explode, no shuffle.
   */
  def simhash(text: Column, bits: Int = 60): Column = {
    // hash once per token, then fold 60 static bit-vote counters (bit
    // positions are compile-time constants, so every shift is a literal)
    val hashes = transform(TextOps.tokens(text), t => TextOps.hash60(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), bits),
      (acc, h) => array((0 until bits).map { i =>
        element_at(acc, i + 1) +
          when(shiftright(h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1)
      }: _*))
    (0 until bits).map { i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Codegen'd simhash: explode tokens, hash once, then ONE aggregation
   * with 60 conditional-sum bit votes — partial aggregation means the
   * shuffle carries 60 longs per doc regardless of document size. This is
   * the hot-path form of [[simhash]] (whose array-fold is interpreted).
   * Returns (id, sig). */
  def simhashDf(df: DataFrame, idCol: String, textCol: String,
                bits: Int = 60): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("id"), TextOps.hash60(col("tok")).as("h"))
    val votes = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"v$i")
    }
    val agg = toks.groupBy("id").agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map { i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("sig"))
  }

  /**
   * SimHash near-dup pairs with hamming distance <= maxHamming, found by
   * chunk banding: split the fingerprint into `chunks` equal bit ranges;
   * by pigeonhole, any pair within maxHamming <= chunks-1 shares at least
   * one identical chunk, so the banded equi-join is EXACT (no false
   * negatives) while avoiding the O(n²) cross join.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4,
                   bits: Int = 60): DataFrame = {
    require(chunks > maxHamming, "banding is exact only when chunks > maxHamming")
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1
    val withSig = simhashDf(df, idCol, textCol, bits)
    val chunked = withSig.select(col("id"), col("sig"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("sig"), c * chunkBits).bitwiseAND(mask)
      }: _*)).as(Seq("chunk", "cval")))
    val l = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "cval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  // ------------------------------------------------- connected components

  /** Per-round lineage truncation for iterative algorithms: the frame
   * feeds the next round 2+ times, so without truncation the LOGICAL
   * plan doubles every round (caching short-circuits execution but not
   * analysis). `checkpointDir = None` uses eager localCheckpoint
   * (executor block store — fine single-JVM); `Some(dir)` uses reliable
   * `checkpoint` (survives executor churn on a 1000-executor cluster,
   * where losing one round-k block would otherwise recompute from the
   * raw edges). */
  private def truncate(df: DataFrame, checkpointDir: Option[String],
                       eager: Boolean = true): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty || !sc.getCheckpointDir.contains(dir))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager) // reliable
      case None => df.localCheckpoint(eager)
    }

  /**
   * Connected components over near-dup pairs — the canonical-group step
   * a dedup pipeline runs after pair generation (pairs are only edges;
   * "keep one doc per GROUP" needs the transitive closure: a~b, b~c
   * puts a,c in one group even when the a~c edge was never emitted).
   *
   * Alternating large-star/small-star contraction (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC 2014): each
   * round rewires every node's strictly-larger neighbors to the local
   * minimum (large-star) then contracts the remaining downward edges
   * onto that minimum (small-star). Converges in O(log^2 n) rounds
   * REGARDLESS of component diameter — a 100M-node path graph finishes
   * in ~tens of rounds where label propagation needs 100M — so the
   * iteration cap is effectively unreachable; exceeding it throws
   * rather than silently returning partial labels. Each round is two
   * hash shuffles (groupBy node). Convergence is detected structurally:
   * the edge set is a disjoint union of min-rooted stars iff no node
   * appears as both a leaf and a center (one aggregation probe per
   * `probeEvery` rounds on the by-then-contracted edge set — safe to
   * batch because a star forest is a fixpoint of both star operations,
   * so a late probe still observes convergence).
   *
   * Returns (id, component) for every node appearing in `pairs`, where
   * component = the minimum node id of the group — identical output to
   * [[connectedComponentsMinLabel]]; a property test pins the two to
   * driver-side union-find.
   */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b",
                          maxIter: Int = 50,
                          probeEvery: Int = 2,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(probeEvery >= 1, s"probeEvery must be >= 1, got $probeEvery")
    // Slim the incoming pair table to its two id columns and truncate it
    // ONCE: `pairs` is consumed twice (the initial edge set here and the
    // singleton `nodes` pass at the end) and is typically an expensive
    // near-dup join — without this checkpoint the whole upstream pair
    // pipeline re-executed for the final singleton anti-join (measured a
    // full extra simhashPairs run inside d_components at sf0.1).
    val slim = truncate(
      pairs.select(col(idA).as("pa"), col(idB).as("pb")),
      checkpointDir, eager = false)
    // invariant maintained across rounds: edges are (u, v) with u > v,
    // no self-loops, distinct. Lazy initial checkpoint: round 1's probe
    // materializes it — no upfront job (and no upfront isEmpty job: an
    // empty edge set converges through round 1's probe naturally).
    var edges = truncate(
      slim.select(col("pa").as("u"), col("pb").as("v"))
        .union(slim.select(col("pb").as("u"), col("pa").as("v")))
        .filter(col("u") > col("v"))
        .distinct(), checkpointDir, eager = false)
    var iter = 0
    var converged = false
    // lsT frames persisted in probe-skipped rounds: they are only
    // consumed when the NEXT probe's job computes through the pending
    // lazy checkpoints, so unpersisting them per-round (as the
    // probe-every-round form did) would silently disable the cache and
    // double the small-star work of skipped rounds
    var pendingLs: List[DataFrame] = Nil
    while (!converged && iter < maxIter) {
      // large-star: center u over ALL neighbors; m = min(Γ(u) ∪ {u});
      // emit (v, m) for each strictly larger neighbor v — keeps v > m.
      // nbrs is hash-repartitioned by u ONCE so the groupBy AND the join
      // both reuse that single exchange (guide §2.4 shared-exchange
      // rule); without it Spark shuffles nbrs twice per round.
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val lsMin = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // no distinct here: duplicate (v, m) rows are harmless for the
      // min-aggregate and the join below, and ss's distinct restores the
      // set invariant before the next round — dropping the exchange
      // saves one full shuffle per round. |ls| stays <= |nbrs| = 2|E|.
      val ls = nbrs.join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // ls feeds the small-star TWICE (agg + join) but only within this
      // round — persist (lazy) avoids the double compute without paying
      // a dedicated materialization job; edges' checkpoint below bounds
      // the cross-round lineage. Repartitioned by u first so the cached
      // partitioning serves both consumers without further exchanges.
      val lsT = ls.repartition(col("u")).persist()
      // small-star: center u over its smaller neighbors (edges already
      // point downward); m = min; rewire every other small neighbor and
      // u itself onto m
      val ssMin = lsT.groupBy("u").agg(min(col("v")).as("m"))
      val ss = lsT.join(ssMin, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
      // LAZY checkpoint: the convergence probe below is the round's one
      // action and materializes the checkpoint as a side effect — one
      // Spark job per round instead of three (matters at sandbox scale,
      // where d_components is scheduler-bound)
      edges = truncate(ss, checkpointDir, eager = false)
      pendingLs ::= lsT
      // Deterministic fixpoint test — the edge set is a disjoint union
      // of min-rooted stars iff (a) every leaf u points at exactly ONE
      // center and (b) no node is both a leaf and a center. Leaf/center
      // disjointness ALONE is not enough: {(3,1),(3,2)} passes (b) but
      // still needs a merge round. One aggregation job over the
      // contracted edge set: rows (n, c) mark n as a leaf of c, rows
      // (n, null) mark n as a center; a group is bad if it has two
      // distinct centers (min(c) != max(c) — cheaper than countDistinct's
      // expand) or both roles (0 < count(c) < count(*)).
      //
      // Probed every `probeEvery` rounds, not every round: a min-rooted
      // star forest is a FIXPOINT of both star operations (large-star
      // re-emits each star, small-star re-contracts it), so a probe that
      // runs late still reports converged — the cost of batching is at
      // most probeEvery-1 idle (cheap, already-contracted) rounds, and
      // the saving is a third of the per-round Spark jobs on the
      // engine's heaviest query. The skipped rounds' lazy checkpoints
      // materialize through the next probe's job, so cross-round lineage
      // stays bounded at probeEvery rounds.
      if ((iter + 1) % probeEvery == 0 || iter + 1 == maxIter) {
        val roles = edges.select(col("u").as("n"), col("v").as("c"))
          .union(edges.select(col("v").as("n"),
            lit(null).cast(pairs.schema(idA).dataType).as("c")))
        converged = roles.groupBy("n")
          .agg(min(col("c")).as("c0"), max(col("c")).as("c1"),
            count(col("c")).as("nc"), count(lit(1)).as("tot"))
          .filter(col("c0") =!= col("c1") ||
            (col("nc") > 0 && col("tot") > col("nc")))
          .isEmpty
        pendingLs.foreach(_.unpersist(false))
        pendingLs = Nil
      }
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "partial labels would silently corrupt dedup groups; raise maxIter")
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v"), col("v")).distinct()
        .toDF("id", "component"))
    // nodes appearing only in self-pairs (id_a == id_b) have no edge
    // after the u > v filter but still owe a singleton label — derived
    // from the slim checkpointed pair table, not the raw upstream plan
    val nodes = slim.select(col("pa").as("id"))
      .union(slim.select(col("pb").as("id"))).distinct()
    labels.union(
      nodes.join(labels.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component")))
  }

  /**
   * Iterative min-label propagation — the simple exact form with output
   * identical to [[connectedComponents]]: every node's label becomes the
   * min of its own and its neighbors' labels; converges in O(component
   * diameter) rounds, ONE shuffle per round. Preferable when components
   * are known-shallow (dense near-dup clusters) and edges are few;
   * the star contraction above is the default and the big-graph path.
   * Non-convergence at `maxIter` THROWS — partial labels would silently
   * violate the transitive-closure contract callers assume.
   * `probeEvery` batches the convergence probe (one Spark job) across
   * rounds: labels monotonically decrease, so running up to probeEvery-1
   * extra cheap rounds after the true fixpoint is correct, just idle.
   */
  def connectedComponentsMinLabel(pairs: DataFrame, idA: String = "id_a",
                                  idB: String = "id_b",
                                  maxIter: Int = 25,
                                  probeEvery: Int = 2,
                                  checkpointDir: Option[String] = None)
  : DataFrame = {
    val edges = truncate(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))
        .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
        .distinct(), checkpointDir)
    var labels = truncate(
      edges.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")), checkpointDir)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nm = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")),
          Seq("dst"))
        .groupBy("src").agg(min("ncomp").as("nmin"))
        .select(col("src").as("id"), col("nmin"))
      // the update join already sees old and new labels side by side, so
      // the convergence flag rides along — no extra comparison join
      val next3 = truncate(labels.join(nm, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (coalesce(col("nmin"), col("comp")) < col("comp")).as("__ch")),
        checkpointDir)
      if ((iter + 1) % probeEvery == 0 || iter + 1 == maxIter)
        converged = next3.filter(col("__ch")).isEmpty
      labels = next3.select("id", "comp")
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsMinLabel did not converge in $maxIter rounds " +
        "(component diameter exceeds the cap) — partial labels would " +
        "silently corrupt dedup groups; use connectedComponents " +
        "(large-star/small-star) or raise maxIter")
    labels.select(col("id"), col("comp").as("component"))
  }

  // ----------------------------------------------------------- exact dedup

  /** Exact duplicate groups by full-content hash: one map-side-combined
   * groupBy on a 256-bit key. Returns (keep_id, copies) per group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
}
