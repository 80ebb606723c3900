package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over a crawled corpus — PageRank in EXACT
 * fixed-point integer arithmetic, the iterative companion to the
 * connected-components step of the dedup family
 * (`graft.dedup.Dedup`): where components tell you which pages are the
 * same, PageRank tells you which pages matter (the classic quality
 * prior for web-scale training-data selection — rank-weighted sampling
 * needs it over the full crawl graph).
 *
 * Design decisions for 10^11-edge graphs:
 *
 *  - SCALED-INTEGER ranks. `rank` is a BIGINT in units of `1/scale`
 *    (default 1e-10): floating-point PageRank is not reproducible
 *    across engines, partitionings, or resumes — double addition is
 *    non-associative, so a shuffle reorder changes low bits, and a
 *    hash-compared oracle would flap. With BIGINT units every sum is
 *    exact and associative: the result is bit-identical at any
 *    parallelism AND independently replayable by the DuckDB oracle's
 *    unrolled SQL (same arithmetic, different engine) — the same
 *    discipline as the repo's DECIMAL event-time money and the IMA
 *    ADPCM re-decode oracle. Per iteration each edge carries
 *    `rank div outdeg` (floor), and the damped update is
 *    `(100-d)%·scale div 100 + d%·received div 100` — all exact.
 *    Flooring leaks ≤1 unit per edge per round (≤1e-10 of mass): the
 *    rank VALUES are exactly defined, only their sum is not exactly
 *    `n·scale`, which no consumer needs.
 *  - Per-iteration plan: ranks ⋈ edges on src (co-hash-partitioned
 *    equi-join), map-side floor-div, then `sum` by dst with partial
 *    aggregation — in-degree skew (mega-hubs: every page links to the
 *    front page) collapses in the map-side combiner, never on one
 *    reducer. Out-degree is joined ONCE onto the edge table before the
 *    loop, so the loop body touches exactly two shuffles per round.
 *  - Lineage: `localCheckpoint` per round truncates the plan tree (the
 *    d_components precedent — an iterative DataFrame loop otherwise
 *    doubles its tree every round until analysis dominates); pass
 *    `checkpointDir` for reliable cluster checkpoints on long chains.
 *  - Dangling nodes (no out-edges) lose their mass (it shrinks the
 *    total by their share each round, it never biases survivors);
 *    redistributing it costs one 1-row aggregate per round and is not
 *    worth the extra oracle surface here. Documented bound.
 *
 * Overflow bound: received mass per node ≤ total mass = n·scale, so
 * `damping · received` needs n·scale·100 < 2^63 — at scale=1e10 that
 * is n < 9.2e6 per default; lower `scale` for bigger graphs (1e6 is
 * plenty of resolution at 1e11 nodes).
 */
object LinkGraph {

  /**
   * @param edges   (src: long, dst: long) — deduplicated internally;
   *                self-loops dropped
   * @param nodes   (node: long) — the full vertex set (isolated nodes
   *                keep the teleport mass)
   * @param iterations fixed round count (bit-reproducible by design —
   *                no convergence test, which would itself be
   *                float-threshold-dependent)
   * @return (node: long, rank: long) — rank in units of 1/scale
   */
  def pageRank(edges: DataFrame, nodes: DataFrame, iterations: Int,
      scale: Long = 10000000000L, dampingPct: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val teleportFp = (100L - dampingPct) * scale / 100L

    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // outdeg rides on the edge rows so the loop never re-joins it
    val ed = e.join(out, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nd = nodes.select(col("node").cast("long").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var ranks = nd.withColumn("rank", lit(scale))
    var i = 0
    while (i < iterations) {
      val recv = ranks.join(ed, ranks("node") === ed("src"))
        .select(ed("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      val next = nd.join(recv, Seq("node"), "left")
        .select(col("node"),
          (lit(teleportFp) +
            expr(s"($dampingPct * coalesce(m, 0L)) div 100")).as("rank"))
      ranks =
        if (checkpointDir.isDefined) next.checkpoint()
        else next.localCheckpoint()
      i += 1
    }
    ed.unpersist(); nd.unpersist()
    ranks
  }

  /**
   * Host-level link graph — the Common-Crawl "host graph" artifact:
   * collapse page→page links to weighted host→host edges. One
   * groupBy over the exploded link rows (map-side combined counts);
   * intra-host self-edges kept (they carry the site's internal-link
   * density) under `keepSelf`.
   *
   * @param links (src_host: string, dst_host: string) one row per link
   * @return (src_host, dst_host, n_links) sorted nowhere — callers order
   */
  def hostGraph(links: DataFrame, keepSelf: Boolean = true): DataFrame = {
    val base = if (keepSelf) links
      else links.filter(col("src_host") =!= col("dst_host"))
    base.groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }

  /**
   * HITS (Kleinberg 1999, "Authoritative sources in a hyperlinked
   * environment") — the hubs-and-authorities companion of [[pageRank]]:
   * authority(p) = Σ hub(q) over in-links q→p, hub(p) = Σ authority(q)
   * over out-links p→q, renormalized each round. The classic
   * topic-distillation quality signal: authorities are the pages worth
   * keeping, hubs are the link-lists that found them.
   *
   * Same exactness discipline as [[pageRank]], one deliberate swap:
   * Kleinberg's L2 normalization is replaced by L∞ (divide by the
   * round's max, the standard power-iteration alternative) because a
   * square root has no exact fixed-point form — with MAX the whole
   * round is BIGINT compare + floor-div, so scores are bit-identical
   * at any parallelism and the DuckDB oracle replays the same
   * iterations as unrolled SQL. Scores land in [0, scale] with the
   * round's argmax pinned at exactly `scale`.
   *
   * Plan per round (the pageRank loop body twice, transposed):
   * scores ⋈ edges (co-hash-partitioned equi-join) → map-side-combined
   * SUM by the other endpoint — in-degree skew dies in the combiner —
   * then a 1-row MAX broadcast for the renormalize (the repo's
   * 1-row-aggregate crossJoin shape, never a wide shuffle). Authorities
   * update from the PREVIOUS hubs and hubs from the NEW authorities
   * (Kleinberg's I-then-O operation order). `localCheckpoint` truncates
   * lineage per round; pass `checkpointDir` for reliable checkpoints.
   *
   * Overflow bound: raw sums ≤ maxDeg·scale and the renormalize
   * multiplies by scale again, so maxDeg·scale² must stay below 2^63
   * — the BIGINT-units headroom trade of [[pageRank]] shifted toward
   * degree instead of node count. Default scale=1e6 allows in/out
   * degrees to 9.2e6; drop scale for denser hubs.
   *
   * @param edges (src: long, dst: long) — deduplicated internally,
   *              self-loops dropped (a self-link endorsing itself is
   *              the textbook HITS degenerate case)
   * @param nodes (node: long) full vertex set; isolated nodes score 0
   * @return (node: long, auth: long, hub: long) in units of 1/scale
   */
  def hits(edges: DataFrame, nodes: DataFrame, iterations: Int,
      scale: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && scale >= 1L)
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two aliased views of the SAME persisted edge table (fresh
    // attribute ids per direction): within one round `auth` — itself
    // derived from the edges — joins the edges again, which Spark's
    // ambiguous-self-join detection rejects on shared attributes
    val eA = e.select(col("src").as("a_src"), col("dst").as("a_dst"))
    val eH = e.select(col("src").as("h_src"), col("dst").as("h_dst"))
    val nd = nodes.select(col("node").cast("long").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // raw Σ → L∞ renormalize against the 1-row broadcast max, kept
    // SPARSE: only nodes that actually received mass get a row. Nodes
    // absent from `raw` score exactly 0 in the dense form and contribute
    // exactly 0 to every downstream sum, so carrying them through the
    // loop is pure cost — the dense expansion happens ONCE after the
    // last round instead of twice per round (one full-node-table join
    // per round saved, and the loop joins run on the smaller frames).
    def renormSparse(raw: DataFrame, outName: String): DataFrame = {
      val mx = raw.agg(max(col("m")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"(CAST(m AS DECIMAL(38,0)) * $scale) div nullif(mx, 0)")
            .as(outName))
    }

    var scores = nd.select(col("node"), lit(scale).as("hub"))
      .withColumn("auth", lit(0L))
    var i = 0
    while (i < iterations) {
      val aRaw = scores.join(eA, scores("node") === col("a_src"))
        .groupBy(col("a_dst").as("node")).agg(sum("hub").as("m"))
      val auth = renormSparse(aRaw, "auth")
      val hRaw = auth.join(eH, auth("node") === col("h_dst"))
        .groupBy(col("h_src").as("node")).agg(sum("auth").as("m"))
      // ONE dense join per round re-attaches the full vertex set (zero
      // in-/out-degree nodes score 0, not null — same as the dense form)
      val next = nd
        .join(auth, Seq("node"), "left")
        .join(renormSparse(hRaw, "hub"), Seq("node"), "left")
        .select(col("node"), coalesce(col("auth"), lit(0L)).as("auth"),
          coalesce(col("hub"), lit(0L)).as("hub"))
      scores =
        if (checkpointDir.isDefined) next.checkpoint()
        else next.localCheckpoint()
      i += 1
    }
    e.unpersist(); nd.unpersist()
    scores.select(col("node"), col("auth"), col("hub"))
  }

  /**
   * TrustRank (Gyöngyi, Garcia-Molina, Pedersen, "Combating web spam
   * with TrustRank", VLDB 2004) — biased PageRank whose teleport
   * vector is restricted to a hand-vetted TRUSTED SEED set, so trust
   * flows out along links and spam farms (which good pages rarely
   * link to) starve. The standard anti-spam prior a crawl-scale
   * corpus applies before rank-weighted sampling; `pagerank - trust`
   * gaps flag spam mass.
   *
   * Identical loop body, partitioning, skew story, and lineage
   * handling as [[pageRank]] — the ONLY differences are the teleport
   * term (seeds get `(100-d)%·scale`, everyone else 0) and the
   * initial vector (seeds at `scale`, everyone else 0, the paper's
   * normalized seed distribution in per-node units). Scores stay
   * BIGINT units of 1/scale: exact, associative, bit-identical at any
   * parallelism, replayable by the oracle's unrolled SQL. The seed
   * flag is joined ONCE onto the node table before the loop (a
   * broadcast-sized dimension in practice — seed lists are curated by
   * humans and small by definition).
   *
   * Same overflow bound as [[pageRank]] (n·scale·100 < 2^63); in
   * practice tighter because total trust mass ≤ |seeds|·scale.
   *
   * @param edges (src: long, dst: long) — deduplicated, self-loops
   *              dropped (a spam page voting for itself)
   * @param nodes (node: long) full vertex set
   * @param seeds (node: long) the trusted subset; rows not in `nodes`
   *              are ignored by construction of the left join
   * @return (node: long, trust: long) in units of 1/scale; pages
   *         unreachable from the seed set score exactly 0
   */
  def trustRank(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iterations: Int, scale: Long = 10000000000L, dampingPct: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val teleportFp = (100L - dampingPct) * scale / 100L

    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(out, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node table carries its seed teleport so the loop never re-joins
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
      .withColumn("tele", lit(teleportFp))
    val nd = nodes.select(col("node").cast("long").as("node"))
      .join(sd, Seq("node"), "left")
      .select(col("node"), coalesce(col("tele"), lit(0L)).as("tele"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var ranks = nd.select(col("node"),
      when(col("tele") > 0L, lit(scale)).otherwise(lit(0L)).as("trust"))
    var i = 0
    while (i < iterations) {
      val recv = ranks.join(ed, ranks("node") === ed("src"))
        .select(ed("dst").as("node"),
          expr("trust div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      val next = nd.join(recv, Seq("node"), "left")
        .select(col("node"),
          (col("tele") +
            expr(s"($dampingPct * coalesce(m, 0L)) div 100")).as("trust"))
      ranks =
        if (checkpointDir.isDefined) next.checkpoint()
        else next.localCheckpoint()
      i += 1
    }
    ed.unpersist(); nd.unpersist()
    ranks
  }

  /**
   * Label-propagation community detection (Raghavan/Albert/Kumara
   * 2007, "Near linear time algorithm to detect community structures
   * in large-scale networks") — the cheap community signal a host
   * graph yields (site families, link farms, mirror clusters) where
   * connected components are too coarse (one giant component) and
   * modularity methods too expensive at 10^11 edges.
   *
   * DETERMINISTIC synchronous variant: the paper breaks ties
   * uniformly at random and updates asynchronously in random order —
   * neither is reproducible across partitionings, so here every node
   * simultaneously adopts the most frequent label among its
   * NEIGHBORS, ties to the SMALLEST label, isolated nodes keep their
   * own id. All-integer: bit-identical at any parallelism, oracle
   * replays rounds as unrolled SQL windows. The classic synchronous
   * caveat is inherited and documented: 2-colorable subgraphs can
   * oscillate (a lone edge swaps labels forever), so callers pick a
   * fixed round count — the same fixed-round discipline as
   * [[pageRank]] — rather than a convergence test.
   *
   * Per round: labels ⋈ undirected edges (co-partitioned equi-join) →
   * (node, label) count with map-side combine — mega-hub fan-in
   * collapses in the combiner — → per-node argmax via ONE
   * min(struct(-count, label)) hash aggregate (no window, no sort of
   * the neighbor table). Lineage truncated per round.
   *
   * @param edges (src, dst) — symmetrized + deduplicated internally,
   *              self-loops dropped
   * @param nodes (node) full vertex set
   * @return (node: long, label: long) — nodes sharing a label after
   *         `iterations` rounds form one community
   */
  def labelProp(edges: DataFrame, nodes: DataFrame, iterations: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1)
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nd = nodes.select(col("node").cast("long").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var lab = nd.withColumn("label", col("node"))
    var i = 0
    while (i < iterations) {
      val cnt = lab.join(und, lab("node") === und("src"))
        .groupBy(und("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val pick = cnt.groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("node"), col("m.l").as("nl"))
      val next = nd.join(pick, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("node")).as("label"))
      lab =
        if (checkpointDir.isDefined) next.checkpoint()
        else next.localCheckpoint()
      i += 1
    }
    und.unpersist(); nd.unpersist()
    lab
  }

  /**
   * Per-node triangle counting with DEGREE ORDERING (the
   * node-iterator++ scheme analyzed in Suri & Vassilvitskii 2011,
   * "Counting triangles and the curse of the last reducer", WWW) —
   * the local-clustering signal over a web graph: link farms and
   * mirror families are triangle-dense, genuine editorial link
   * neighborhoods are sparse.
   *
   * The whole point is the orientation: every undirected edge is
   * directed from its (degree, id)-SMALLER endpoint to the larger,
   * so wedges are only enumerated at each triangle's lowest-degree
   * corner. Out-degree under this orientation is O(√m) for ANY graph
   * — the 10^8-follower hub that would otherwise enumerate C(10^8,2)
   * wedges (the "last reducer") emits almost none, because nearly
   * all its edges point INTO it. That published bound is the skew
   * valve; no sampling, the count stays exact.
   *
   * Plan: canonical-pair dedup → degree aggregate (map-side
   * combined) → orientation join → ONE self-join on the wedge apex
   * (co-hash-partitioned) → ONE membership equi-join against the
   * oriented edge set → explode each triangle to its three corners →
   * count per node. Each triangle is found exactly once (its two
   * non-apex corners are ordered by construction, so only one of the
   * two wedge permutations can close).
   *
   * @param edges (src, dst) any direction; symmetrized, deduplicated,
   *              self-loops dropped
   * @param nodes (node) full vertex set
   * @return (node: long, degree: long, n_tri: long) — degree in the
   *         simple undirected graph; n_tri = triangles containing the
   *         node (0 for triangle-free and isolated nodes). The global
   *         triangle count is sum(n_tri)/3; the local clustering
   *         coefficient is 2·n_tri/(degree·(degree−1)) — left to
   *         callers, integers only here
   */
  def triangles(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // canonical undirected pairs (a < b), self-loops dropped
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val ec = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = ec.select(col("a").as("node"))
      .union(ec.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient each edge from the (degree, id)-smaller endpoint (u) to
    // the larger (v); degrees ride along so the wedge join needs none
    val da = deg.select(col("node").as("a"), col("degree").as("dega"))
    val db = deg.select(col("node").as("b"), col("degree").as("degb"))
    val o = ec.join(da, "a").join(db, "b")
      .select(
        when(col("dega") < col("degb") ||
             (col("dega") === col("degb") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            col("dega").as("du"), col("degb").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            col("degb").as("du"), col("dega").as("dv"))).as("s"))
      .select(col("s.u").as("u"), col("s.v").as("v"),
        col("s.du").as("du"), col("s.dv").as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at the apex u: pick the ordered pair of out-neighbors
    // ((dv,v) lexicographic), so the closing edge v1->v2 can exist in
    // the oriented set for exactly one of the two permutations
    val o1 = o.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val o2 = o.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = o1.join(o2, "u")
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    val oe = o.select(col("u").as("v1"), col("v").as("v2"))
    val tri = wedges.join(oe, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tri.select(explode(array(col("u"), col("v1"),
        col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val out = nodes.select(col("node").cast("long").as("node"))
      .join(deg, Seq("node"), "left")
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
    // ec/o stay persisted until the caller's action completes (no
    // checkpoint here to force them early); Verify's per-query
    // clearCache and app teardown reclaim them
    out
  }

  /**
   * k-core membership by iterative peeling (Seidman 1983; the
   * distributed form is the degree-threshold fixpoint of
   * Montresor/De Pellegrini/Miorandi 2013) — repeatedly delete nodes
   * of degree < k in the surviving subgraph until none remain. The
   * k-core is the classic link-farm indicator (spam clusters are
   * dense and survive high k; editorial link neighborhoods peel
   * away) and the preprocessing step community algorithms run first.
   *
   * The k-core is a UNIQUE fixpoint — peeling order never changes
   * the answer — so iterating to convergence is bit-deterministic at
   * any parallelism with no tie-break machinery at all (the contrast
   * with [[labelProp]]). Per round: degrees over surviving edges
   * (map-side combined), threshold filter, semi-join the edge set
   * down (both sides broadcast-free hash joins). Convergence is
   * probed with a 1-row count aggregate per round (the
   * connected-components probe discipline); throws after `maxRounds`
   * rather than looping silently — peeling depth is bounded by the
   * degeneracy ordering length, in practice a handful of rounds on
   * power-law graphs.
   *
   * @param edges (src, dst) any direction; symmetrized, deduplicated,
   *              self-loops dropped
   * @param nodes (node) full vertex set
   * @param k     minimum surviving degree (k >= 1)
   * @return (node: long, in_kcore: boolean)
   */
  def kCore(edges: DataFrame, nodes: DataFrame, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val ec0 = e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val nd = nodes.select(col("node").cast("long").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // LAZY per-round checkpoints: the convergence count() is the round's
    // one action and materializes the checkpoint as a side effect — one
    // Spark job per peeling round instead of two (the d_components
    // lazy-checkpoint discipline)
    var ec = ec0.localCheckpoint(false)
    var nEdges = ec.count()
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"kCore: no fixpoint after $maxRounds peeling rounds")
      val deg = ec.select(col("a").as("node"))
        .union(ec.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__deg"))
      val alive = deg.filter(col("__deg") >= k).select(col("node"))
      val next = ec
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(false)
      val nNext = next.count()
      converged = nNext == nEdges
      ec = next; nEdges = nNext; rounds += 1
    }
    val core = ec.select(col("a").as("node"))
      .union(ec.select(col("b").as("node"))).distinct()
      .withColumn("__in", lit(true))
    val out = nd.join(core, Seq("node"), "left")
      .select(col("node"), coalesce(col("__in"), lit(false)).as("in_kcore"))
    nd.unpersist()
    out
  }
}
