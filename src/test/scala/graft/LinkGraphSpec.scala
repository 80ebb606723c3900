package graft

import org.apache.spark.sql.functions._

import graft.web.LinkGraph

/**
 * Fixed-point PageRank + host graph — hand-computed expectations on a
 * tiny graph (the values below are derived on paper from the exact
 * integer recurrence, not from running the engine); the full-scale
 * answers are oracle-checked by w_pagerank's unrolled-SQL replay.
 */
class LinkGraphSpec extends SparkTestBase {

  private val S = 10000000000L // default scale
  private val T = 1500000000L  // teleport = 15% of scale

  private def ranks(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("node")
    LinkGraph.pageRank(e, n, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: one iteration on a 3-node cycle-with-chord, by hand") {
    // 0->1, 1->0, 1->2, 2->0; outdeg 0:1, 1:2, 2:1; all start at S.
    // recv(0) = S div 2 + S = 15e9 -> T + 85*15e9 div 100 = 14.25e9
    // recv(1) = S                  -> T + 8.5e9        = 10.0e9
    // recv(2) = S div 2            -> T + 4.25e9       = 5.75e9
    val r = ranks(Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), iters = 1)
    assert(r == Map(0L -> 14250000000L, 1L -> 10000000000L,
      2L -> 5750000000L))
  }

  test("pageRank: second iteration keeps exact integer arithmetic") {
    // from the ranks above:
    // recv(0) = 10.0e9 div 2 + 5.75e9 = 10.75e9 -> T + 9.1375e9 = 10.6375e9
    // recv(1) = 14.25e9                -> T + 12.1125e9 = 13.6125e9
    // recv(2) = 10.0e9 div 2           -> T + 4.25e9    = 5.75e9
    val r = ranks(Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), iters = 2)
    assert(r == Map(0L -> 10637500000L, 1L -> 13612500000L,
      2L -> 5750000000L))
  }

  test("pageRank: isolated node keeps exactly the teleport mass; " +
    "self-loops and duplicate edges are dropped") {
    // node 3 isolated; edge list carries a self-loop and a duplicate
    val r = ranks(Seq((0L, 0L), (0L, 1L), (0L, 1L), (1L, 0L)),
      Seq(0L, 1L, 3L), iters = 1)
    // effective graph: 0<->1, both outdeg 1: both get T + 85% of S
    assert(r(0L) == T + 8500000000L && r(1L) == T + 8500000000L)
    assert(r(3L) == T)
  }

  test("pageRank: flooring is per-edge (div before sum)") {
    // 0->2, 1->2 with outdeg 0:2 (0->2, 0->3): rank S div 2 twice
    val r = ranks(Seq((0L, 2L), (0L, 3L), (1L, 2L)),
      Seq(0L, 1L, 2L, 3L), iters = 1)
    // recv(2) = S div 2 + S = 15e9; recv(3) = S div 2
    assert(r(2L) == T + 85L * 15000000000L / 100L)
    assert(r(3L) == T + 85L * 5000000000L / 100L)
    assert(r(0L) == T && r(1L) == T) // nothing points at 0 or 1
  }

  private def hits(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("node")
    LinkGraph.hits(e, n, iterations = iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("hits: one I-then-O round on a 3-node graph, by hand") {
    // 0->1, 0->2, 1->2, 2->0; hubs start at 1e6, scale 1e6.
    // a_raw = (1e6, 1e6, 2e6), max 2e6 -> auth (5e5, 5e5, 1e6)
    // h_raw(0)=a1+a2=1.5e6, h_raw(1)=a2=1e6, h_raw(2)=a0=5e5; max 1.5e6
    // -> hub (1e6, 666666, 333333) after the floor-div renormalize
    val r = hits(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), iters = 1)
    assert(r == Map(0L -> (500000L, 1000000L),
      1L -> (500000L, 666666L), 2L -> (1000000L, 333333L)))
  }

  test("hits: second round keeps exact integer arithmetic") {
    // from round 1: a_raw = (333333, 1e6, 1666666), max 1666666 ->
    // auth (199999, 600000, 1000000) [floor: 333333e6/1666666 = 199999]
    // h_raw = (1.6e6, 1e6, 199999), max 1.6e6 ->
    // hub (1000000, 625000, 124999)
    val r = hits(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), iters = 2)
    assert(r == Map(0L -> (199999L, 1000000L),
      1L -> (600000L, 625000L), 2L -> (1000000L, 124999L)))
  }

  test("hits: isolated node scores zero; self-loops and duplicate " +
    "edges dropped; argmax pinned at exactly scale") {
    val r = hits(Seq((0L, 0L), (0L, 1L), (0L, 1L), (1L, 0L)),
      Seq(0L, 1L, 7L), iters = 3)
    // effective 0<->1: symmetric, both renormalize to exactly scale
    assert(r(0L) == (1000000L, 1000000L))
    assert(r(1L) == (1000000L, 1000000L))
    assert(r(7L) == (0L, 0L))
  }

  test("hits: edge-free graph yields all-zero scores, not nulls") {
    val r = hits(Seq((5L, 5L)), Seq(3L, 5L), iters = 1)
    assert(r == Map(3L -> (0L, 0L), 5L -> (0L, 0L)))
  }

  test("hits: bit-identical across parallelism (1 vs 32 partitions)") {
    import spark.implicits._
    val edges = (0L until 200L).flatMap { i =>
      Seq((i, (i + 1) % 200L), (i, (i * 13 + 7) % 200L))
    }
    val nodes = (0L until 200L)
    val one = LinkGraph.hits(
      edges.toDF("src", "dst").repartition(1),
      nodes.toDF("node").repartition(1), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val many = LinkGraph.hits(
      edges.toDF("src", "dst").repartition(32),
      nodes.toDF("node").repartition(32), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(one == many)
  }

  private def trust(edges: Seq[(Long, Long)], nodes: Seq[Long],
      seeds: Seq[Long], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.trustRank(edges.toDF("src", "dst"), nodes.toDF("node"),
      seeds.toDF("node"), iterations = iters, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("trustRank: one round on a 3-node graph, by hand") {
    // 0->1, 0->2, 1->2, 2->0; seed {0}; scale 1e6, damping 85.
    // init (1e6, 0, 0); contributions 0: 5e5 to each of 1,2.
    // next: 0 = 150000 (seed teleport only), 1 = 2 = 85*5e5//100
    val r = trust(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), Seq(0L), iters = 1)
    assert(r == Map(0L -> 150000L, 1L -> 425000L, 2L -> 425000L))
  }

  test("trustRank: second round keeps exact integer arithmetic") {
    // contributions: 0: 75000 each; 1: 425000 -> 2; 2: 425000 -> 0
    // 0 = 150000 + 85*425000//100 = 511250; 1 = 85*75000//100 = 63750;
    // 2 = 85*(75000+425000)//100 = 425000
    val r = trust(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)),
      Seq(0L, 1L, 2L), Seq(0L), iters = 2)
    assert(r == Map(0L -> 511250L, 1L -> 63750L, 2L -> 425000L))
  }

  test("trustRank: pages unreachable from the seed set score exactly 0; " +
    "an isolated seed keeps exactly its teleport") {
    // component {0,1} seeded, component {2,3} not; 7 isolated seed
    val r = trust(Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L)),
      Seq(0L, 1L, 2L, 3L, 7L), Seq(0L, 7L), iters = 3)
    assert(r(2L) == 0L && r(3L) == 0L)
    assert(r(7L) == 150000L) // teleport only, every round
    assert(r(0L) > 0L && r(1L) > 0L)
  }

  test("trustRank: seeds not in the node set are ignored") {
    val r = trust(Seq((0L, 1L)), Seq(0L, 1L), Seq(99L), iters = 2)
    assert(r == Map(0L -> 0L, 1L -> 0L)) // no effective seed: all zero
  }

  test("trustRank: bit-identical across parallelism (1 vs 32 partitions)") {
    import spark.implicits._
    val edges = (0L until 200L).flatMap { i =>
      Seq((i, (i + 1) % 200L), (i, (i * 13 + 7) % 200L))
    }
    val nodes = (0L until 200L)
    val seeds = (0L until 200L by 17)
    def run(p: Int) = LinkGraph.trustRank(
      edges.toDF("src", "dst").repartition(p),
      nodes.toDF("node").repartition(p),
      seeds.toDF("node").repartition(p),
      iterations = 3, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(32))
  }

  private def lpa(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.labelProp(edges.toDF("src", "dst"), nodes.toDF("node"),
      iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelProp: one round — neighbor majority, min-label ties, " +
    "isolated keeps own id") {
    // triangle 1-2-3 plus edge 4-5, isolated 9
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    val r = lpa(e, Seq(1L, 2L, 3L, 4L, 5L, 9L), iters = 1)
    // 1 sees {2,3} tie -> 2; 2 sees {1,3} -> 1; 3 sees {1,2} -> 1
    assert(r == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L,
      9L -> 9L))
  }

  test("labelProp: round 2 converges the triangle; the lone edge " +
    "oscillates (documented synchronous caveat)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    val r = lpa(e, Seq(1L, 2L, 3L, 4L, 5L, 9L), iters = 2)
    // 1 sees labels {1,1} -> 1; 2 sees {2,1} -> 1; 3 sees {2,1} -> 1
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      9L -> 9L))
  }

  test("labelProp: symmetrization — a directed edge propagates both " +
    "ways; duplicates and self-loops dropped") {
    val r = lpa(Seq((7L, 3L), (7L, 3L), (7L, 7L)), Seq(3L, 7L), iters = 2)
    // und edges 7<->3: round1 swap (7->3, 3->7); round2 swap back
    assert(r == Map(3L -> 3L, 7L -> 7L))
  }

  test("labelProp: bit-identical across parallelism (1 vs 32 partitions)") {
    import spark.implicits._
    val edges = (0L until 200L).flatMap { i =>
      Seq((i, (i + 1) % 200L), (i, (i * 13 + 7) % 200L))
    }
    val nodes = (0L until 200L)
    def run(p: Int) = LinkGraph.labelProp(
      edges.toDF("src", "dst").repartition(p),
      nodes.toDF("node").repartition(p), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(32))
  }

  private def tri(edges: Seq[(Long, Long)], nodes: Seq[Long])
  : Map[Long, (Long, Long)] = {
    import spark.implicits._
    LinkGraph.triangles(edges.toDF("src", "dst"), nodes.toDF("node"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("triangles: K4 — every node has degree 3 and sits in 3 of the " +
    "4 triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val r = tri(k4, Seq(0L, 1L, 2L, 3L))
    assert(r == Map(0L -> (3L, 3L), 1L -> (3L, 3L), 2L -> (3L, 3L),
      3L -> (3L, 3L)))
    assert(r.values.map(_._2).sum / 3 == 4) // global count
  }

  test("triangles: pendant and isolated nodes score 0; " +
    "direction/duplicates/self-loops ignored") {
    // triangle 0-1-2 (one edge given BOTH ways + duplicated), pendant
    // 3 on 0, self-loop on 2, isolated 9
    val e = Seq((0L, 1L), (1L, 0L), (1L, 0L), (1L, 2L), (2L, 0L),
      (0L, 3L), (2L, 2L))
    val r = tri(e, Seq(0L, 1L, 2L, 3L, 9L))
    assert(r == Map(0L -> (3L, 1L), 1L -> (2L, 1L), 2L -> (2L, 1L),
      3L -> (1L, 0L), 9L -> (0L, 0L)))
  }

  test("triangles: a 5-ring has none") {
    val e = (0L until 5L).map(i => (i, (i + 1) % 5))
    val r = tri(e, (0L until 5L))
    assert(r.values.forall(_ == ((2L, 0L))))
  }

  test("triangles: bit-identical across parallelism (1 vs 32 partitions)") {
    import spark.implicits._
    val edges = (0L until 120L).flatMap { i =>
      Seq((i, (i + 1) % 120L), (i, (i * 13 + 7) % 120L),
        (i, (i + 2) % 120L))
    }
    val nodes = (0L until 120L)
    def run(p: Int) = LinkGraph.triangles(
      edges.toDF("src", "dst").repartition(p),
      nodes.toDF("node").repartition(p))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val a = run(1); val b = run(32)
    assert(a == b && a.map(_._3).sum > 0) // ring+chords DO close triangles
  }

  private def core(edges: Seq[(Long, Long)], nodes: Seq[Long], k: Int,
      maxRounds: Int = 50): Map[Long, Boolean] = {
    import spark.implicits._
    LinkGraph.kCore(edges.toDF("src", "dst"), nodes.toDF("node"), k,
      maxRounds)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("kCore: K4 with a pendant — the clique survives k=3, the " +
    "pendant peels") {
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b))
    val r = core(k4 :+ ((0L, 9L)), Seq(0L, 1L, 2L, 3L, 9L), k = 3)
    assert(r == Map(0L -> true, 1L -> true, 2L -> true, 3L -> true,
      9L -> false))
  }

  test("kCore: a cycle IS a 2-core and has no 3-core") {
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(core(ring, (0L until 6L), k = 2).values.forall(identity))
    assert(core(ring, (0L until 6L), k = 3).values.forall(!_))
  }

  test("kCore: a chain peels from both ends over multiple rounds") {
    val chain = (0L until 6L).map(i => (i, i + 1)) // 0-1-...-6
    val r = core(chain, (0L to 6L), k = 2)
    assert(r.values.forall(!_)) // a tree has no 2-core
  }

  test("kCore: attached chain peels while the clique stays — and " +
    "maxRounds=1 throws on the multi-round peel") {
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b))
    val e = k4 ++ Seq((3L, 10L), (10L, 11L), (11L, 12L))
    val r = core(e, Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L), k = 2)
    assert(r == Map(0L -> true, 1L -> true, 2L -> true, 3L -> true,
      10L -> false, 11L -> false, 12L -> false))
    intercept[IllegalStateException] {
      core(e, Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L), k = 2, maxRounds = 1)
    }
  }

  test("hostGraph: weighted collapse, keepSelf toggle") {
    import spark.implicits._
    val links = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "a"))
      .toDF("src_host", "dst_host")
    val g = LinkGraph.hostGraph(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(g == Set(("a", "b", 2L), ("a", "a", 1L), ("b", "a", 1L)))
    val noSelf = LinkGraph.hostGraph(links, keepSelf = false).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(noSelf == Set(("a", "b", 2L), ("b", "a", 1L)))
  }
}
