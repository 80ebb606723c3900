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
