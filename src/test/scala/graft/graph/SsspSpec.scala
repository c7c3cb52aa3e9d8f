package graft.graph

import graft.SparkSpec

/** q145 SSSP invariants: the min-plus semiring's defining properties on
  * the hop-bounded distance frame. */
class SsspSpec extends SparkSpec {

  private lazy val rows = GraphQueries.q145Sssp(spark, Sf0001).collect()
    .map(r => (r.getAs[String]("seed"), r.getAs[String]("node")) -> r.getAs[Long]("dist"))
    .toMap

  test("q145: each seed reaches itself at distance zero") {
    val seeds = rows.keys.map(_._1).toSet
    assert(seeds.nonEmpty)
    for (s <- seeds) assert(rows((s, s)) == 0L, s"seed $s self-distance")
  }

  test("q145: distances are nonnegative and bounded by hops × max edge weight") {
    // l_quantity ∈ [1, 50], 3 relaxation rounds
    for (((s, n), d) <- rows) {
      assert(d >= 0, s"($s,$n) negative distance")
      assert(d <= 3 * 50, s"($s,$n) distance $d exceeds the hop bound")
    }
  }

  test("q145: k-hop SSSP reaches exactly the q123 k-hop BFS node set per seed") {
    // same seeds, same symmetrized trade graph, same hop budget — the
    // weighted relaxation must visit precisely the reachable set (BFS
    // counts exclude the seed itself; SSSP rows include it at dist 0)
    val bfs = GraphQueries.q123KhopReach(spark, Sf0001).collect()
      .filter(_.getAs[Int]("hop") == 3)
      .map(r => r.getAs[String]("seed") -> r.getAs[Long]("n_reached")).toMap
    val sssp = rows.keys.groupBy(_._1).map { case (s, ks) => s -> (ks.size - 1).toLong }
    assert(sssp == bfs, s"reachable sets diverge: sssp=$sssp bfs=$bfs")
  }
}
