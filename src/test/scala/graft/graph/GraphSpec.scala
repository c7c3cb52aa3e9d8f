package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[GraphQueries.pageRank]] on hand-analyzable graphs (exact values
  * where symmetry forces them, ordering/conservation invariants
  * elsewhere), then q93's structural invariants at sf0.001. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def pr(edges: Seq[(Long, Long)], rounds: Int = 3): Map[Long, BigDecimal] =
    GraphQueries.pageRank(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap

  test("4-cycle stays exactly uniform at 1/4 per node") {
    // every node has degree 2 and receives two equal contributions:
    // 0.85·0.25/2 rounds exactly at 6 dp, so uniformity is EXACT
    val m = pr(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(m.keySet == Set(0L, 1L, 2L, 3L))
    m.values.foreach(v => assert(v == BigDecimal("0.250000")))
  }

  test("star: hub outranks leaves, leaves are equal, mass conserves") {
    val m = pr(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    val leaves = Seq(1L, 2L, 3L, 4L).map(m)
    assert(leaves.distinct.size == 1)
    assert(m(10L) > leaves.head)
    // each per-edge contribution loses ≤ 5e-7 to rounding per round
    assert((m.values.sum - 1).abs < BigDecimal("0.0001"))
  }

  test("disjoint isomorphic components get identical distributions") {
    val m = pr(Seq((1L, 2L), (2L, 3L), (11L, 12L), (12L, 13L)))
    assert(m(1L) == m(11L) && m(2L) == m(12L) && m(3L) == m(13L))
    assert(m(2L) > m(1L)) // path center outranks endpoints
  }

  /** Driver-side replica of the engine's per-round arithmetic — SAME
    * double ops ((0.85 · pr) / deg), SAME double→DECIMAL(18,6) HALF_UP
    * rounding (scala BigDecimal(Double) and Spark's Decimal(Double) both
    * go through Double.toString), SAME exact decimal summation — so deep
    * runs can be checked value-for-value against an independent path. */
  private def simulate(edges: Seq[(Long, Long)], rounds: Int): Map[Long, BigDecimal] = {
    def dec(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size }
    val n = deg.size
    val base = dec(0.15 / n)
    var rank = deg.map { case (v, _) => v -> dec(1.0 / n) }
    for (_ <- 1 to rounds) {
      rank = sym
        .map { case (src, dst) => dst -> dec(0.85 * rank(src).toDouble / deg(src)) }
        .groupBy(_._1)
        .map { case (v, cs) => v -> (base + cs.map(_._2).sum) }
    }
    rank
  }

  test("deep rounds (10, past the checkpoint knob) match the driver simulation") {
    // asymmetric graph: path + star arm + a cycle tail, so no symmetry
    // masks a wrong contribution; 10 > CheckpointDepth exercises the
    // per-round localCheckpoint path end to end
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (3L, 6L),
      (6L, 7L), (7L, 8L), (8L, 6L))
    val got = pr(edges, rounds = 10)
    val want = simulate(edges, rounds = 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, p) => assert(p == want(v), s"node $v: got $p want ${want(v)}") }
  }

  test("shallow rounds match the same simulation (knob off, broadcast on)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (3L, 6L))
    val got = pr(edges, rounds = 3)
    assert(got == simulate(edges, rounds = 3))
    // small-rank broadcast: the final round's executed plan must join the
    // rank frame via broadcast, never shuffling the edge side
    val df = GraphQueries.pageRank(edges.toDF("src", "dst"), 3)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "rank frame below BroadcastNodes should broadcast into the round join")
  }

  // ------------------------------------------------------------- LPA

  private def lpa(edges: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] =
    GraphQueries.labelPropagation(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side sync plurality vote with the SAME total tie-break
    * (count desc, then smallest label). */
  private def simLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    // NO dedupe: the engine symmetrizes by union, so a graph listing both
    // directions would double-count — the sim must be exactly as literal
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val nbrs = sym.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    var lab = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (v, ns) =>
        v -> ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
          .toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("LPA: two triangles joined by a bridge resolve into two communities") {
    // triangle {1,2,3} — bridge 3–11 — triangle {11,12,13}: plurality
    // voting must NOT flood min-label 1 across the bridge (the CC
    // behavior); each triangle keeps its own local label
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L))
    val got = lpa(edges)
    assert(got == simLpa(edges, 3))
    assert(Set(got(1L), got(2L)).size == 1)
    assert(Set(got(11L), got(12L), got(13L)).size == 1)
    assert(got(1L) != got(13L), "bridge must not merge the triangles")
  }

  test("LPA deep rounds (10, past the checkpoint knob) match the simulation") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 1L), (2L, 5L), (7L, 8L), (8L, 9L), (7L, 9L), (9L, 1L))
    assert(lpa(edges, rounds = 10) == simLpa(edges, 10))
  }

  test("q123 k-hop reach at sf0.001: per-seed monotone growth, bipartite parity, bounded by the graph") {
    val rows = GraphQueries.q123KhopReach(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 9) // 3 seeds × 3 hops
    rows.groupBy(_._1).foreach { case (seed, hs) =>
      val byHop = hs.sortBy(_._2).map(_._3)
      assert(byHop.length == 3 && seed.startsWith("s:"))
      // cumulative reach never shrinks, and hop 1 of a supplier seed
      // reaches only customers (bipartite), so it's strictly positive
      assert(byHop(0) > 0 && byHop(0) <= byHop(1) && byHop(1) <= byHop(2),
        s"$seed: non-monotone reach ${byHop.mkString(",")}")
    }
  }

  test("q93 at sf0.001: node namespaces, positive mass, conservation") {
    val rows = GraphQueries.q93PageRank(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, p) =>
      (n.startsWith("c:") || n.startsWith("s:")) && p > 0.0 && p < 1.0
    })
    val total = rows.map(_._2).sum
    assert(math.abs(total - 1.0) < 0.001, s"mass drifted: $total")
    // suppliers are ~100× fewer than customers in a TPC-H-shaped graph —
    // the rank mass concentrates there; the top node must be a supplier
    val top = rows.maxBy(_._2)._1
    assert(top.startsWith("s:"), s"expected a supplier hub on top, got $top")
  }

  /** HITS on a hand-traceable bipartite graph: c1→{s10,s11}, c2→{s10}.
    * Hand-rolled through the engine's own arithmetic (exact decimal sums,
    * one double division per normalization, HALF_UP to 6 dp):
    * round 1: a = (2/3, 1/3) → h = (0.600000, 0.400000)
    * round 2: a10 = 1.0/1.6 = 0.625, a11 = 0.6/1.6 = 0.375;
    *          h1 = 1.0/1.625 = 0.615385, h2 = 0.625/1.625 = 0.384615 */
  test("HITS: two-customer wedge matches the hand computation") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("c", "s")
    val m = GraphQueries.hits(e, rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> BigDecimal(r.getDecimal(2))).toMap
    assert(m(("authority", 10L)) == BigDecimal("0.625000"))
    assert(m(("authority", 11L)) == BigDecimal("0.375000"))
    assert(m(("hub", 1L)) == BigDecimal("0.615385"))
    assert(m(("hub", 2L)) == BigDecimal("0.384615"))
  }

  test("q130 at sf0.001: roles partition the namespaces, each role's L1 mass is 1") {
    val rows = GraphQueries.q130Hits(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, role, s) =>
      assert(if (role == "hub") n.startsWith("c:") else n.startsWith("s:"),
        s"role/namespace mismatch: ($n, $role)")
      assert(s > 0.0 && s < 1.0)
    }
    Seq("hub", "authority").foreach { role =>
      val mass = rows.filter(_._2 == role).map(_._3).sum
      // each node loses ≤ 5e-7 to rounding in the final normalization
      assert(math.abs(mass - 1.0) < 0.001, s"$role mass drifted: $mass")
    }
    // suppliers are ~100× fewer than customers: every authority score
    // dwarfs every hub score after one round of reinforcement
    val minAuth = rows.filter(_._2 == "authority").map(_._3).min
    val maxHub = rows.filter(_._2 == "hub").map(_._3).max
    assert(minAuth > maxHub,
      s"expected authority mass concentration: min auth $minAuth vs max hub $maxHub")
  }
}
