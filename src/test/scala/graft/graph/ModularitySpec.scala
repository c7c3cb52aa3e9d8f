package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q156 modularity-trajectory invariants: each round's ledger must tally
  * the graph exactly (Σ nodes = |V|, Σ degrees = 2m, Σ internal ≤ m),
  * each round's grand Q must equal a driver-side from-scratch Newman
  * recompute on the collected edges + that round's labels, and Q must
  * live in its lawful range. */
class ModularitySpec extends SparkSpec {

  private lazy val rows = GraphQueries.q156Modularity(spark, Sf0001).collect()
  private lazy val byRound = rows.groupBy(_.getAs[Int]("round"))

  private lazy val graph = {
    val t = graft.sql.Tables(spark, Sf0001)
    t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("q156: every round's ledger tallies the graph (nodes, degrees, internal edges)") {
    val m = graph.length.toLong
    val nodes = graph.flatMap(e => Seq(e._1, e._2)).distinct.length.toLong
    assert(byRound.keySet == Set(1, 2, 3))
    byRound.foreach { case (r, rs) =>
      assert(rs.map(_.getAs[Long]("n_nodes")).sum == nodes, s"round $r nodes")
      assert(rs.map(_.getAs[Long]("degree_sum")).sum == 2 * m,
        s"round $r: sum of community degree sums must be 2m")
      val internal = rs.map(_.getAs[Long]("internal_edges")).sum
      assert(internal >= 0 && internal <= m, s"round $r internal")
      assert(rs.map(_.getAs[String]("community")).distinct.length == rs.length,
        s"round $r: one row per community")
    }
  }

  test("q156: each round's grand Q matches a driver-side Newman recompute") {
    val perRound = GraphQueries.labelPropagationRounds(
      spark.createDataFrame(graph.toSeq).toDF("src", "dst"))
      .map(_.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val m = graph.length.toDouble
    val deg = graph.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, g) => v -> g.length }
    perRound.zipWithIndex.foreach { case (lab, i) =>
      val q = lab.groupBy(_._2).map { case (c, members) =>
        val vs = members.keySet
        val lc = graph.count(e => vs.contains(e._1) && vs.contains(e._2))
        // .iterator: members.keys is a Set, and Set.map would DEDUPE
        // equal degree values before summing
        val dsum = members.keys.iterator.map(deg).sum.toDouble
        lc / m - math.pow(dsum / (2 * m), 2)
      }.sum
      val got = byRound(i + 1).head.getAs[Double]("modularity")
      assert(byRound(i + 1).map(_.getAs[Double]("modularity")).distinct.length == 1)
      assert(math.abs(got - q) < 1e-9, s"round ${i + 1}: modularity $got vs recompute $q")
      assert(got >= -0.5 && got <= 1.0)
    }
  }

  test("q156: round-3 labels are the q118 final partition (bipartite flip here)") {
    // the audit's last round must score exactly the partition q118 ships
    val finalQ = byRound(3).head.getAs[Double]("modularity")
    assert(math.abs(finalQ - (-0.5)) < 1e-12,
      s"on the bipartite trade graph the sync-LPA fixed cycle is the two-sided " +
        s"flip whose Q is exactly -1/2; got $finalQ")
  }

  test("q156: contributions sum to the round's grand Q (exact rational ledger)") {
    byRound.foreach { case (r, rs) =>
      val sum = rs.map(_.getAs[Double]("contribution")).sum
      val got = rs.head.getAs[Double]("modularity")
      // contributions are num_c/den; the grand Q divides the exact summed
      // numerator once, so the double-sum only drifts by re-association
      assert(math.abs(sum - got) < 1e-9, s"round $r: contribution sum $sum vs Q $got")
    }
  }
}
