package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q151 k-core invariants, checked against a driver-side peel of the
  * same trade graph (small at sf0.001 — an engine-independent oracle). */
class KCoreSpec extends SparkSpec {

  private lazy val rows = GraphQueries.q151KCore(spark, Sf0001).collect()
    .sortBy(_.getAs[Int]("round"))

  test("q151: trajectory is monotone non-increasing and k is the initial lower-quartile degree") {
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => b <= a }, "node count increased")
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a }, "edge count increased")
    assert(rows.map(_.getAs[Long]("k")).distinct.length == 1, "k must be constant across rounds")
  }

  test("q151: rounds match a driver-side synchronous peel, and the fixpoint is a k-core") {
    val t = graft.sql.Tables(spark, Sf0001)
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    var adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    // lower-quartile degree by the same discrete threshold rule
    val degs = adj.values.map(_.size).toSeq.sorted
    val k = degs(math.ceil(degs.size / 4.0).toInt - 1)
    assert(rows.head.getAs[Long]("k") == k.toLong, s"adaptive k: query ${rows.head.getAs[Long]("k")} vs driver $k")
    for (r <- rows) {
      val keep = adj.filter(_._2.size >= k).keySet
      adj = adj.collect { case (v, ns) if keep(v) => v -> ns.intersect(keep) }
        .filter(_._2.nonEmpty).toMap
      // the query counts survivors of the degree gate and edges between them
      val nEdges = adj.values.map(_.size).sum / 2
      assert(r.getAs[Long]("n_nodes") == keep.size.toLong,
        s"round ${r.getAs[Int]("round")}: nodes ${r.getAs[Long]("n_nodes")} vs driver ${keep.size}")
      assert(r.getAs[Long]("n_edges") == nEdges.toLong,
        s"round ${r.getAs[Int]("round")}: edges ${r.getAs[Long]("n_edges")} vs driver $nEdges")
    }
    // if the budget converged (flat tail), the survivors form a true k-core
    if (rows.takeRight(2).map(_.getAs[Long]("n_nodes")).distinct.length == 1)
      assert(adj.values.forall(_.size >= k), "converged survivors must all have degree >= k")
  }
}
