package graft.dedup

import graft.SparkSpec

/** Pins [[DedupQueries.connectedComponents]] (min-label propagation +
  * pointer jumping) on hand-built graphs where the expected labelling is
  * obvious, then checks q65/q69's structural invariants at sf0.001. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupQueries.connectedComponents(edges.toDF("ida", "idb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph collapses to its minimum id") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate labels") {
    assert(cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("bridged stars merge into one component") {
    // two stars joined by a bridge between leaves — exercises the pointer
    // jump (hub labels must flow THROUGH the bridge, not just to it)
    val m = cc(Seq((5L, 6L), (5L, 7L), (9L, 10L), (9L, 11L), (7L, 11L)))
    assert(m.values.toSet == Set(5L) && m.keySet == Set(5L, 6L, 7L, 9L, 10L, 11L))
  }

  test("q65 clusters agree with the q21 pair graph at sf0.001") {
    val pairs = DedupQueries.q21MinHashLsh(spark, Sf0001)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cl = DedupQueries.q65DedupClusters(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val label = cl.map(c => c._1 -> c._2).toMap
    // exactly the paired docs are clustered, both ends of every pair share
    // a label, the label is a member (the minimum), sizes are consistent
    assert(label.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
    label.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
    val sizes = label.groupBy(_._2).map { case (l, m) => l -> m.size.toLong }
    cl.foreach { case (doc, lbl, sz) => assert(sizes(lbl) == sz, s"doc $doc") }
  }

  test("q72 winnow pairs: ordered ids, containment in (0, 1], threshold respected") {
    val rows = DedupQueries.q72WinnowPairs(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (a, b, shared, cont) =>
      assert(a < b)
      assert(shared >= 8)
      assert(cont > 0.0 && cont <= 1.0, s"($a,$b): $cont")
    }
    // exact duplicates (identical normalized text) have IDENTICAL
    // fingerprint sets — every exact-dup pair that q72 emits must score
    // containment exactly 1.0
    val haveExactDups = DedupQueries.q19DedupExact(spark, Sf0001)
      .filter("n_docs >= 2").limit(1).count() > 0
    if (haveExactDups && rows.nonEmpty)
      assert(rows.exists(_._4 == 1.0),
        "exact-dup clusters exist but no containment-1.0 pair was emitted")
  }

  test("q69 substring-dup counts are bounded and mutual at sf0.001") {
    val rows = DedupQueries.q69SubstringDedup(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, dup) =>
      assert(dup >= 0 && dup <= n, s"doc $doc: $dup of $n")
    }
    // duplication is mutual: a doc with a duplicated chunk implies at
    // least one OTHER doc also has a duplicated chunk
    val withDups = rows.count(_._3 > 0)
    assert(withDups != 1)
  }

  test("q92 source-overlap matrix matches a brute-force per-source set computation") {
    import org.apache.spark.sql.functions.{col, collect_set, explode}
    import graft.text.TextOps._
    val got = DedupQueries.q92SourceOverlap(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // independent spelling: whole per-source shingle sets on the driver
    val sets = graft.sql.Tables(spark, Sf0001).documents
      .select(col("source"), explode(shingleHashes(tokens(normText(col("text"))))).as("h"))
      .groupBy("source").agg(collect_set("h").as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val want = sets.keys.toSeq.sorted.combinations(2).flatMap { case Seq(a, b) =>
      val shared = (sets(a) & sets(b)).size.toLong
      if (shared == 0) None
      else Some((a, b) -> (shared, sets(a).size.toLong, sets(b).size.toLong,
        shared.toDouble / (sets(a).size + sets(b).size - shared)))
    }.toMap
    assert(got == want)
    got.values.foreach { case (shared, na, nb, j) =>
      assert(shared <= math.min(na, nb) && j > 0.0 && j <= 1.0)
    }
  }
}
