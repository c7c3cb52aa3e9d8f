package graft.dedup

import graft.SparkSpec

/** Pins the q129 containment card's metric identities — the relations
  * between Broder's two measures that the oracle hash alone can't
  * localize a violation of. */
class ContainmentSpec extends SparkSpec {

  test("q129: containment dominates jaccard, direction follows size, bounds hold") {
    val rows = DedupQueries.q129Containment(spark, Sf0001).collect()
    assert(rows.nonEmpty, "expected contained pairs in the fixture corpus")
    rows.foreach { r =>
      val contained = r.getLong(0); val container = r.getLong(1)
      val nContained = r.getInt(2); val nContainer = r.getInt(3)
      val c = r.getDouble(4); val j = r.getDouble(5)
      assert(contained != container)
      assert(nContained <= nContainer, s"direction violates size order: $r")
      assert(c >= 0.8 && c <= 1.0, s"containment out of contract: $r")
      // |A∩B|/min ≥ |A∩B|/|A∪B| always; equality iff A == B
      assert(j <= c + 1e-12, s"jaccard exceeded containment: $r")
      assert(j > 0)
    }
  }

  test("q141: total influence per distinct content is 1; weights partition clusters") {
    val rows = DedupQueries.q141DupWeights(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    // cluster_n is the actual cluster size; every member weighs 1/n
    byCluster.foreach { case (h, ms) =>
      assert(ms.length == ms.head._3, s"cluster_n mismatch for $h")
      ms.foreach(m => assert(m._4 == 1.0 / m._3))
      assert(math.abs(ms.map(_._4).sum - 1.0) < 1e-12, s"cluster $h influence != 1")
    }
    // the headline invariant: sum of weights = number of distinct contents
    assert(math.abs(rows.map(_._4).sum - byCluster.size) < 1e-9)
    // doc_ids partition: every document appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q129: full-containment pairs with unequal sizes keep jaccard strictly below 1") {
    val rows = DedupQueries.q129Containment(spark, Sf0001).collect()
      .filter(r => r.getDouble(4) == 1.0 && r.getInt(2) < r.getInt(3))
    // the card's reason to exist: strict near-subset pairs score 1.0 on
    // containment while jaccard = |A|/|B| < 1 — q20's threshold can miss them
    rows.foreach { r =>
      val expected = r.getInt(2).toDouble / r.getInt(3)
      assert(math.abs(r.getDouble(5) - expected) < 1e-9,
        s"full containment should give jaccard |A|/|B|: $r")
    }
  }
}
