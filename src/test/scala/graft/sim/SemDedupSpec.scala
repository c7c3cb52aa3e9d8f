package graft.sim

import graft.SparkSpec

/** Pins q96's SemDeDup contract at sf0.001 against the exact global
  * near-dup pairs (q26, same threshold) and the cluster assignment (q70):
  * a vector is dropped iff some SAME-CLUSTER smaller-id vector is within
  * the cosine threshold — so q96's dup relation must be exactly the
  * cluster-restricted subset of q26's pair set, no more, no less. */
class SemDedupSpec extends SparkSpec {

  private lazy val sem = SimilarityQueries.q96SemDedup(spark, Sf0001)
    .collect()
    .map(r => r.getLong(0) -> ((r.get(1).toString, r.getLong(2), r.getBoolean(4))))
    .toMap
  private lazy val cluster = SimilarityQueries.q70CentroidAssign(spark, Sf0001)
    .collect().map(r => r.getLong(0) -> r.get(2).toString).toMap
  private lazy val globalPairs = SimilarityQueries.q26EmbeddingNearDup(spark, Sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("every vector is reported once, clusters agree with q70") {
    assert(sem.keySet == cluster.keySet)
    sem.foreach { case (id, (cl, _, _)) => assert(cl == cluster(id), s"vec $id cluster") }
  }

  test("dropped set is exactly the cluster-restricted q26 dup relation") {
    val sameCluster = globalPairs.filter { case (a, b) => cluster(a) == cluster(b) }
    val expectedDropped = sameCluster.map(_._2).toSet
    val dropped = sem.collect { case (id, (_, _, false)) => id }.toSet
    assert(dropped == expectedDropped,
      s"dropped mismatch: extra=${dropped -- expectedDropped} missing=${expectedDropped -- dropped}")
    // per-vector count matches the number of smaller same-cluster dups
    val countByIdb = sameCluster.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    sem.foreach { case (id, (_, n, kept)) =>
      assert(n == countByIdb.getOrElse(id, 0L), s"vec $id dup count")
      assert(kept == (n == 0L), s"vec $id kept flag")
    }
    // the approximation is real on this corpus: q26 must also contain
    // cross-cluster pairs q96 deliberately misses (else the test is vacuous)
    assert(sameCluster.length < globalPairs.length,
      "expected some cross-cluster pairs to be missed by design")
  }
}
