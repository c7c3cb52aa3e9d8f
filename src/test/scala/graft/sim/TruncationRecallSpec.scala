package graft.sim

import graft.SparkSpec

/** q150 truncation-recall invariants, checked against a from-scratch
  * driver-side reimplementation (the corpus is small enough at sf0.001
  * to brute-force both arms in plain Scala — an engine-independent
  * oracle, not a restatement of the query's own plan). */
class TruncationRecallSpec extends SparkSpec {

  private lazy val rows = SimilarityQueries.q150TruncationRecall(spark, Sf0001).collect()

  test("q150: one row per query, recall = n_overlap / 5 within [0, 1]") {
    assert(rows.map(_.getAs[Long]("qid")).sorted.toSeq == (0L until 20L).toSeq)
    for (r <- rows) {
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 5)
      assert(r.getAs[Double]("recall") == n.toDouble / 5.0)
    }
  }

  test("q150: n_overlap matches a brute-force recomputation of both arms") {
    val vecs = graft.sql.Tables(spark, Sf0001).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def sim4(a: Array[Double], b: Array[Double]): BigDecimal = {
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      // mirror the query's round(sim, 4): HALF_UP on the double's repr
      BigDecimal(java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, java.math.RoundingMode.HALF_UP))
    }
    def top5(proj: Array[Double] => Array[Double]): Map[Long, Set[Long]] =
      (0L until 20L).map { qid =>
        val q = proj(vecs(qid.toInt)._2)
        qid -> vecs.filter(_._1 != qid)
          .map { case (cid, v) => (cid, sim4(q, proj(v))) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(5).map(_._1).toSet
      }.toMap
    val full  = top5(identity)
    val trunc = top5(_.take(32))
    val expected = (0L until 20L).map(q => q -> (full(q) & trunc(q)).size.toLong).toMap
    val got = rows.map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_overlap")).toMap
    assert(got == expected, s"overlaps diverge from brute force: got $got expected $expected")
  }
}
