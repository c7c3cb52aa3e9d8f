package graft.sim

import graft.SparkSpec

/** The q25 ANN gate: LSH top-5 must achieve high recall against the exact
  * q24 top-5 on the same data. q25 has no DuckDB oracle by design
  * (approximate), so THIS spec is its verification. */
class SimilarityRecallSpec extends SparkSpec {

  private lazy val exact: Set[(Long, Long)] =
    SimilarityQueries.q24CosineTopK(spark, Sf0001)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(approx: Set[(Long, Long)]): Double = {
    assert(exact.nonEmpty)
    (exact intersect approx).size.toDouble / exact.size
  }

  test("q25 LSH ANN achieves recall@5 >= 0.9 vs exact q24 at sf0.001") {
    val approx = SimilarityQueries.q25AnnLsh(spark, Sf0001)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = recallOf(approx)
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("q45 IVF ANN achieves recall@5 >= 0.9 vs exact q24 at sf0.001") {
    val approx = SimilarityQueries.q45SimIvf(spark, Sf0001)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = recallOf(approx)
    assert(recall >= 0.9, s"recall@5 = $recall")
  }
}
