package graft.text

import graft.SparkSpec

/** Invariants for q66 BM25 and q67 quality gates at sf0.001 (the value
  * gate is the DuckDB oracle at sf0.01; these pin the semantics that a
  * hash compare alone wouldn't explain on failure). */
class SearchSpec extends SparkSpec {

  test("q66: top-k is sorted by score desc with doc_id tie-break, scores non-negative") {
    val rows = SearchQueries.q66Bm25(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, s) => assert(s >= 0.0) }
    rows.sliding(2).foreach {
      case Array((d1, s1), (d2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2), s"order violated at $d1/$d2")
      case _ =>
    }
  }

  test("q66 is deterministic across runs") {
    val a = SearchQueries.q66Bm25(spark, Sf0001).collect().toSeq
    val b = SearchQueries.q66Bm25(spark, Sf0001).collect().toSeq
    assert(a == b)
  }

  test("q71: coverage is a valid fraction and positions are conserved") {
    val rows = TextQueries.q71BigramCoverage(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_bigrams"))
      val top = r.getLong(r.fieldIndex("n_top_positions"))
      assert(top >= 0 && top <= n)
      if (n > 0) {
        val cov = r.getDouble(r.fieldIndex("top_coverage"))
        assert(cov >= 0.0 && cov <= 1.0)
      }
    }
  }

  test("q67: keep is exactly the conjunction of the gates; ratios in range") {
    val rows = TextQueries.q67QualityGates(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gates = Seq("g_tokens", "g_mean_len", "g_alpha", "g_max_len", "g_stop")
        .map(c => r.getBoolean(r.fieldIndex(c)))
      assert(r.getBoolean(r.fieldIndex("keep")) == gates.forall(identity))
      val alpha = r.getDouble(r.fieldIndex("alpha_frac"))
      assert(alpha >= 0.0 && alpha <= 1.0)
    }
  }
}
