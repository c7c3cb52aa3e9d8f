package graft.text

import graft.SparkSpec

/** Invariants for q73 vocabulary coverage and q74 bigram-LM scoring at
  * sf0.001 (the value gate is the DuckDB oracle at sf0.01; these pin the
  * semantics a hash compare alone wouldn't explain on failure). */
class LmVocabSpec extends SparkSpec {

  test("q73: coverage thresholds are ordered and within the vocabulary") {
    val rows = TextQueries.q73VocabCoverage(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vocab = r.getLong(r.fieldIndex("vocab_size"))
      val total = r.getLong(r.fieldIndex("tokens_total"))
      val half  = r.getLong(r.fieldIndex("vocab_half"))
      val p95   = r.getLong(r.fieldIndex("vocab_p95"))
      assert(vocab >= 1 && total >= vocab)
      // the cumulative curve is monotone, so the thresholds must be ordered
      assert(1L <= half && half <= p95 && p95 <= vocab,
        s"thresholds out of order: half=$half p95=$p95 vocab=$vocab")
      // Zipf sanity: covering half the occurrences never needs more than
      // half the distinct words (equality only in a perfectly flat corpus)
      assert(half <= (vocab + 1) / 2)
    }
  }

  test("q73 is deterministic across runs") {
    val a = TextQueries.q73VocabCoverage(spark, Sf0001).collect().toSeq
    val b = TextQueries.q73VocabCoverage(spark, Sf0001).collect().toSeq
    assert(a == b)
  }

  test("q74: avg_nll is positive and finite exactly when the doc has bigrams") {
    val rows = TextQueries.q74BigramLm(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var scoredDocs = 0
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_bigrams"))
      val i = r.fieldIndex("avg_nll")
      if (n == 0) assert(r.isNullAt(i))
      else {
        scoredDocs += 1
        val nll = r.getDouble(i)
        // -ln P with add-one smoothing: P < 1 strictly (V >= 1), P > 0
        assert(nll > 0.0 && java.lang.Double.isFinite(nll), s"nll=$nll")
      }
    }
    assert(scoredDocs > 0)
  }

  test("q79: weights form a distribution; upsampling inverts token mass") {
    val rows = TextQueries.q79MixtureWeights(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val ws = rows.map(r => r.getDouble(r.fieldIndex("weight")))
    assert(math.abs(ws.sum - 1.0) < 1e-9, s"weights sum to ${ws.sum}")
    ws.foreach(w => assert(w > 0.0 && w < 1.0))
    // α = 0.5 flattens the mixture: the smallest source must get MORE than
    // its proportional share, the largest less
    val byTokens = rows.sortBy(r => r.getLong(r.fieldIndex("tokens")))
    val total = byTokens.map(r => r.getLong(r.fieldIndex("tokens"))).sum.toDouble
    val small = byTokens.head
    val large = byTokens.last
    assert(small.getDouble(small.fieldIndex("weight")) >=
      small.getLong(small.fieldIndex("tokens")) / total)
    assert(large.getDouble(large.fieldIndex("weight")) <=
      large.getLong(large.fieldIndex("tokens")) / total)
  }

  test("q91: copy counts take only the two adjacent epoch values per source; deterministic") {
    val rows = TextQueries.q91MixtureExpand(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(r => r.getString(r.fieldIndex("source")))
    bySource.foreach { case (src, rs) =>
      val copies = rs.map(r => r.getLong(r.fieldIndex("n_copies"))).distinct.sorted
      assert(copies.length <= 2, s"$src: more than two copy levels: ${copies.toSeq}")
      if (copies.length == 2)
        assert(copies(1) == copies(0) + 1, s"$src: non-adjacent levels ${copies.toSeq}")
    }
    val again = TextQueries.q91MixtureExpand(spark, Sf0001).collect()
    assert(rows.toSeq == again.toSeq) // the sampler is a pure hash — no RNG
  }

  test("q74: a doc made of the corpus's own repeated bigram scores lower than junk") {
    // All docs scored by the same corpus model: the most-frequent-bigram
    // doc must be more probable (lower NLL) than the corpus max.
    val rows = TextQueries.q74BigramLm(spark, Sf0001).collect()
      .filter(r => r.getLong(r.fieldIndex("n_bigrams")) > 0)
      .map(r => r.getDouble(r.fieldIndex("avg_nll")))
    assert(rows.min < rows.max) // the model discriminates at all
  }
}
