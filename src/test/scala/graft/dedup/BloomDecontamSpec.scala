package graft.dedup

import graft.SparkSpec

/** Pins q94's Bloom prefilter invariants against q60's exact scrub at
  * sf0.001: a Bloom filter admits false positives but NEVER false
  * negatives, so the exact-hit counts and contamination verdicts must be
  * identical, and the prefilter's pass count must dominate the hit count
  * while still rejecting the overwhelming majority of clean shingles. */
class BloomDecontamSpec extends SparkSpec {

  private lazy val bloom = DedupQueries.q94BloomDecontaminate(spark, Sf0001)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5))))
    .toMap
  private lazy val exact = DedupQueries.q60Decontaminate(spark, Sf0001)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
    .toMap

  test("no false negatives: per-doc exact hits and verdicts match q60") {
    assert(bloom.keySet == exact.keySet)
    bloom.foreach { case (id, (nSh, _, nHits, _, contaminated)) =>
      val (exHits, exSh, exContaminated) = exact(id)
      assert(nHits == exHits, s"doc $id hit count")
      assert(nSh == exSh, s"doc $id shingle count")
      assert(contaminated == exContaminated, s"doc $id verdict")
    }
  }

  test("prefilter counts are consistent and selective") {
    val totalShingles = bloom.values.map(_._1).sum
    val totalPass = bloom.values.map(_._2).sum
    val totalHits = bloom.values.map(_._3).sum
    bloom.foreach { case (id, (nSh, nPass, nHits, nFp, _)) =>
      assert(nPass >= nHits && nPass <= nSh, s"doc $id pass bounds")
      assert(nFp == nPass - nHits, s"doc $id fp arithmetic")
    }
    // the whole point: clean shingles (non-hits) overwhelmingly rejected
    val cleanShingles = totalShingles - totalHits
    val falsePos = totalPass - totalHits
    assert(cleanShingles == 0L || falsePos * 10 <= cleanShingles,
      s"FP rate too high: $falsePos of $cleanShingles clean shingles passed")
  }
}
