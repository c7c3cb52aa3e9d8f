package graft.text

import graft.SparkSpec

/** Pins the winnowing guarantee (q50, Schleimer/Wilkerson/Aiken): two
  * documents sharing a token run of at least window + gram − 1 tokens
  * select at least one common fingerprint — regardless of where the run
  * sits — while texts with disjoint vocabularies share none. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpSets(rows: (Long, String)*): Map[Long, Set[Long]] =
    TextQueries.winnowFingerprintSets(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](2).toSet)
      .toMap

  private val sharedRun =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"

  test("shared token run → overlapping fingerprints; disjoint vocab → disjoint; identical → equal") {
    val fps = fpSets(
      1L -> sharedRun,
      2L -> sharedRun,
      3L -> s"completely different opening words appear here $sharedRun and some trailing words follow now",
      4L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi")

    assert(fps(1L) == fps(2L)) // identical text → identical fingerprint set
    assert((fps(1L) & fps(3L)).nonEmpty) // embedded run survives the shifted context
    assert((fps(1L) & fps(4L)).isEmpty) // no common grams → no common minima
  }

  test("short documents still fingerprint (single-window fallback), empty → zero") {
    val fps = fpSets(
      1L -> "one two three four", // 2 grams < window → single min
      2L -> "one two",            // < 3 tokens → no grams
      3L -> "")
    assert(fps(1L).size == 1)
    assert(fps(2L).isEmpty)
    assert(fps(3L).isEmpty)
  }
}
