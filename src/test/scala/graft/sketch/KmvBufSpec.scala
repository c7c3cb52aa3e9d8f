package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** The buffered-compaction KMV aggregators must be OUTPUT-IDENTICAL to
  * the classic binary-search-insert aggregator — same k-min set, same
  * estimate — on duplicate-heavy streams, below/at/above k, and across
  * chunked partial-aggregate merges in scrambled orders (the shapes the
  * partial/merge path produces at scan time). The classic aggregator
  * stays the streaming operators' per-row fold; this spec is what makes
  * the two implementations one estimator. */
class KmvBufSpec extends AnyFunSuite {

  private val K = 64

  /** Deterministic 60-bit pseudo-random hashes with planted duplicates. */
  private def hashes(n: Int, seed: Long): Seq[Long] = {
    var x = seed
    val base = (1 to n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 4) & ((1L << 60) - 1)
    }
    base ++ base.take(n / 3) // every early hash repeats once
  }

  test("buffered == classic: estimate and k-min set, single stream and scrambled chunk merges") {
    val classic = new KmvSketch.KmvAggregator(K)
    val buffered = new KmvSketch.KmvBufAggregator(K)
    val states = new KmvSketch.KmvBufStateAggregator(K)
    for ((n, seed) <- Seq(5 -> 11L, 63 -> 12L, 64 -> 13L, 65 -> 14L, 200 -> 15L, 5000 -> 16L)) {
      val vs = hashes(n, seed)
      val cState = vs.foldLeft(classic.zero)((s, h) => classic.reduce(s, h))
      val cEst = classic.finish(cState)

      val b1 = vs.foldLeft(buffered.zero)((s, h) => buffered.reduce(s, h))
      assert(buffered.finish(b1) == cEst, s"n=$n single-stream estimate")

      val chunks = vs.grouped(math.max(1, vs.length / 7)).toSeq
      val bufs = chunks.map(_.foldLeft(buffered.zero)((s, h) => buffered.reduce(s, h)))
      val merged = bufs.reduceRight((x, acc) => buffered.merge(acc, x)) // scrambled order
      assert(buffered.finish(merged) == cEst, s"n=$n chunked-merge estimate")

      val sBuf = chunks.map(_.foldLeft(states.zero)((s, h) => states.reduce(s, h)))
        .reduceLeft((a, b) => states.merge(a, b))
      assert(states.finish(sBuf).mins.toSeq == cState.mins.toSeq,
        s"n=$n k-min set must be identical")
    }
  }

  test("buffered merge-only re-aggregator == classic on stored states") {
    val classic = new KmvSketch.KmvMergeAggregator(K)
    val buffered = new KmvSketch.KmvBufMergeAggregator(K)
    val mk = new KmvSketch.KmvStateAggregator(K)
    val shards = (1 to 5).map(i =>
      hashes(40 * i, 100L + i).foldLeft(mk.zero)((s, h) => mk.reduce(s, h)))
    val cEst = classic.finish(shards.foldLeft(classic.zero)((b, s) => classic.reduce(b, s)))
    val bEst = buffered.finish(shards.foldLeft(buffered.zero)((b, s) => buffered.reduce(b, s)))
    assert(bEst == cEst)
  }
}
