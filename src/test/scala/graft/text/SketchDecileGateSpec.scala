package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q211 driver-replay: the sketch-decile card re-derives exactly from
  * q74's own scored output via an independent plain-Scala replay of the
  * histogram → cut-point → scan-assignment path (bins, cuts, ntile all
  * recomputed from first principles), plus the invariants that license
  * the production swap: both assignments partition the corpus (masses
  * sum to n), agreement stays above the measured bound, and every
  * misassignment is to the ADJACENT decile — the crossing bin's tie
  * mass, never a structural error. */
class SketchDecileGateSpec extends SparkSpec {

  private val Bins = 4096L

  private lazy val card = TextQueries.q211SketchDecileGate(spark, Sf0001)
    .collect().sortBy(_.getAs[Long]("decile"))

  /** (doc_id, n_bigrams, nll_u) replayed from q74 with q177's micro rule. */
  private lazy val scored: Array[(Long, Long, Long)] =
    TextQueries.q74BigramLm(spark, Sf0001).collect()
      .filter(_.getAs[Long]("n_bigrams") > 0)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        math.floor(r.getAs[Double]("avg_nll") * 1000000.0 + 0.5).toLong))

  /** Independent replay: bin → histogram → cuts → per-doc deciles. */
  private lazy val replay: Array[(Long, Long, Int, Int)] = {
    val lo = scored.map(_._3).min
    val span = scored.map(_._3).max - lo + 1
    val withBin = scored.map { case (id, nb, u) => (id, nb, u, (u - lo) * Bins / span) }
    val hist = withBin.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val binsSorted = hist.keys.toArray.sorted
    val tot = scored.length.toLong
    val cums = binsSorted.scanLeft(0L)((acc, b) => acc + hist(b)).tail
    val cuts = (1 to 9).map { k =>
      binsSorted.zip(cums).collectFirst { case (b, c) if c * 10 >= tot * k => b }.get
    }
    val bySort = withBin.sortBy(t => (t._3, t._1))
    val n = bySort.length
    val base = n / 10
    val extra = n % 10
    val exactOf = bySort.zipWithIndex.map { case (t, i) =>
      // ntile: first (n % 10) tiles get one extra row
      val tile = {
        var idx = 0; var d = 0
        while (d < 10 && { val sz = base + (if (d < extra) 1 else 0); idx + sz <= i && { idx += sz; true } }) d += 1
        d + 1
      }
      t._1 -> tile
    }.toMap
    withBin.map { case (id, nb, _, bin) =>
      val sketch = 1 + cuts.count(c => bin > c)
      (id, nb, sketch, exactOf(id))
    }
  }

  test("q211: card equals the independent replay, decile by decile") {
    assert(card.nonEmpty && card.length == 10)
    val byExact = replay.groupBy(_._4)
    val bySketch = replay.groupBy(_._3)
    card.foreach { r =>
      val d = r.getAs[Long]("decile").toInt
      val ex = byExact.getOrElse(d, Array.empty[(Long, Long, Int, Int)])
      val sk = bySketch.getOrElse(d, Array.empty[(Long, Long, Int, Int)])
      assert(r.getAs[Long]("n_docs_exact") == ex.length.toLong, s"d$d n_docs_exact")
      assert(r.getAs[Long]("n_docs_sketch") == sk.length.toLong, s"d$d n_docs_sketch")
      assert(r.getAs[Long]("n_agree") == ex.count(t => t._3 == t._4).toLong, s"d$d n_agree")
      assert(r.getAs[Long]("doc_mass_delta") == (sk.length - ex.length).toLong, s"d$d delta")
      assert(r.getAs[Long]("token_mass_delta") ==
        sk.map(_._2).sum - ex.map(_._2).sum, s"d$d token delta")
    }
  }

  test("q211: both assignments partition the corpus; agreement above the bound") {
    val n = scored.length.toLong
    assert(card.map(_.getAs[Long]("n_docs_exact")).sum == n)
    assert(card.map(_.getAs[Long]("n_docs_sketch")).sum == n)
    val overall = card.map(_.getAs[Long]("n_agree")).sum.toDouble / n
    // measured 99.6% at sf0.01 / 98.8% at sf0.1 / 99.6% at 10x; the
    // fixture bound leaves room for generator drift without letting a
    // structural regression (wrong cuts, off-by-one bins) through
    assert(overall >= 0.95, s"overall sketch-decile agreement $overall < 0.95")
  }

  test("q211: every misassignment is to the adjacent decile") {
    val maxDiff = replay.map(t => math.abs(t._3 - t._4)).max
    assert(maxDiff <= 1,
      s"sketch decile strayed $maxDiff tiles from exact — crossing-bin ties only should differ")
  }
}
