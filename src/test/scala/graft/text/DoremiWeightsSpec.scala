package graft.text

import graft.SparkSpec

/** q180 invariants: the multiplicative-weights round behaves — weights
  * are a probability vector, the reweighting ratio w/share is exactly
  * exp(excess) (normalized), clipping keeps excess non-negative, and the
  * domain partition covers the corpus. */
class DoremiWeightsSpec extends SparkSpec {

  private lazy val rows = TextQueries.q180DoremiWeights(spark, Sf0001).collect()

  test("q180: weights form a probability vector over all 20 domains") {
    assert(rows.length == 20)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    val ssum = rows.map(_.getAs[Double]("baseline_share")).sum
    assert(math.abs(ssum - 1.0) < 1e-9, s"shares sum to $ssum")
    rows.foreach(r => assert(r.getAs[Double]("weight") > 0))
  }

  test("q180: clipped excess loss is non-negative and finite") {
    rows.foreach { r =>
      val e = r.getAs[Double]("excess_loss")
      assert(e >= 0 && java.lang.Double.isFinite(e), s"${r.getAs[String]("source")}: $e")
    }
  }

  test("q180: the reweighting ratio is the normalized exp(excess) — higher excess, higher upweight") {
    // w_d / share_d ∝ exp(excess_d): the ratio ordering must match the
    // excess ordering exactly (strictly monotone transform)
    val byExcess = rows.sortBy(_.getAs[Double]("excess_loss"))
      .map(r => r.getAs[Double]("weight") / r.getAs[Double]("baseline_share"))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b + 1e-12 },
      "w/share not monotone in excess loss")
    // and the normalization constant is shared: ratio / exp(excess) ≈ const
    val consts = rows.map { r =>
      (r.getAs[Double]("weight") / r.getAs[Double]("baseline_share")) /
        math.exp(r.getAs[Double]("excess_loss"))
    }
    assert(consts.max - consts.min < 1e-6, s"normalization drifts: ${consts.min}..${consts.max}")
  }

  test("q180: the domain partition covers every scored document") {
    val docs = graft.sql.Tables(spark, Sf0001).documents.count()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    // every doc with >= 2 tokens is scored; at this fixture that's all of them
    assert(nDocs == docs, s"scored $nDocs of $docs docs")
  }
}
