package graft.dedup

import graft.SparkSpec

/** q183 invariants: the theoretical column IS the closed-form S-curve for
  * the production 32×3 banding, the spine is complete, and the banding
  * behaves at the extremes (catches everything at J ≥ 0.8, almost nothing
  * among the J < 0.1 mass). */
class LshScurveSpec extends SparkSpec {

  private lazy val rows = DedupQueries.q183LshScurve(spark, Sf0001).collect()

  test("q183: 10-bin spine with the closed-form 1-(1-m^3)^32 curve") {
    assert(rows.length == 10)
    rows.foreach { r =>
      val m = r.getAs[Double]("j_lo") + 0.05
      val closed = 1.0 - math.pow(1.0 - m * m * m, 32)
      assert(math.abs(r.getAs[Double]("theoretical_rate") - closed) < 1e-12,
        s"bin ${r.getAs[Double]("j_lo")}")
    }
  }

  test("q183: detection behaves at the extremes") {
    rows.foreach { r =>
      val (jLo, pairs, det) =
        (r.getAs[Double]("j_lo"), r.getAs[Long]("n_pairs"), r.getAs[Long]("n_detected"))
      assert(det <= pairs, s"bin $jLo: detected > pairs")
      if (jLo >= 0.8 && pairs > 0)
        assert(det == pairs, s"bin $jLo: missed a >= 0.8 near-dup (P(miss) ~ 6e-10)")
      if (jLo == 0.0 && pairs > 0)
        assert(det.toDouble / pairs < 0.05, s"bin 0.0: false-candidate rate blew up")
      if (pairs == 0)
        assert(r.isNullAt(r.fieldIndex("empirical_rate")), s"bin $jLo: rate without pairs")
    }
  }
}
