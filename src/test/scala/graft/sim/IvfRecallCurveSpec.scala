package graft.sim

import graft.SparkSpec

/** q185 invariants: the curve is monotone in the probe budget, bounded,
  * and its nprobe = 8 point IS q45-vs-q24 agreement — the card audits the
  * production IVF, so at the production probe budget the measured recall
  * must equal the overlap of the two shipped query cards. */
class IvfRecallCurveSpec extends SparkSpec {

  private lazy val rows = SimilarityQueries.q185IvfRecallCurve(spark, Sf0001)
    .collect().map(r => r.getAs[Int]("nprobe") -> r).toMap

  test("q185: curve is monotone and bounded") {
    assert(rows.keySet == Set(1, 2, 4, 8))
    val grid = Seq(1, 2, 4, 8)
    grid.foreach { np =>
      val r = rows(np)
      val rec = r.getAs[Double]("recall_at_k")
      val sf = r.getAs[Double]("scan_frac")
      assert(rec >= 0.0 && rec <= 1.0, s"np=$np recall out of range")
      assert(sf > 0.0 && sf <= 1.0, s"np=$np scan_frac out of range")
    }
    grid.zip(grid.tail).foreach { case (a, b) =>
      assert(rows(a).getAs[Double]("recall_at_k") <= rows(b).getAs[Double]("recall_at_k"),
        s"recall must not drop from np=$a to np=$b")
      assert(rows(a).getAs[Long]("n_candidates") < rows(b).getAs[Long]("n_candidates"),
        s"candidate count must grow from np=$a to np=$b")
    }
  }

  test("q185: the nprobe=8 point equals q45-vs-q24 top-k agreement") {
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val exact = topSet(SimilarityQueries.q24CosineTopK(spark, Sf0001))
    val ivf = topSet(SimilarityQueries.q45SimIvf(spark, Sf0001))
    val expected = (ivf & exact).size.toDouble / exact.size
    assert(math.abs(rows(8).getAs[Double]("recall_at_k") - expected) < 1e-12,
      s"curve says ${rows(8).getAs[Double]("recall_at_k")}, cards agree at $expected")
  }
}
