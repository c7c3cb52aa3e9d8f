package graft.text

import graft.SparkSpec

/** q122's mathematical invariants — each PSI term (pa−pb)·ln(pa/pb) is
  * non-negative (both factors share sign), so PSI ≥ 0 with equality only
  * for identical distributions; smoothing keeps empty buckets finite. */
class PsiDriftSpec extends SparkSpec {

  test("PSI is non-negative for every source and doc counts partition the corpus") {
    val rows = TextQueries.q122PsiDrift(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, psi) =>
      assert(n > 0, s"$src has no docs")
      assert(!psi.isNaN && !psi.isInfinite, s"$src: smoothing failed, psi=$psi")
      // decimal rounding of the per-bucket terms can dip a hair below 0
      assert(psi >= -1e-5, s"$src: negative PSI $psi")
    }
    val total = rows.map(_._2).sum
    val corpus = graft.sql.Tables(spark, Sf0001).documents.count()
    assert(total == corpus, s"per-source docs $total != corpus $corpus")
  }
}
