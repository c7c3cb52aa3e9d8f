package graft.sim

import graft.SparkSpec

/** q195 invariants: distances re-derive from q68's own centroid card,
  * and the matrix behaves like a metric (positive off-diagonal, triangle
  * inequality on every label triple). */
class CentroidDistanceSpec extends SparkSpec {

  private lazy val dists = SimilarityQueries.q195CentroidDistances(spark, Sf0001)
    .collect()
    .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) -> r.getAs[Double]("dist"))
    .toMap

  private def d(a: Int, b: Int): Double =
    if (a == b) 0.0 else if (a < b) dists((a, b)) else dists((b, a))

  test("q195: distances re-derive from q68's centroid card") {
    val cents = SimilarityQueries.q68EmbeddingCentroids(spark, Sf0001).collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("centroid"))).toMap
    dists.foreach { case ((a, b), dist) =>
      var acc = 0.0
      cents(a).zip(cents(b)).foreach { case (x, y) => acc += (x - y) * (x - y) }
      assert(math.sqrt(acc) == dist, s"pair ($a, $b)")
    }
  }

  test("q195: metric sanity — positive, complete, triangle inequality") {
    val labels = dists.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    assert(dists.size == labels.size * (labels.size - 1) / 2, "complete upper triangle")
    dists.values.foreach(v => assert(v > 0.0, "distinct-label centroids must differ"))
    for (a <- labels; b <- labels; c <- labels if a < b && b < c)
      assert(d(a, c) <= d(a, b) + d(b, c) + 1e-9, s"triangle ($a, $b, $c)")
  }
}
