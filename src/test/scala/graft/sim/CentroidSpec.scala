package graft.sim

import graft.SparkSpec

/** q68's fixed-point centroid must sit within the documented quantization
  * bound of the true float mean, and be bit-stable across partitionings
  * (the whole point of the fixed-point accumulation). */
class CentroidSpec extends SparkSpec {

  test("q68 centroids match a driver-side mean within the 2^-30 quantization bound") {
    val got = SimilarityQueries.q68EmbeddingCentroids(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val raw = graft.sql.Tables(spark, Sf0001).embeddings
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val byLabel = raw.groupBy(_._1)
    assert(got.nonEmpty)
    byLabel.foreach { case (label, vs) =>
      val n = vs.length
      val dims = vs.head._2.length
      (0 until dims).foreach { d =>
        val mean = vs.map(_._2(d).toDouble).sum / n
        val (gotN, gotC) = got((label, d))
        assert(gotN == n)
        // floor-quantization shifts each element by at most 2^-30
        assert(math.abs(gotC - mean) <= math.pow(2, -30) + 1e-9 * math.abs(mean),
          s"label $label dim $d: $gotC vs $mean")
      }
    }
  }

  test("q70 assigns every vector to its true argmin centroid (driver-side brute force)") {
    val got = SimilarityQueries.q70CentroidAssign(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    val raw = graft.sql.Tables(spark, Sf0001).embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble)))
    // recompute centroids the same fixed-point way, then brute-force argmin
    val cents = raw.groupBy(_._2).map { case (label, vs) =>
      val n = vs.length
      val dims = vs.head._3.length
      label -> (0 until dims).map { d =>
        vs.map(v => math.floor(v._3(d) * 1073741824.0)).sum / (n * 1073741824.0)
      }
    }
    raw.foreach { case (vid, _, v) =>
      val (bestLabel, bestDist) = cents.map { case (l, c) =>
        l -> v.zip(c).map { case (x, cc) => (x - cc) * (x - cc) }.sum
      }.minBy { case (l, d) => (d, l) }
      val (gotLabel, gotDist) = got(vid)
      assert(gotLabel == bestLabel, s"vec $vid: $gotLabel vs $bestLabel")
      assert(math.abs(gotDist - bestDist) < 1e-9, s"vec $vid dist")
    }
  }

  test("q83: dispersion and separation are positive; ratio is their quotient; partition-invariant") {
    val rows = SimilarityQueries.q83EmbeddingDispersion(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val trace = r.getDouble(r.fieldIndex("trace_var"))
      val sep = r.getDouble(r.fieldIndex("min_sep2"))
      val ratio = r.getDouble(r.fieldIndex("overlap_ratio"))
      assert(trace > 0.0 && sep > 0.0)
      assert(ratio == trace / sep)
      assert(r.getLong(r.fieldIndex("n_vectors")) > 0)
    }
    // fixed-point accumulation ⇒ bit-identical under a different shuffle
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val b =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        SimilarityQueries.q83EmbeddingDispersion(spark, Sf0001).collect()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(rows.toSeq == b.toSeq)
  }

  test("q68 is bit-identical under a different partitioning") {
    val a = SimilarityQueries.q68EmbeddingCentroids(spark, Sf0001).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val b =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        SimilarityQueries.q68EmbeddingCentroids(spark, Sf0001).collect().toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b)
  }
}
