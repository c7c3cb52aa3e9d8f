package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q164 JL-audit invariants: the pair ledger is the full 24-choose-2 on
  * the hash-deterministic sample, cosines match a driver-side recompute
  * through the same seeded sign matrix, and the grand stats tally the
  * per-pair errors. */
class JlProjectionSpec extends SparkSpec {

  private lazy val rows = SpectralQueries.q164JlProjection(spark, Sf0001).collect()

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private def sign(i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$i:$j".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  private lazy val sample: Seq[(Long, Array[Double])] = {
    val all = graft.sql.Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    all.sortBy { case (id, _) => (hex60(s"jls:$id"), id) }.take(24).toSeq
  }

  test("q164: ledger is the full pair set over the hash-deterministic sample") {
    val ids = sample.map(_._1).toSet
    assert(rows.length == 24 * 23 / 2)
    val pairIds = rows.flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairIds == ids, "pair ids must be exactly the sampled vectors")
    rows.foreach(r => assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("q164: cosines match a driver-side recompute through the same signs") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def project(x: Array[Double]): Array[Double] =
      (0 until 16).map(j => (0 until 64).map(i => sign(i, j) * x(i)).sum).toArray
    val byId = sample.toMap
    rows.foreach { r =>
      val (a, b) = (byId(r.getAs[Long]("id_a")), byId(r.getAs[Long]("id_b")))
      assert(math.abs(r.getAs[Double]("cos_full") - cos(a, b)) < 1e-4 + 1e-9)
      assert(math.abs(r.getAs[Double]("cos_proj") - cos(project(a), project(b))) < 1e-4 + 1e-9)
      assert(math.abs(r.getAs[Double]("abs_err") -
        math.abs(r.getAs[Double]("cos_full") - r.getAs[Double]("cos_proj"))) < 1e-6)
    }
  }

  test("q164: grand stats tally the per-pair errors") {
    val errs = rows.map(_.getAs[Double]("abs_err"))
    val mean = rows.head.getAs[Double]("mean_abs_err")
    val mx = rows.head.getAs[Double]("max_abs_err")
    assert(rows.map(_.getAs[Double]("mean_abs_err")).distinct.length == 1)
    assert(math.abs(mean - errs.sum / errs.length) < 1e-9)
    assert(math.abs(mx - errs.max) < 1e-12)
    // 16-dim JL on 64 dims: typical distortion well under 0.5 cosine
    assert(mean < 0.5, s"mean distortion $mean implausibly large")
  }
}
